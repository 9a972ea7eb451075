#!/usr/bin/env bash
# Quantization sweep driver: quantize a f16 model to every ftype, then
# benchmark throughput and/or perplexity per ftype.
#
# Fills the role of the reference's qnt-all / run-all-perf / run-all-ppl
# trio (SURVEY §2.2 "scripts") as ONE subcommand tool.
#
#   quant-sweep.sh quantize <model-f16.gguf>
#   quant-sweep.sh perf     <model-f16.gguf>
#   quant-sweep.sh ppl      <model-f16.gguf> -f corpus.txt
#   quant-sweep.sh all      <model-f16.gguf> -f corpus.txt
#
# Options:
#   -q "q4_k q8_0 ..."   ftypes to sweep (default: the full matrix)
#   -f corpus.txt        perplexity text (required for ppl)
#   -o dir               output dir (default: <model dir>/sweep-<name>)
#   -x "extra args"      passed through to the per-ftype tool
set -euo pipefail

FTYPES="q8_0 q6_k q5_k q5_1 q5_0 q4_k q4_1 q4_0 q3_k q2_k"
CORPUS=""
OUTDIR=""
EXTRA=""

usage() { sed -n '2,16p' "$0" | sed 's/^# \{0,1\}//'; exit 1; }

[ $# -ge 2 ] || usage
CMD="$1"; MODEL="$2"; shift 2
while getopts "q:f:o:x:" opt; do
  case "$opt" in
    q) FTYPES="$OPTARG" ;;
    f) CORPUS="$OPTARG" ;;
    o) OUTDIR="$OPTARG" ;;
    x) EXTRA="$OPTARG" ;;
    *) usage ;;
  esac
done

NAME="$(basename "$MODEL" .gguf)"; NAME="${NAME%-f16}"
DIR="$(dirname "$MODEL")"
OUTDIR="${OUTDIR:-$DIR/sweep-$NAME}"
mkdir -p "$OUTDIR"

qfile() { echo "$DIR/$NAME-$1.gguf"; }

do_quantize() {
  local q
  for q in $FTYPES; do
    echo "== quantize $q =="
    pipeinfer-quantize "$MODEL" "$(qfile "$q")" "$q" |& tee "$OUTDIR/quantize-$q.log"
  done
}

sweep() {  # $1 = label, rest = command with MODELFILE placeholder
  local label="$1"; shift
  local q m
  for q in f16 $FTYPES; do
    if [ "$q" = f16 ]; then m="$MODEL"; else m="$(qfile "$q")"; fi
    [ -e "$m" ] || { echo "skip $q: $m missing (run quantize first)"; continue; }
    echo "== $label $q =="
    "${@//MODELFILE/$m}" |& tee "$OUTDIR/$label-$q.log"
  done
}

case "$CMD" in
  quantize) do_quantize ;;
  perf) sweep perf pipeinfer-bench -m MODELFILE -pp 512 -tg 64 $EXTRA ;;
  ppl)
    [ -n "$CORPUS" ] || { echo "ppl needs -f corpus.txt"; exit 1; }
    sweep ppl pipeinfer-perplexity -m MODELFILE -f "$CORPUS" -c 512 $EXTRA ;;
  all)
    do_quantize
    sweep perf pipeinfer-bench -m MODELFILE -pp 512 -tg 64 $EXTRA
    if [ -n "$CORPUS" ]; then
      sweep ppl pipeinfer-perplexity -m MODELFILE -f "$CORPUS" -c 512 $EXTRA
    fi ;;
  *) usage ;;
esac
echo "sweep results in $OUTDIR"
