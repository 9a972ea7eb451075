#!/bin/bash
# Perplexity sweep across quantizations (ref: scripts/run-all-ppl.sh).
# Expects the files produced by qnt-all.sh next to the f16 model.
# usage: run-all-ppl.sh <model-f16.gguf> <corpus.txt> [qnt-list] [args]

qnt=(f16 q8_0 q6_k q5_k q5_1 q5_0 q4_k q4_1 q4_0 q3_k q2_k)
args="-c 512"

if [ -z "$1" ] || [ -z "$2" ]; then
    echo "usage: $0 <model-f16.gguf> <corpus.txt> [qnt] [args]"
    echo "default: $0 <model-f16.gguf> wiki.test.raw \"${qnt[*]}\" \"${args}\""
    exit 1
fi

if [ -n "$3" ]; then
    qnt=($3)
fi

if [ -n "$4" ]; then
    args="$4"
fi

model="$1"
corpus="$2"
dir="$(dirname "$model")"
base="$(basename "$model" .gguf)"
out="$dir/results-${base%-f16}"

set -o pipefail
set -e

mkdir -p "$out"

for q in "${qnt[@]}"; do
    if [ "$q" = f16 ]; then m="$model"; else m="$dir/${base%-f16}-${q}.gguf"; fi
    time pipeinfer-perplexity -m "$m" -f "$corpus" ${args} \
        2>&1 | tee "$out/ppl-${q}.txt"
done
