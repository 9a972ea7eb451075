#!/bin/bash
# Quantize one model to every ftype (ref: scripts/qnt-all.sh).
# usage: qnt-all.sh <model-f16.gguf> [qnt-list] [outdir]

qnt=(q8_0 q6_k q5_k q5_1 q5_0 q4_k q4_1 q4_0 q3_k q2_k)

if [ -z "$1" ]; then
    echo "usage: $0 <model-f16.gguf> [qnt] [outdir]"
    echo "default: $0 <model-f16.gguf> \"${qnt[*]}\" <model dir>"
    exit 1
fi

if [ -n "$2" ]; then
    qnt=($2)
fi

model="$1"
dir="${3:-$(dirname "$model")}"
base="$(basename "$model" .gguf)"

set -o pipefail
set -e

mkdir -p "$dir"

for q in "${qnt[@]}"; do
    time pipeinfer-quantize "$model" "$dir/${base%-f16}-${q}.gguf" "$q" \
        2>&1 | tee "$dir/qnt-${q}.txt"
done
