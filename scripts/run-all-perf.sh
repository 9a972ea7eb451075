#!/bin/bash
# Prefill/generation throughput sweep across quantizations
# (ref: scripts/run-all-perf.sh driving llama-bench).
# usage: run-all-perf.sh <model-f16.gguf> [qnt-list] [args]

qnt=(f16 q8_0 q6_k q5_k q5_1 q5_0 q4_k q4_1 q4_0 q3_k q2_k)
args="-pp 512 -tg 64"

if [ -z "$1" ]; then
    echo "usage: $0 <model-f16.gguf> [qnt] [args]"
    echo "default: $0 <model-f16.gguf> \"${qnt[*]}\" \"${args}\""
    exit 1
fi

if [ -n "$2" ]; then
    qnt=($2)
fi

if [ -n "$3" ]; then
    args="$3"
fi

model="$1"
dir="$(dirname "$model")"
base="$(basename "$model" .gguf)"
out="$dir/results-${base%-f16}"

set -o pipefail
set -e

mkdir -p "$out"

for q in "${qnt[@]}"; do
    if [ "$q" = f16 ]; then m="$model"; else m="$dir/${base%-f16}-${q}.gguf"; fi
    pipeinfer-bench -m "$m" ${args} 2>&1 | tee "$out/perf-${q}.txt"
done
