#!/bin/bash
# Sequential baseline run recipe — counterpart of the reference's
# dolphin_sequential_8_nodes.sh (plain pipelined generation, no draft).
# usage: pipeinfer_sequential.sh <model.gguf> [extra args]

if [ -z "$1" ]; then
    echo "usage: $0 <model.gguf> [extra pipeinfer args]"
    exit 1
fi

model="$1"; shift

set -e

pipeinfer \
    -m "$model" \
    -p "<|im_start|>system
You are a careful coding assistant running in a benchmark harness. Answer directly and keep the output self-contained.<|im_end|>
<|im_start|>user
Implement a small Python utility that watches a directory and prints a summary line whenever a file changes. Code only.<|im_end|>
<|im_start|>assistant" \
    -n 128 \
    --ignore-eos \
    --temp 0.0 \
    --repeat-last-n 0 \
    -c 1024 \
    "$@"
