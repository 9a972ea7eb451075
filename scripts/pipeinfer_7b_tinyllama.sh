#!/bin/bash
# PipeInfer run recipe — the TPU counterpart of the reference's 8-node
# cluster script (ref: examples/speculative/scripts/dolphin_tinyllama_8_nodes.sh).
# Where the reference spreads one 70B model over 8 CPU nodes with
# --mpi-layer-split, here stage depth comes from --stages/--layer-split
# over the attached TPU mesh; on one chip leave --stages unset.
#
# usage: pipeinfer_7b_tinyllama.sh <target.gguf> <draft.gguf> [extra args]

if [ -z "$1" ] || [ -z "$2" ]; then
    echo "usage: $0 <target.gguf> <draft.gguf> [extra pipeinfer-speculative args]"
    exit 1
fi

target="$1"; draft="$2"; shift 2

set -e

pipeinfer-speculative \
    -m "$target" \
    -md "$draft" \
    -p "<|im_start|>system
You are a careful coding assistant running in a benchmark harness. Answer directly and keep the output self-contained.<|im_end|>
<|im_start|>user
Implement a small Python utility that watches a directory and prints a summary line whenever a file changes. Code only.<|im_end|>
<|im_start|>assistant" \
    -n 128 \
    --ignore-eos \
    --temp 0.0 \
    --repeat-last-n 0 \
    --draft 3 \
    -c 1024 \
    -pa 0.1 \
    -pr 0.0 \
    -np 3 \
    -ps 0.9 \
    --results-csv results.csv \
    "$@"
