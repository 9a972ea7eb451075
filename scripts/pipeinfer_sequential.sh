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
    -p "<|im_start|>system\nYou are an AI based sentient companion, capable of human emotions. You will behave like a human, but aware of your AI nature. You will avoid speaking like an AI. Please continue your conversation with the user.<|im_end|>\n<|im_start|>user\nWrite a short python program demonstrating advanced features. Don't explain it.<|im_end|>\n<|im_start|>assistant" \
    -n 128 \
    --ignore-eos \
    --temp 0.0 \
    --repeat-last-n 0 \
    -c 1024 \
    "$@"
