"""Utilities: logging, metrics, debug views (ref: common/log.h, llama.h
kv-cache view API)."""
