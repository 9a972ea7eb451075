"""Offline tools: model conversion, quantization, perplexity, benchmarks
(ref: convert.py, examples/quantize, examples/perplexity, llama-bench)."""
