"""Model runtime: KV cache, decode engine, contexts
(ref: llama.cpp KV cache :1292-1338, decode engine :5461-5872)."""
