"""pipeinfer_tpu — a TPU-native asynchronous pipelined-speculation inference framework.

A from-scratch JAX/XLA/Pallas re-imagining of PipeInfer (arXiv 2407.11798,
reference C/C++/MPI implementation surveyed in SURVEY.md): GGUF weight-only
k-quant models served with fused Pallas dequant+matmul kernels, a
pipeline-parallel target model over TPU sub-meshes, a draft model launching
multiple in-flight tree-speculation microbatches, early-exit cancellation and
per-sequence KV-cache rollback, and continuous batching.

Layer map (bottom → top), mirroring the reference's L0..L6 (SURVEY.md §1)
but redesigned TPU-first:

- ``gguf``      — GGUF file format reader/writer    (ref: ggml.c GGUF API)
- ``quant``     — block-quant formats + TPU repack  (ref: ggml-quants.c)
- ``ops``       — Pallas/XLA compute kernels        (ref: ggml.c kernels)
- ``models``    — model graph builders + loader     (ref: llama.cpp llm_build_*)
- ``runtime``   — KV cache + decode engine          (ref: llama.cpp decode/kv)
- ``parallel``  — mesh/pipeline/collectives         (ref: ggml-mpi.c)
- ``spec``      — speculation controllers           (ref: examples/speculative)
- ``sampling``  — sampler chain + grammar           (ref: common/sampling.cpp)
- ``tokenizer`` — SPM/BPE tokenizers                (ref: llama.cpp tokenizers)
- ``serving``   — continuous batching + HTTP server (ref: examples/server)
- ``tools``     — convert/quantize/perplexity CLIs  (ref: convert.py etc.)
"""

__version__ = "0.1.0"
