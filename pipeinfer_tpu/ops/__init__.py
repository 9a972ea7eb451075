"""TPU compute kernels (Pallas + XLA) — the counterpart of ggml's op layer
(ref: ggml.c compute kernels, ggml-quants.c dot products, ggml-cuda.cu)."""

from .qmatmul import QuantTensor, dequant, qmatmul, to_device  # noqa: F401
