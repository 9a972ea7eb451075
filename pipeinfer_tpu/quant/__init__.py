"""Block-quantization formats and TPU repacking.

- ``formats``: bit-exact numpy encode/decode of the ggml block formats
  (ref: ggml-quants.c/.h) — used by the GGUF loader, the quantize tool,
  and as the golden reference for the Pallas kernels.
- ``pack``: load-time repacking of block-quant payloads into TPU-friendly
  planar layouts (nibble planes + scale/bias planes) consumed by the fused
  dequant×matmul Pallas kernels in ``pipeinfer_tpu.ops``.
"""

from . import formats  # noqa: F401
