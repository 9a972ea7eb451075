"""GGUF → device model parameters.

Counterpart of the reference's mmap loader + per-arch tensor loading
(ref: llama.cpp:1805-1938 `llama_model_loader`, :2684-3404
`llm_load_tensors`). Quantized 2-D weights go through quant.pack to packed
K-major planes; small tensors (norms, biases) load dense. Tensor payloads
are mmap views so only touched pages are read.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLQuantType
from ..gguf.reader import GGUFReader
from ..ops.qmatmul import to_device
from ..quant import pack
from .config import ModelConfig, config_from_gguf
from . import llama

_DENSE_TYPES = (
    GGMLQuantType.F32,
    GGMLQuantType.F16,
    GGMLQuantType.I8,
    GGMLQuantType.I16,
    GGMLQuantType.I32,
)


def _load_tensor(r: GGUFReader, name: str, *, dense_dtype=jnp.float32, layout="k_major"):
    info = r.tensors[name]
    if info.qtype in _DENSE_TYPES or len(info.shape) != 2:
        arr = r.tensor(name)  # dequantized to float if needed
        return jnp.asarray(np.ascontiguousarray(arr), dtype=dense_dtype)
    if info.qtype in pack.FORMAT_INFO:
        pw = pack.pack(r.tensor_bytes(name), info.qtype, info.shape)
        return to_device(pw, layout=layout)
    # unsupported quant format for matmul path: dequantize to bf16 dense
    return jnp.asarray(r.tensor(name), dtype=jnp.bfloat16)


def load_model(path: str | Path) -> tuple[dict[str, Any], ModelConfig]:
    """Load a GGUF model file. Returns (params pytree, config).

    Currently the llama tensor layout family (llama/baichuan/refact naming);
    other architectures register their own maps as they land.
    """
    r = GGUFReader(path)
    cfg = config_from_gguf(r)
    params: dict[str, Any] = {"layers": []}
    for gname, slot in llama.TENSOR_MAP.items():
        if gname in r.tensors:
            # embeddings are row-gathered (n_major); everything else matmuls
            layout = "n_major" if slot == "tok_embd" else "k_major"
            params[slot] = _load_tensor(r, gname, layout=layout)
    if "output" not in params:
        # tied embeddings: the head matmul needs its own k_major copy
        params["output"] = _load_tensor(r, "token_embd.weight", layout="k_major")
    for li in range(cfg.n_layers):
        lp = {}
        for suffix, slot in llama.LAYER_TENSOR_MAP.items():
            gname = f"blk.{li}.{suffix}"
            if gname in r.tensors:
                lp[slot] = _load_tensor(r, gname)
        params["layers"].append(lp)
    r.close()
    return params, cfg
