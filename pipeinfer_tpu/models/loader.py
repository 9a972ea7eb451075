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


def matmul_layout(qtype: GGMLQuantType | None = None) -> str:
    """Device layout for quantized matmul weights. On TPU: "i4g" for 4-bit
    formats — weights stay NIBBLE-PACKED in HBM (~0.53 B/param) and the
    Pallas kernel unpacks to int8 in VMEM via full-lane i32 bit ops before
    MXU s8 dots (74% of HBM roofline, 1.87x the i8g step; see
    ops.qmatmul._i4g_kernel) — and "i8g" for wider formats (int8
    requantized per-(512, col), output-side scaling). Elsewhere the
    minimum-memory packed planes. "i8"/"k4" remain available as
    exact-dequant layouts. Override: PIPEINFER_WEIGHT_LAYOUT.

    The i4g re-quantization is lossy vs the stored Q4 values (the
    reference computes exact dots against them); its default status is
    backed by the MODEL-level check in tests/test_layout_fidelity.py —
    trained-model perplexity ratio <=1.02 and >=99% greedy top-1 agreement
    vs the exact k_major dequant — on top of the per-tensor rms budgets in
    tests/test_qmatmul.py. Fidelity-critical runs: set
    PIPEINFER_WEIGHT_LAYOUT=i8g (~1.0002 ppl ratio, 2x HBM bytes)."""
    import os

    env = os.environ.get("PIPEINFER_WEIGHT_LAYOUT", "")
    if env in ("i8", "k_major", "k4", "i8g", "i4g"):
        return env
    import jax

    if jax.default_backend() != "tpu":
        return "k_major"
    from ..quant.pack import FORMAT_INFO

    if qtype is not None and FORMAT_INFO.get(qtype, (0, 0))[0] == 4:
        return "i4g"
    return "i8g"


def _load_tensor(r: GGUFReader, name: str, *, dense_dtype=jnp.float32, layout=None):
    info = r.tensors[name]
    if info.qtype in _DENSE_TYPES or len(info.shape) != 2:
        arr = r.tensor(name)  # dequantized to float if needed
        return jnp.asarray(np.ascontiguousarray(arr), dtype=dense_dtype)
    if layout is None:
        layout = matmul_layout(info.qtype)
    if info.qtype in pack.FORMAT_INFO:
        pw = pack.pack(r.tensor_bytes(name), info.qtype, info.shape)
        return to_device(pw, layout=layout)
    # unsupported quant format for matmul path: dequantize to bf16 dense
    return jnp.asarray(r.tensor(name), dtype=jnp.bfloat16)


# global tensor names shared by every architecture
# (ref: llama.cpp LLM_TENSOR_NAMES table)
GLOBAL_TENSOR_MAP = {
    "token_embd.weight": "tok_embd",
    "token_embd_norm.weight": "tok_norm",
    "token_embd_norm.bias": "tok_norm_b",
    "position_embd.weight": "pos_embd",
    "output_norm.weight": "output_norm",
    "output_norm.bias": "output_norm_b",
    "output.weight": "output",
}

LAYER_TENSOR_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_norm.bias": "attn_norm_b",
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_b",
    "attn_qkv.weight": "wqkv",
    "attn_qkv.bias": "bqkv",
    "attn_q.weight": "wq",
    "attn_q.bias": "bq",
    "attn_k.weight": "wk",
    "attn_k.bias": "bk",
    "attn_v.weight": "wv",
    "attn_v.bias": "bv",
    "attn_q_norm.weight": "q_norm",
    "attn_q_norm.bias": "q_norm_b",
    "attn_k_norm.weight": "k_norm",
    "attn_k_norm.bias": "k_norm_b",
    "attn_output.weight": "wo",
    "attn_output.bias": "bo",
    "ffn_norm.weight": "ffn_norm",
    "ffn_norm.bias": "ffn_norm_b",
    "ffn_gate.weight": "w_gate",
    "ffn_gate.bias": "b_gate",
    "ffn_down.weight": "w_down",
    "ffn_down.bias": "b_down",
    "ffn_up.weight": "w_up",
    "ffn_up.bias": "b_up",
}

# non-matmul slots loaded as dense vectors/embeddings
_GATHER_SLOTS = {"tok_embd", "pos_embd"}


def forward_for_arch(arch: str):
    """The jittable forward for an architecture (llama fast path or the
    generic trait-driven decoder)."""
    if arch in ("llama",):
        return llama.forward
    from . import generic

    return generic.forward


def load_model(path: str | Path, *, max_workers: int = 4,
               fuse: bool | None = None) -> tuple[dict[str, Any], ModelConfig]:
    """Load a GGUF model file. Returns (params pytree, config).

    Tensors load through a thread pool: the native repack is a ctypes call
    (GIL released) and the device upload + on-device unpack are async jax
    dispatches, so host decode of tensor i+1 overlaps the transfer of
    tensor i (ref: llama.cpp:1805-1938 mmap loader; there the OS page
    cache plays this role).

    fuse: merge same-input projections (see fuse_projections). Default:
    on for TPU (PIPEINFER_FUSE_PROJ=0 disables), off elsewhere."""
    from concurrent.futures import ThreadPoolExecutor

    r = GGUFReader(path)
    cfg = config_from_gguf(r)
    jobs: list[tuple[Any, str, str | None]] = []  # (dest key, gguf name, layout)
    params: dict[str, Any] = {"layers": [{} for _ in range(cfg.n_layers)]}
    for gname, slot in GLOBAL_TENSOR_MAP.items():
        if gname in r.tensors:
            layout = "n_major" if slot in _GATHER_SLOTS else None
            jobs.append((slot, gname, layout))
    if "output.weight" not in r.tensors:
        # tied embeddings: the head matmul needs its own matmul-layout copy
        jobs.append(("output", "token_embd.weight", None))
    for li in range(cfg.n_layers):
        for suffix, slot in LAYER_TENSOR_MAP.items():
            gname = f"blk.{li}.{suffix}"
            if gname in r.tensors:
                jobs.append(((li, slot), gname, None))

    def run(job):
        key, gname, layout = job
        return key, _load_tensor(r, gname, layout=layout)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        for key, arr in ex.map(run, jobs):
            if isinstance(key, tuple):
                params["layers"][key[0]][key[1]] = arr
            else:
                params[key] = arr
    r.close()
    if fuse is None:
        fuse = default_fuse()
    if fuse:
        fuse_projections(params)
    return params, cfg


def default_fuse() -> bool:
    """Whether to fuse same-input projections by default: on for TPU
    (PIPEINFER_FUSE_PROJ=0 disables). The single definition of the gate —
    load_model and the CLI's apply-LoRA-then-fuse path share it."""
    import os

    import jax

    return (
        jax.default_backend() == "tpu"
        and os.environ.get("PIPEINFER_FUSE_PROJ", "1") != "0"
    )


def fuse_projections(params: dict[str, Any]) -> None:
    """Fuse same-input projections into single HBM tensors, in place:
    wq+wk+wv -> 'wqkv' (the GGUF fused-qkv block order [Q;K;V]) and
    w_gate+w_up -> 'wgu'. One kernel call with a large N tile replaces
    three/two small ones — per-call overhead and small-N DMA
    inefficiency cost ~10% of the 7B sequential decode step. Only
    bias-free QuantTensor groups with matching (qtype, layout) fuse
    (Q4_K_M-style mixed-ftype layers keep split projections); the
    consumers (models.llama, models.generic, parallel.tp segment
    sharding, parallel.pipefused de-fusing) all handle both forms."""
    from ..ops.qmatmul import QuantTensor, concat_qt

    def fuse_group(lp, slots, dest, biases):
        if not all(k in lp for k in slots) or any(b in lp for b in biases):
            return
        ws = [lp[k] for k in slots]
        if all(isinstance(w, QuantTensor) for w in ws):
            fused = concat_qt(ws)
        elif all(not isinstance(w, QuantTensor) and getattr(w, "ndim", 0) == 2
                 for w in ws) and len({w.shape[1] for w in ws}) == 1 \
                and len({str(w.dtype) for w in ws}) == 1:
            fused = jnp.concatenate(ws, axis=0)  # dense [N, K] row concat
        else:
            fused = None  # mixed forms (e.g. LoRA-densified slot) stay split
        if fused is not None:
            lp[dest] = fused
            for k in slots:
                del lp[k]

    for lp in params.get("layers", []):
        fuse_group(lp, ("wq", "wk", "wv"), "wqkv", ("bq", "bk", "bv"))
        fuse_group(lp, ("w_gate", "w_up"), "wgu", ("b_gate", "b_up"))
