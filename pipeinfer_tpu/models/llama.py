"""Llama-family forward pass (also covers baichuan/refact variants).

TPU-native counterpart of the reference's graph builder
(ref: llama.cpp:3872-3984 `llm_build_llama`): RMSNorm → GQA attention with
adjacent-pair RoPE → residual → RMSNorm → SwiGLU FFN → residual, with K/V
written into the sequence-aware cell cache and tree attention masking.

Weights may be QuantTensors (packed, fused-dequant matmul) or dense arrays.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.qmatmul import QuantTensor, dequant_rows, qmatmul
from ..runtime import kv_cache as kv
from .config import ModelConfig

Params = dict[str, Any]


def linear(x: jax.Array, w, bias=None) -> jax.Array:
    """x [T, K] @ W[N, K]^T (+ bias) for QuantTensor or dense weights."""
    if isinstance(w, QuantTensor):
        y = qmatmul(x, w)
    else:
        # compute in the weight's precision (f32 reference models stay exact;
        # bf16 dense weights use the MXU fast path)
        y = jnp.dot(x.astype(w.dtype), w.T, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def embed(tokens: jax.Array, w) -> jax.Array:
    if isinstance(w, QuantTensor):
        return dequant_rows(w, tokens, jnp.float32)
    return w[tokens].astype(jnp.float32)


def forward(
    params: Params,
    cfg: ModelConfig,
    cache: kv.KVCache,
    tokens: jax.Array,  # int32 [T]
    pos: jax.Array,  # int32 [T]
    seq: jax.Array,  # int32 [T] primary sequence slot per token
    cell_idx: jax.Array,  # int32 [T] destination cache cells
    valid: jax.Array,  # bool [T] false for padding
    seq_bits: jax.Array | None = None,  # uint32 [T, SW] multi-seq membership
    output_hidden: bool = False,  # return normed hidden states, not logits
    embd: jax.Array | None = None,  # f32 [T, E]: direct embedding input
    # (the llama_batch.embd path, ref llama.h — multimodal image tokens)
) -> tuple[jax.Array, kv.KVCache]:
    """One decode/prefill step. Returns (logits [T, n_vocab] f32, cache')."""
    t = tokens.shape[0]
    h = embed(tokens, params["tok_embd"]) if embd is None else embd.astype(jnp.float32)

    # claim cells + mask once for all layers
    cache = kv.write_meta(cache, cell_idx, pos, seq, valid, seq_bits)
    mask = kv.attn_mask(cache, pos, seq)
    mask = jnp.where(valid[:, None], mask, kv.MASK_VALUE)

    rope_kw = dict(
        mode=cfg.rope_mode,
        freq_base=cfg.rope_base,
        freq_scale=cfg.rope_scale,
        yarn_ext_factor=cfg.yarn_ext_factor,
        yarn_attn_factor=cfg.yarn_attn_factor,
        yarn_beta_fast=cfg.yarn_beta_fast,
        yarn_beta_slow=cfg.yarn_beta_slow,
        n_orig_ctx=cfg.n_ctx_orig or cfg.n_ctx_train,
    )

    n_embd_q = cfg.n_heads * cfg.head_dim
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    for li, lp in enumerate(params["layers"]):
        a = L.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        if "wqkv" in lp:  # load-time fused projections (one kernel call)
            qkv = linear(a, lp["wqkv"])
            q = qkv[:, :n_embd_q].reshape(t, cfg.n_heads, cfg.head_dim)
            k = qkv[:, n_embd_q: n_embd_q + kv_dim].reshape(t, cfg.n_kv_heads, cfg.head_dim)
            v = qkv[:, n_embd_q + kv_dim:].reshape(t, cfg.n_kv_heads, cfg.head_dim)
        else:
            q = linear(a, lp["wq"]).reshape(t, cfg.n_heads, cfg.head_dim)
            k = linear(a, lp["wk"]).reshape(t, cfg.n_kv_heads, cfg.head_dim)
            v = linear(a, lp["wv"]).reshape(t, cfg.n_kv_heads, cfg.head_dim)
        if cfg.rope_mode != "none":
            q = L.apply_rope(q, pos, cfg.rope_dims, **rope_kw)
            k = L.apply_rope(k, pos, cfg.rope_dims, **rope_kw)
        cache = kv.write_tokens(cache, li, cell_idx, k, v)
        attn = kv.attend(q, cache, li, mask, pos, seq, valid, scale=cfg.attn_scale)
        h = h + linear(attn.reshape(t, cfg.n_heads * cfg.head_dim), lp["wo"])

        f = L.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        if "wgu" in lp:
            gu = linear(f, lp["wgu"])
            half = gu.shape[1] // 2  # robust to shard-local widths
            gate = L.silu(gu[:, :half])
            up = gu[:, half:]
        else:
            gate = L.silu(linear(f, lp["w_gate"]))
            up = linear(f, lp["w_up"])
        h = h + linear(gate * up, lp["w_down"])

    out = L.rms_norm(h, params["output_norm"], cfg.norm_eps)
    if output_hidden:
        return out.astype(jnp.float32), cache
    logits = linear(out, params["output"])
    return logits.astype(jnp.float32), cache


# GGUF tensor name -> param slot (ref: llama.cpp llm_load_tensors LLM_ARCH_LLAMA)
TENSOR_MAP = {
    "token_embd.weight": "tok_embd",
    "output_norm.weight": "output_norm",
    "output.weight": "output",
}
LAYER_TENSOR_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "w_gate",
    "ffn_down.weight": "w_down",
    "ffn_up.weight": "w_up",
}
