"""Stage-sliced llama forward for the host-driven pipeline.

The model is cut into layer ranges (the --mpi-layer-split counterpart,
ref: ggml-mpi.c:523-587); each stage runs its slab as its own jitted step
on its own device(s). Stage 0 embeds, the last stage applies the final
norm + head (and the packed sparse-logits head); middle stages map hidden
states to hidden states — the activation handoff between stages is a
device-to-device transfer driven by the host (ref: ggml-mpi.c:710-721
activation relay).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..runtime import kv_cache as kv
from .config import ModelConfig
from .llama import embed, linear


def stage_forward(
    stage_params,
    cfg: ModelConfig,
    cache: kv.KVCache,
    x,  # int32 tokens [T] (first stage) or f32 hidden [T, E]
    pos,
    seq,
    cell_idx,
    valid,
    seq_bits,
    *,
    first: bool,
    last: bool,
    topk: int | None,
):
    t = pos.shape[0]
    if first:
        h = embed(x, stage_params["tok_embd"])
    else:
        h = x.astype(jnp.float32)

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

    for li, lp in enumerate(stage_params["layers"]):
        a = L.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
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
        h = h + linear(L.silu(linear(f, lp["w_gate"])) * linear(f, lp["w_up"]), lp["w_down"])

    if not last:
        # f32 activation relay (the reference transfers F32 over MPI,
        # ggml-mpi.c:451-487; switch to bf16 to halve ICI bytes if desired)
        return h.astype(jnp.float32), cache
    out = L.rms_norm(h, stage_params["output_norm"], cfg.norm_eps)
    logits = linear(out, stage_params["output"]).astype(jnp.float32)
    if topk is None:
        return logits, cache
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    vals, ids = jax.lax.top_k(logits, topk)
    packed = jnp.concatenate([vals, ids.astype(jnp.float32), lse[:, None]], axis=1)
    return packed, cache
