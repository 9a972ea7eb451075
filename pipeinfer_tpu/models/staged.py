"""Stage-sliced decoder forward for the host-driven pipeline.

The model is cut into layer ranges (the --mpi-layer-split counterpart,
ref: ggml-mpi.c:523-587); each stage runs its slab as its own jitted step
on its own device or TP sub-mesh. Stage 0 embeds (+ bloom token-embedding
norm, starcoder learned positions), the last stage applies the final norm +
head (and the packed sparse-logits head); middle stages map hidden states
to hidden states — the activation handoff between stages is a
device-to-device transfer driven by the host (ref: ggml-mpi.c:710-721
activation relay).

All nine architectures run through the shared trait-driven layer body
(models.generic.layer_step); under TP the body receives a shard-local cfg
and psums its row-parallel projections over `tp_axis` (Megatron pattern).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..runtime import kv_cache as kv
from .config import ModelConfig
from .generic import _norm, layer_step
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
    tp_axis: str | None = None,
):
    """cfg must be shard-local under TP (heads divided by tp)."""
    if first:
        h = embed(x, stage_params["tok_embd"])
        if cfg.tok_norm:
            h = _norm(h, stage_params["tok_norm"], stage_params.get("tok_norm_b"), cfg)
        if cfg.pos_embd:
            h = h + stage_params["pos_embd"][pos].astype(h.dtype)
    else:
        h = x.astype(jnp.float32)

    cache = kv.write_meta(cache, cell_idx, pos, seq, valid, seq_bits)
    mask = kv.attn_mask(cache, pos, seq)
    mask = jnp.where(valid[:, None], mask, kv.MASK_VALUE)

    slopes = None
    if cfg.max_alibi_bias > 0:
        if tp_axis is not None:
            # slopes are GLOBAL-head indexed; cfg here is shard-local, so
            # build the full table and slice this shard's head block
            tp = jax.lax.axis_size(tp_axis)
            full = kv.alibi_slopes(cfg.n_heads * tp, cfg.max_alibi_bias)
            slopes = jax.lax.dynamic_slice_in_dim(
                full, jax.lax.axis_index(tp_axis) * cfg.n_heads, cfg.n_heads
            )
        else:
            slopes = kv.alibi_slopes(cfg.n_heads, cfg.max_alibi_bias)
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
        h, cache = layer_step(
            h, lp, li, cfg, cache, cell_idx, mask, pos, seq, valid,
            rope_kw, slopes, tp_axis=tp_axis,
        )

    if not last:
        # f32 activation relay (the reference transfers F32 over MPI,
        # ggml-mpi.c:451-487; switch to bf16 to halve ICI bytes if desired)
        return h.astype(jnp.float32), cache
    out = _norm(h, stage_params["output_norm"], stage_params.get("output_norm_b"), cfg)
    logits = linear(out, stage_params["output"]).astype(jnp.float32)
    if tp_axis is not None:
        # head weight is vocab-sharded (column-parallel): gather the full row
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    if topk is None:
        return logits, cache
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    vals, ids = jax.lax.top_k(logits, topk)
    packed = jnp.concatenate([vals, ids.astype(jnp.float32), lse[:, None]], axis=1)
    return packed, cache


def local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Shard-local view of the model config under tp-way tensor parallelism."""
    if tp == 1:
        return cfg
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, (
        f"heads {cfg.n_heads}/{cfg.n_kv_heads} not divisible by tp={tp}"
    )
    return dataclasses.replace(
        cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp
    )
