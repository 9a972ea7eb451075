"""Generic multi-architecture decoder forward.

One configurable layer covering the reference's non-llama graph builders
(ref: llama.cpp build_falcon :4106, build_starcoder :4229, build_persimmon
:4329, build_refact :4540, build_bloom :4632, build_mpt :4727,
build_stablelm :4827, build_baichuan :3985), driven by trait fields on
ModelConfig:

- norm_rms / layernorm (+biases), embedding norm (bloom tok_norm),
  learned absolute positions (starcoder pos_embd);
- fused attn_qkv (+clamp for mpt) or split wq/wk/wv; optional Q/K
  layernorm (persimmon);
- RoPE norm/neox/partial (stablelm/persimmon n_rot) or ALiBi
  (mpt/bloom/refact/baichuan-13b) with ggml slope bucketing;
- parallel residual with FFN fed from the attention norm (falcon) or
  sequential residual with its own ffn_norm;
- gated SiLU (llama family) or sequential GELU FFN, with biases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..runtime import kv_cache as kv
from .config import ModelConfig
from .llama import embed, linear


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.norm_rms:
        return L.rms_norm(x, w, cfg.norm_eps)
    return L.layer_norm(x, w, b, cfg.norm_eps)


def layer_step(
    h,
    lp,
    li,
    cfg: ModelConfig,
    cache: kv.KVCache,
    cell_idx,
    mask,
    pos,
    seq,
    valid,
    rope_kw,
    slopes,
    tp_axis: str | None = None,
):
    """One decoder layer on hidden h [T, E] — the trait-driven body shared
    by the single-chip forward, the staged pipeline, and the TP shard_map
    path.

    TP scheme (tp_axis set, cfg shard-LOCAL — heads divided by tp): every
    weight is sharded along its OUTPUT dim, so packed-quant shards stay
    block-aligned for the fused kernel (a Megatron row-parallel split would
    cut Q*_K super-blocks mid-row). Projections run on local shards;
    activations are re-assembled with tiled all-gathers over ICI. At decode
    batch sizes the gathered activations are a few KB — weight streaming
    dominates — while weights and KV stay sharded in HBM (the BASELINE
    north star)."""
    t = h.shape[0]
    kv_dim = cfg.n_kv_heads * cfg.head_dim

    attn_norm_out = _norm(h, lp["attn_norm"], lp.get("attn_norm_b"), cfg)
    if "attn_norm_2" in lp:  # falcon-40B: separate norm feeds attention
        a = _norm(h, lp["attn_norm_2"], lp.get("attn_norm_2_b"), cfg)
    else:
        a = attn_norm_out

    if "wqkv" in lp:
        qkv = linear(a, lp["wqkv"], lp.get("bqkv"))
        if cfg.clamp_kqv > 0:
            qkv = jnp.clip(qkv, -cfg.clamp_kqv, cfg.clamp_kqv)
        n_embd_local = cfg.n_heads * cfg.head_dim
        q = qkv[:, :n_embd_local]
        k = qkv[:, n_embd_local : n_embd_local + kv_dim]
        v = qkv[:, n_embd_local + kv_dim : n_embd_local + 2 * kv_dim]
    else:
        q = linear(a, lp["wq"], lp.get("bq"))
        k = linear(a, lp["wk"], lp.get("bk"))
        v = linear(a, lp["wv"], lp.get("bv"))
    q = q.reshape(t, cfg.n_heads, cfg.head_dim)
    k = k.reshape(t, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(t, cfg.n_kv_heads, cfg.head_dim)

    if "q_norm" in lp:  # persimmon Q/K layernorm
        q = L.layer_norm(q, lp["q_norm"], lp.get("q_norm_b"), cfg.norm_eps)
        k = L.layer_norm(k, lp["k_norm"], lp.get("k_norm_b"), cfg.norm_eps)

    if cfg.rope_mode != "none":
        q = L.apply_rope(q, pos, cfg.rope_dims, **rope_kw)
        k = L.apply_rope(k, pos, cfg.rope_dims, **rope_kw)

    cache = kv.write_tokens(cache, li, cell_idx, k, v)
    attn = kv.attend(
        q, cache, li, mask, pos, seq, valid, scale=cfg.attn_scale, alibi=slopes
    )
    attn_flat = attn.reshape(t, cfg.n_heads * cfg.head_dim)
    if tp_axis is not None:
        # heads are shard-local; wo is output-sharded — gather the full
        # attention activation, project locally, gather the projection
        attn_flat = jax.lax.all_gather(attn_flat, tp_axis, axis=1, tiled=True)
    attn_out = linear(attn_flat, lp["wo"], lp.get("bo"))
    if tp_axis is not None:
        attn_out = jax.lax.all_gather(attn_out, tp_axis, axis=1, tiled=True)

    if cfg.parallel_residual:
        # falcon: FFN reads the attention norm output; both add to input
        ffn_out = _ffn(attn_norm_out, lp, cfg, tp_axis)
        h = h + attn_out + ffn_out
    else:
        h = h + attn_out
        f_in = _norm(h, lp["ffn_norm"], lp.get("ffn_norm_b"), cfg)
        h = h + _ffn(f_in, lp, cfg, tp_axis)
    return h, cache


def forward(
    params,
    cfg: ModelConfig,
    cache: kv.KVCache,
    tokens: jax.Array,
    pos: jax.Array,
    seq: jax.Array,
    cell_idx: jax.Array,
    valid: jax.Array,
    seq_bits: jax.Array | None = None,
    output_hidden: bool = False,
) -> tuple[jax.Array, kv.KVCache]:
    t = tokens.shape[0]
    h = embed(tokens, params["tok_embd"])
    if cfg.tok_norm:
        h = _norm(h, params["tok_norm"], params.get("tok_norm_b"), cfg)
    if cfg.pos_embd:
        h = h + params["pos_embd"][pos].astype(h.dtype)

    cache = kv.write_meta(cache, cell_idx, pos, seq, valid, seq_bits)
    mask = kv.attn_mask(cache, pos, seq)
    mask = jnp.where(valid[:, None], mask, kv.MASK_VALUE)

    slopes = (
        kv.alibi_slopes(cfg.n_heads, cfg.max_alibi_bias) if cfg.max_alibi_bias > 0 else None
    )
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
    for li, lp in enumerate(params["layers"]):
        h, cache = layer_step(
            h, lp, li, cfg, cache, cell_idx, mask, pos, seq, valid, rope_kw, slopes
        )

    out = _norm(h, params["output_norm"], params.get("output_norm_b"), cfg)
    if output_hidden:
        return out.astype(jnp.float32), cache
    logits = linear(out, params["output"])
    return logits.astype(jnp.float32), cache


def _ffn(x, lp, cfg: ModelConfig, tp_axis: str | None = None):
    """ref: llm_build_ffn (llama.cpp:3637-3700) — gated SiLU, GELU-seq, or
    relu-squared (persimmon LLM_FFN_RELU_SQR). Under TP, gate/up/down are
    all output-sharded: the ffn intermediate is gathered before w_down and
    the result gathered after (see layer_step docstring)."""
    if "wgu" in lp:  # load-time fused gate+up (one kernel call); split at
        #              the ACTUAL half-width — under TP the shard-local
        #              wgu is 2*n_ff/tp wide while cfg.n_ff stays global
        gu = linear(x, lp["wgu"])
        half = gu.shape[1] // 2
        mid = L.silu(gu[:, :half]) * gu[:, half:]
    else:
        up = linear(x, lp["w_up"], lp.get("b_up"))
        if "w_gate" in lp:
            gate = L.silu(linear(x, lp["w_gate"], lp.get("b_gate")))
            mid = gate * up
        elif cfg.ffn_act == "relu2":
            r = jnp.maximum(up.astype(jnp.float32), 0.0)
            mid = (r * r).astype(up.dtype)
        else:
            mid = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(up.dtype)
    if tp_axis is not None:
        mid = jax.lax.all_gather(mid, tp_axis, axis=1, tiled=True)
    out = linear(mid, lp["w_down"], lp.get("b_down"))
    if tp_axis is not None:
        out = jax.lax.all_gather(out, tp_axis, axis=1, tiled=True)
    return out
