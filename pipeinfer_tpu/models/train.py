"""Differentiable batched training forward for the llama family.

Counterpart of the reference's training graphs (ref: common/train.cpp +
examples/finetune / train-text-from-scratch) re-built the JAX way: a pure
[B, T] causal forward with `jax.checkpoint` rematerialization per layer
(trade FLOPs for memory), no KV cache, f32 master weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import layers as L
from .config import ModelConfig


def _layer(h, lp, cfg: ModelConfig, cos, sin, mask):
    b, t, e = h.shape
    a = L.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
    af = a.reshape(b * t, e)
    q = (af @ lp["wq"].T).reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = (af @ lp["wk"].T).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    v = (af @ lp["wv"].T).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    q = _rope(q, cos, sin)
    k = _rope(k, cos, sin)
    gsize = cfg.n_heads // cfg.n_kv_heads
    qg = q.reshape(b, t, cfg.n_kv_heads, gsize, cfg.head_dim)
    scores = jnp.einsum("bikgd,bjkd->bkgij", qg, k) * cfg.attn_scale
    scores = scores + mask[None, None, None, :, :]
    p = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bkgij,bjkd->bikgd", p, v).reshape(b * t, cfg.n_heads * cfg.head_dim)
    h = h + (attn @ lp["wo"].T).reshape(b, t, e)
    f = L.rms_norm(h, lp["ffn_norm"], cfg.norm_eps).reshape(b * t, e)
    gate = L.silu(f @ lp["w_gate"].T)
    up = f @ lp["w_up"].T
    h = h + ((gate * up) @ lp["w_down"].T).reshape(b, t, e)
    return h


def _rope(x, cos, sin):
    # adjacent-pair (ggml "norm") rotation, batched
    b, t, hh, d = x.shape
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    r0 = x0 * c - x1 * s
    r1 = x0 * s + x1 * c
    return jnp.stack([r0, r1], axis=-1).reshape(b, t, hh, d)


def forward_train(params, cfg: ModelConfig, tokens: jax.Array) -> jax.Array:
    """tokens [B, T] -> logits [B, T, V] (f32, fully differentiable)."""
    b, t = tokens.shape
    h = params["tok_embd"][tokens]
    pos = jnp.arange(t)
    half = cfg.rope_dims // 2
    inv_freq = cfg.rope_base ** (-2.0 * jnp.arange(half) / cfg.rope_dims)
    theta = pos[:, None].astype(jnp.float32) * inv_freq[None, :] * cfg.rope_scale
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    mask = jnp.where(
        jnp.tril(jnp.ones((t, t), bool)), 0.0, -1e9
    )

    layer_fn = jax.checkpoint(lambda h, lp: _layer(h, lp, cfg, cos, sin, mask))
    for lp in params["layers"]:
        h = layer_fn(h, lp)
    out = L.rms_norm(h, params["output_norm"], cfg.norm_eps)
    return (out.reshape(b * t, -1) @ params["output"].T).reshape(b, t, -1)


def lm_loss(params, cfg: ModelConfig, tokens: jax.Array) -> jax.Array:
    """Causal next-token cross-entropy."""
    logits = forward_train(params, cfg, tokens[:, :-1])
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()
