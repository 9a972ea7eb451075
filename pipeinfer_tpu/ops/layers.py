"""Transformer layer primitives: norms, RoPE, activation glue.

Counterparts of the reference's graph-builder helpers
(ref: llama.cpp:3467-3778 `llm_build_norm/ffn/kqv`, ggml.c rope kernels).
Numerics follow ggml conventions so GGUF weights reproduce reference logits:

- RMSNorm in float32 with eps inside the rsqrt (ggml_rms_norm);
- RoPE "norm" mode rotates adjacent pairs (x[2i], x[2i+1]) — the layout the
  GGUF llama weights are permuted for (ref: convert.py permute(), ggml.c
  rope mode 0); "neox" mode rotates (x[i], x[i+d/2]) halves;
- linear rope scaling via freq_scale, NTK via freq_base
  (ref: llama.h:186-196 rope scaling params; YaRN ramp per ggml rope_yarn).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array | None, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def _rope_angles(
    pos: jax.Array,  # [T] int32
    n_dims: int,
    freq_base: float,
    freq_scale: float,
    *,
    yarn_ext_factor: float = 0.0,
    yarn_attn_factor: float = 1.0,
    yarn_beta_fast: float = 32.0,
    yarn_beta_slow: float = 1.0,
    n_orig_ctx: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables [T, n_dims/2] with linear + YaRN scaling
    (ref: ggml.c rope_yarn / ggml_rope_yarn_corr_dims)."""
    half = n_dims // 2
    idx = jnp.arange(half, dtype=jnp.float32)
    inv_freq = freq_base ** (-2.0 * idx / n_dims)  # theta per dim pair
    theta_extrap = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]
    mscale = yarn_attn_factor
    if yarn_ext_factor != 0.0 and n_orig_ctx > 0:
        # YaRN: interpolate low-frequency dims, extrapolate high-frequency
        def corr_dim(n_rot):
            return (n_dims * np.log(n_orig_ctx / (n_rot * 2 * np.pi))) / (
                2 * np.log(freq_base)
            )

        low = max(0.0, np.floor(corr_dim(yarn_beta_fast)))
        high = min(half * 2 - 1.0, np.ceil(corr_dim(yarn_beta_slow)))
        # ramp over the PAIR index (ggml rope_yarn_ramp uses i0/2)
        ramp = jnp.clip((idx - low) / max(high - low, 1e-3), 0.0, 1.0)
        ramp_mix = (1.0 - ramp) * yarn_ext_factor
        theta_interp = freq_scale * theta_extrap
        theta = theta_interp * (1.0 - ramp_mix) + theta_extrap * ramp_mix
        mscale = yarn_attn_factor * (1.0 + 0.1 * np.log(1.0 / freq_scale))
    else:
        theta = freq_scale * theta_extrap
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def apply_rope(
    x: jax.Array,  # [T, H, D]
    pos: jax.Array,  # [T]
    n_dims: int | None = None,
    *,
    mode: str = "norm",
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
    **yarn,
) -> jax.Array:
    """Rotate the first n_dims of each head. mode="norm": adjacent pairs
    (ggml llama convention); mode="neox": split halves."""
    t, h, d = x.shape
    if n_dims is None:
        n_dims = d
    cos, sin = _rope_angles(pos, n_dims, freq_base, freq_scale, **yarn)
    cos = cos[:, None, :]  # [T, 1, nd/2]
    sin = sin[:, None, :]
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :n_dims], xf[..., n_dims:]
    if mode == "norm":
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        out = jnp.stack([r0, r1], axis=-1).reshape(t, h, n_dims)
    elif mode == "neox":
        half = n_dims // 2
        x0 = rot[..., :half]
        x1 = rot[..., half:]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        out = jnp.concatenate([r0, r1], axis=-1)
    else:
        raise ValueError(f"unknown rope mode {mode}")
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)
