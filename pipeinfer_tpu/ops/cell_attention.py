"""Pallas flash attention over the sequence-aware cell cache.

The long-context hot path: instead of materializing [T, C] score/mask
arrays in HBM (the dense fallback in runtime.kv_cache.attention), this
kernel streams cell blocks through VMEM with online softmax, computing the
tree-attention visibility mask *in-kernel* from per-cell (pos, seq-bitmask)
metadata — so speculation's branch masking costs nothing extra. ALiBi bias
is fused the same way.

Layout: per kv-head query rows [KVH, T*G, D] (GQA groups flattened into
rows — MXU-shaped), cache [KVH, C, D] head-major. Grid (KVH, C/BLOCK_C)
with the cell axis innermost; m/l/acc live in VMEM scratch across blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _kernel(
    q_ref,  # (1, TG, D) f32
    k_ref,  # (1, 1, BC, D) — leading layer axis; the layer is selected by
    #         the BlockSpec index map (static), so the kernel DMAs blocks
    #         straight out of the full [L, KVH, C, D] cache with no
    #         per-layer slice copy feeding the custom call
    v_ref,  # (1, 1, BC, D)
    pos_ref,  # (1, BC) i32 cell positions
    words_ref,  # (W, BC) i32 seq bitmask words (bitcast from uint32) —
    #             W = cell_seq.shape[1] (SEQ_WORDS), handled by a static
    #             unrolled select so ANY configured width masks correctly
    #             (a 2-word hardcode silently tested the wrong word for
    #             seq ids >= 64; ref multi-seq mask llama.cpp:5200-5240)
    tp_ref,  # (TG, 1) i32 token positions per row
    tw_ref,  # (TG, 1) i32 token seq word index (0..W-1)
    tb_ref,  # (TG, 1) i32 token seq bit shift (0..31)
    tv_ref,  # (TG, 1) i32 row validity (1/0)
    slope_ref,  # (1, TG, 1) f32 alibi slope per row (0 disables)
    o_ref,  # (1, TG, D)
    m_scr,  # (TG, 128) f32
    l_scr,  # (TG, 128) f32
    acc_scr,  # (TG, D) f32
    *,
    scale: float,
    n_blocks: int,
    n_words: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (TG, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (BC, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TG, BC)

    cpos = pos_ref[...]  # (1, BC)
    tw = tw_ref[...]  # (TG, 1)
    tb = tb_ref[...]
    tp = tp_ref[...]
    tv = tv_ref[...]

    # bounded static switch over the token's seq word index
    word = jnp.broadcast_to(words_ref[0:1, :], (tw.shape[0], cpos.shape[1]))
    for w in range(1, n_words):
        word = jnp.where(tw == w, words_ref[w : w + 1, :], word)
    bit = jax.lax.shift_right_logical(word, tb) & 1
    visible = (bit != 0) & (cpos <= tp) & (cpos >= 0) & (tv != 0)
    s = s + jnp.where(visible, 0.0, NEG)
    slope = slope_ref[0]  # (TG, 1)
    s = s + slope * jnp.maximum(cpos, 0).astype(jnp.float32)

    m_prev = m_scr[:, :1]  # (TG, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    v = v_ref[0, 0].astype(jnp.float32)  # (BC, D)
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(j == n_blocks - 1)
    def _store():
        l_f = l_scr[:, :1]
        safe = jnp.where(l_f == 0.0, 1.0, l_f)
        o_ref[0] = (acc_scr[...] / safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("layer", "scale", "block_c", "interpret", "hot")
)
def cell_attention(
    q: jax.Array,  # [T, H, D]
    k_cache: jax.Array,  # [L, KVH, C, D] full cache (or [KVH, C, D])
    v_cache: jax.Array,  # like k_cache
    cell_pos: jax.Array,  # [C] i32
    cell_seq: jax.Array,  # [C, W] u32 (W = SEQ_WORDS; any width works)
    tok_pos: jax.Array,  # [T] i32
    tok_seq: jax.Array,  # [T] i32
    valid: jax.Array,  # [T] bool
    *,
    layer: int = 0,  # static layer index into a 4-D cache: selected by the
    #                  BlockSpec index map, so no [KVH, C, D] slice is ever
    #                  materialized to feed the kernel (a per-layer slice
    #                  copy costs a full K+V pass over the pool per step)
    scale: float,
    alibi: jax.Array | None = None,  # [H] f32 slopes
    block_c: int = 512,
    interpret: bool = False,
    hot: int = 0,  # occupancy high-water mark: only cell blocks below it
    #               enter the grid — the tail of the pool is never DMA'd
    #               (no slicing/copies; KVCache.hot plumbs this through)
) -> jax.Array:
    t, h, d = q.shape
    if k_cache.ndim == 3:  # single-layer view: free metadata-only lift
        k_cache, v_cache, layer = k_cache[None], v_cache[None], 0
    kvh, c_full = k_cache.shape[1], k_cache.shape[2]
    g = h // kvh
    c = hot if (hot and hot < c_full) else c_full
    if block_c == 512 and c % 1024 == 0 and c_full % 1024 == 0:
        # bigger cell blocks halve the grid-step count: measured 42 -> 30
        # us/layer at C=1024 on v5e (per-grid-step overhead, not DMA-bound)
        block_c = 1024
    assert c % block_c == 0 and c_full % block_c == 0, (c, c_full, block_c)

    # per-kv-head query rows, padded to a sublane multiple
    tg = t * g
    tg_pad = max(8, -(-tg // 8) * 8)
    qr = q.astype(jnp.float32).reshape(t, kvh, g, d).transpose(1, 0, 2, 3).reshape(kvh, tg, d)
    qr = jnp.pad(qr, ((0, 0), (0, tg_pad - tg), (0, 0)))

    def rows(x, fill=0):
        r = jnp.repeat(x, g, total_repeat_length=tg)
        return jnp.pad(r, (0, tg_pad - tg), constant_values=fill)[:, None]

    tp = rows(tok_pos.astype(jnp.int32))
    tw = rows((tok_seq // 32).astype(jnp.int32))
    tb = rows((tok_seq % 32).astype(jnp.int32))
    tv = rows(valid.astype(jnp.int32))
    if alibi is not None:
        srow = alibi.astype(jnp.float32).reshape(kvh, g)
        srow = jnp.tile(srow[:, None, :], (1, t, 1)).reshape(kvh, tg)
        srow = jnp.pad(srow, ((0, 0), (0, tg_pad - tg)))[..., None]  # [KVH, TG, 1]
    else:
        srow = jnp.zeros((kvh, tg_pad, 1), jnp.float32)

    pos2 = cell_pos.astype(jnp.int32)[None, :]  # (1, C)
    n_words = cell_seq.shape[1]
    words = cell_seq.T.astype(jnp.int32)  # (W, C)

    n_blocks = c // block_c
    grid = (kvh, n_blocks)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_blocks=n_blocks,
                          n_words=n_words),
        out_shape=jax.ShapeDtypeStruct((kvh, tg_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tg_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_c, d), lambda i, j, _l=layer: (_l, i, j, 0)),
            pl.BlockSpec((1, 1, block_c, d), lambda i, j, _l=layer: (_l, i, j, 0)),
            pl.BlockSpec((1, block_c), lambda i, j: (0, j)),
            pl.BlockSpec((n_words, block_c), lambda i, j: (0, j)),
            pl.BlockSpec((tg_pad, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((tg_pad, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((tg_pad, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((tg_pad, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, tg_pad, 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tg_pad, d), lambda i, j: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tg_pad, 128), jnp.float32),
            pltpu.VMEM((tg_pad, 128), jnp.float32),
            pltpu.VMEM((tg_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qr, k_cache, v_cache, pos2, words, tp, tw, tb, tv, srow)

    out = out[:, :tg].reshape(kvh, t, g, d).transpose(1, 0, 2, 3).reshape(t, h, d)
    return out
