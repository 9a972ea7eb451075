"""Sequence-aware KV cache with tree attention, as jitted device ops.

TPU-native re-design of the reference's cell-based KV cache
(ref: llama.cpp:1292-1338 `llama_kv_cell`/`llama_kv_cache`; seq ops
:9238-9359; per-token multi-seq attention mask :5200-5240):

- fixed-size cell arrays (static shapes for XLA): K/V of [L, C, KVH, D];
- per-cell metadata ON DEVICE: ``pos`` int32 [C] (-1 = free) and a seq-id
  **bitmask** ``seq`` uint32 [C, SW] (up to 32*SW live sequence slots) —
  the TPU equivalent of the reference's per-cell ``set<seq_id>``;
- ``seq_cp`` is zero-copy prefix sharing (sets a bit) exactly like the
  reference — tree speculation branches share prompt cells;
- all mutations are jitted index updates; the attention mask is computed
  on device from (pos, seq) so speculation rollback/verify never round-trips
  to the host;
- context shifting (`seq_shift`) re-rotates cached K by the position delta,
  the counterpart of the lazily-applied K_shift rope
  (ref: llama.cpp:3495-3544 `llm_build_k_shift`).

A host-side mirror of the metadata lives in runtime.context for slot
allocation decisions; device arrays are the source of truth for attention.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.layers import apply_rope

# Sequence-slot ceiling: 32*SEQ_WORDS concurrent slots. The reference keeps
# a 1000-entry seq-offset pool (speculative.cpp:140-145) because its cells
# store arbitrary-size seq-id SETS; here membership is a fixed bitmask so
# the mask fits device registers and seq ops stay O(cells). The default
# 2 words (64 slots) carry ~16 concurrent speculative streams at the
# default stride (spec/multi.py carves per-request namespaces); set
# PIPEINFER_SEQ_WORDS to widen — masks are [C, SEQ_WORDS] on device AND in
# the host mirrors (+4 bytes/cell/word), and every mirror op goes through
# the host_* helpers below, so no code change is needed.
import os as _os

SEQ_WORDS = max(1, int(_os.environ.get("PIPEINFER_SEQ_WORDS", "2")))
MASK_VALUE = -1e9  # additive mask (finite to avoid exp(-inf - -inf) NaN)


# -- host-mirror helpers ------------------------------------------------------
# The allocation mirrors in runtime.context / parallel.stages keep a numpy
# copy of the seq bitmask as [C, SEQ_WORDS] uint32 (same layout as the
# device array). All bit math lives here so SEQ_WORDS stays a config knob.


def host_seq_zeros(n_cells: int):
    import numpy as _np

    return _np.zeros((n_cells, SEQ_WORDS), _np.uint32)


def host_only(seq_id: int):
    """A single-membership row [SEQ_WORDS] for seq_id."""
    import numpy as _np

    row = _np.zeros(SEQ_WORDS, _np.uint32)
    row[seq_id // 32] = _np.uint32(1) << _np.uint32(seq_id % 32)
    return row


def reclaim_cells(ctx, cells, keep: int, base: int, seq: int = 0):
    """Reconcile a context's HOST mirrors with device truth for one
    device-verified run's cells: rows [0, keep) are live at positions
    base+row on `seq`; the device program freed the rest. The single
    reconcile contract shared by every engine that verifies on device
    (spec/device_loop.py, spec/device_multi.py, spec/corrected.py) —
    change it here, not in per-engine copies."""
    import numpy as _np

    flat = _np.asarray(cells).reshape(-1)
    if keep:
        ctx.h_pos[flat[:keep]] = base + _np.arange(keep)
        ctx.h_seq[flat[:keep]] = host_only(seq)
    ctx.h_pos[flat[keep:]] = -1
    ctx.h_seq[flat[keep:]] = 0


def host_rows(seq_lists):
    """Membership rows [n, SEQ_WORDS] for a list of seq-id lists."""
    import numpy as _np

    rows = _np.zeros((len(seq_lists), SEQ_WORDS), _np.uint32)
    for i, seqs in enumerate(seq_lists):
        for s in seqs:
            rows[i, s // 32] |= _np.uint32(1) << _np.uint32(s % 32)
    return rows


def host_member(h_seq, seq_id: int):
    """bool [C]: which mirror rows contain seq_id."""
    import numpy as _np

    return (h_seq[:, seq_id // 32]
            & (_np.uint32(1) << _np.uint32(seq_id % 32))) != 0


def host_set(h_seq, seq_id: int, where):
    import numpy as _np

    h_seq[where, seq_id // 32] |= _np.uint32(1) << _np.uint32(seq_id % 32)


def host_clear(h_seq, seq_id: int, where=slice(None)):
    import numpy as _np

    h_seq[where, seq_id // 32] &= ~(_np.uint32(1) << _np.uint32(seq_id % 32))


def host_empty(h_seq):
    """bool [C]: rows with no memberships left."""
    return ~h_seq.any(axis=1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k: jax.Array  # [L, KVH, C, D] (head-major: clean per-head tiles for
    #               the Pallas attention kernel and contiguous head reads)
    v: jax.Array  # [L, KVH, C, D]
    pos: jax.Array  # int32 [C], -1 = free
    seq: jax.Array  # uint32 [C, SEQ_WORDS] membership bitmask
    # STATIC (pytree aux) high-water mark: every occupied cell index is
    # < hot, so attention only streams cells [0, hot) — step cost scales
    # with live context, not pool size (the host allocator is first-fit,
    # so the occupied region stays prefix-dense). 0 = unknown/whole pool.
    # Bucketized by the host (powers of two) so jit variants stay few.
    hot: int = 0

    def tree_flatten(self):
        return (self.k, self.v, self.pos, self.seq), self.hot

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, hot=aux)

    @property
    def n_cells(self) -> int:
        return self.pos.shape[0]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]


def create(n_layers: int, n_cells: int, n_kv_heads: int, head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    return KVCache(
        k=jnp.zeros((n_layers, n_kv_heads, n_cells, head_dim), dtype),
        v=jnp.zeros((n_layers, n_kv_heads, n_cells, head_dim), dtype),
        pos=jnp.full((n_cells,), -1, jnp.int32),
        seq=jnp.zeros((n_cells, SEQ_WORDS), jnp.uint32),
    )


def _seq_bit(seq_id: jax.Array) -> tuple[jax.Array, jax.Array]:
    """seq id -> (word index, bit mask)."""
    return seq_id // 32, (jnp.uint32(1) << (seq_id % 32).astype(jnp.uint32))


def _member(seq: jax.Array, seq_id: jax.Array) -> jax.Array:
    """[C] bool: does each cell belong to seq_id (scalar)?"""
    w, b = _seq_bit(seq_id)
    return (seq[:, w] & b) != 0


# ---------------------------------------------------------------------------
# Mutations (all functional; callers rebuild KVCache via dataclasses.replace)
# ---------------------------------------------------------------------------


def write_tokens(
    cache: KVCache,
    layer: jax.Array | int,
    cell_idx: jax.Array,  # int32 [T]
    k_new: jax.Array,  # [T, KVH, D]
    v_new: jax.Array,
) -> KVCache:
    """Store K/V rows for one layer at the given cells (k_new [T, KVH, D]).

    Note: mixed basic/advanced indexing puts the cell axis FIRST, so the
    update operand is [T, KVH, D] directly."""
    k = cache.k.at[layer, :, cell_idx].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[layer, :, cell_idx].set(v_new.astype(cache.v.dtype))
    return dataclasses.replace(cache, k=k, v=v)


def write_meta(
    cache: KVCache,
    cell_idx: jax.Array,  # int32 [T]
    pos: jax.Array,  # int32 [T]
    seq_id: jax.Array,  # int32 [T] primary sequence (or sole member)
    valid: jax.Array | None = None,  # bool [T] (False for padding tokens)
    seq_bits: jax.Array | None = None,  # uint32 [T, SEQ_WORDS] full membership
) -> KVCache:
    """Claim cells for the new tokens. Membership is {seq_id} unless an
    explicit multi-sequence bitmask is given (tree batches: a shared-prefix
    token belongs to every branch split from it, the counterpart of the
    reference's per-token seq_id lists, llama.h llama_batch.n_seq_id)."""
    if seq_bits is None:
        w, b = _seq_bit(seq_id)
        seq_bits = jnp.zeros((cell_idx.shape[0], SEQ_WORDS), jnp.uint32)
        seq_bits = seq_bits.at[jnp.arange(cell_idx.shape[0]), w].set(b)
    if valid is not None:
        pos = jnp.where(valid, pos, cache.pos[cell_idx])
        seq_bits = jnp.where(valid[:, None], seq_bits, cache.seq[cell_idx])
    new_pos = cache.pos.at[cell_idx].set(pos)
    new_seq = cache.seq.at[cell_idx].set(seq_bits)
    return dataclasses.replace(cache, pos=new_pos, seq=new_seq)


def seq_rm(cache: KVCache, seq_id, p0, p1) -> KVCache:
    """Remove seq membership in [p0, p1); free cells with no members left
    (ref: llama_kv_cache_seq_rm, llama.cpp:9245-9268). p1 < 0 means +inf."""
    seq_id = jnp.asarray(seq_id, jnp.int32)
    p0 = jnp.asarray(p0, jnp.int32)
    p1 = jnp.asarray(p1, jnp.int32)
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    in_range = (cache.pos >= p0) & (cache.pos < p1)
    hit = _member(cache.seq, seq_id) & in_range
    w, b = _seq_bit(seq_id)
    cleared = cache.seq.at[:, w].set(jnp.where(hit, cache.seq[:, w] & ~b, cache.seq[:, w]))
    empty = jnp.all(cleared == 0, axis=1)
    new_pos = jnp.where(empty, -1, cache.pos)
    return dataclasses.replace(cache, seq=cleared, pos=new_pos)


def seq_cp(cache: KVCache, src, dst, p0, p1) -> KVCache:
    """Share cells of src with dst in [p0, p1) — zero-copy, just a bit-OR
    (ref: llama_kv_cache_seq_cp, llama.cpp:9270-9288)."""
    src = jnp.asarray(src, jnp.int32)
    dst = jnp.asarray(dst, jnp.int32)
    p0 = jnp.asarray(p0, jnp.int32)
    p1 = jnp.asarray(p1, jnp.int32)
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = _member(cache.seq, src) & (cache.pos >= p0) & (cache.pos < p1)
    w, b = _seq_bit(dst)
    new_word = jnp.where(hit, cache.seq[:, w] | b, cache.seq[:, w])
    return dataclasses.replace(cache, seq=cache.seq.at[:, w].set(new_word))


def rm_tail(cache: KVCache, p0) -> KVCache:
    """Free every cell at pos >= p0 regardless of sequence membership
    (ref: llama_kv_cache_seq_rm with seq_id == -1 — the lookahead driver's
    per-step scratch cleanup, examples/lookahead/lookahead.cpp:443)."""
    p0 = jnp.asarray(p0, jnp.int32)
    hit = cache.pos >= p0
    new_seq = jnp.where(hit[:, None], jnp.uint32(0), cache.seq)
    new_pos = jnp.where(hit, -1, cache.pos)
    return dataclasses.replace(cache, seq=new_seq, pos=new_pos)


def seq_keep(cache: KVCache, seq_id) -> KVCache:
    """Drop every sequence except seq_id; surviving cells belong only to it
    (ref: llama_kv_cache_seq_keep, llama.cpp:9290-9307)."""
    seq_id = jnp.asarray(seq_id, jnp.int32)
    keep = _member(cache.seq, seq_id)
    w, b = _seq_bit(seq_id)
    new_seq = jnp.zeros_like(cache.seq)
    new_seq = new_seq.at[:, w].set(jnp.where(keep, b, jnp.uint32(0)))
    new_pos = jnp.where(keep, cache.pos, -1)
    return dataclasses.replace(cache, seq=new_seq, pos=new_pos)


def seq_shift(
    cache: KVCache,
    seq_id,
    p0,
    p1,
    delta,
    *,
    rope_dims: int,
    rope_mode: str = "norm",
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
) -> KVCache:
    """Shift positions by delta in [p0, p1) and re-rotate cached K by the
    same delta (ref: llama_kv_cache_seq_shift :9348-9359 + K_shift graph op
    llama.cpp:3495-3544). Cells shifted below pos 0 are freed."""
    seq_id = jnp.asarray(seq_id, jnp.int32)
    p0 = jnp.asarray(p0, jnp.int32)
    p1 = jnp.asarray(p1, jnp.int32)
    p1 = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
    hit = _member(cache.seq, seq_id) & (cache.pos >= p0) & (cache.pos < p1)
    new_pos = jnp.where(hit, cache.pos + delta, cache.pos)

    # rotate K of affected cells by delta across all layers:
    # [L, KVH, C, D] -> rope with per-cell angle delta (0 where unaffected)
    l_, kvh, c, d = cache.k.shape
    per_cell_delta = jnp.where(hit, jnp.asarray(delta, jnp.int32), 0)
    k2 = cache.k.transpose(0, 2, 1, 3).reshape(l_ * c, kvh, d)
    deltas = jnp.tile(per_cell_delta, (l_,))
    k_rot = (
        apply_rope(
            k2, deltas, rope_dims, mode=rope_mode, freq_base=freq_base, freq_scale=freq_scale
        )
        .reshape(l_, c, kvh, d)
        .transpose(0, 2, 1, 3)
    )

    dropped = hit & (new_pos < 0)
    final_pos = jnp.where(dropped, -1, new_pos)
    new_seq = jnp.where(dropped[:, None], jnp.zeros_like(cache.seq), cache.seq)
    return dataclasses.replace(cache, k=k_rot, pos=final_pos, seq=new_seq)


def shift_cells(
    cache: KVCache,
    cells: jax.Array,  # int32 [N] affected cell indices, padded with `trash`
    delta,
    trash,
    *,
    rope_dims: int,
    rope_mode: str = "norm",
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
) -> KVCache:
    """Range-limited K-shift: re-rotate ONLY the given cells (gather → rope
    → scatter), the TPU counterpart of the reference's lazily-applied
    per-range K_shift (ref: llama.cpp:3495-3544) — the caller (the host
    cell mirror) knows which cells a [p0,p1) shift touches, so traffic is
    O(affected · L) instead of O(n_cells · L). Padding entries must point
    at the trash cell (identity delta)."""
    delta = jnp.asarray(delta, jnp.int32)
    pad = jnp.asarray(cells, jnp.int32) == jnp.asarray(trash, jnp.int32)
    d_eff = jnp.where(pad, 0, delta)  # [N]

    # rotate gathered K rows by d_eff (pairwise adjacent rope, matching
    # ops.layers.apply_rope "norm" / "neox" conventions)
    k_sel = cache.k[:, :, cells].astype(jnp.float32)  # [L, KVH, N, D]
    d = k_sel.shape[-1]
    half = rope_dims // 2
    freqs = freq_base ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / rope_dims)
    angles = d_eff.astype(jnp.float32)[:, None] * freqs[None, :] * freq_scale  # [N, half]
    cos = jnp.cos(angles)[None, None]  # [1, 1, N, half]
    sin = jnp.sin(angles)[None, None]
    if rope_mode == "neox":
        x1 = k_sel[..., :half]
        x2 = k_sel[..., half : 2 * half]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        k_rot = jnp.concatenate([r1, r2, k_sel[..., 2 * half :]], axis=-1)
    else:
        xe = k_sel[..., 0:rope_dims:2]
        xo = k_sel[..., 1:rope_dims:2]
        r_e = xe * cos - xo * sin
        r_o = xe * sin + xo * cos
        rot = jnp.stack([r_e, r_o], axis=-1).reshape(*k_sel.shape[:-1], rope_dims)
        k_rot = jnp.concatenate([rot, k_sel[..., rope_dims:]], axis=-1)
    new_k = cache.k.at[:, :, cells].set(k_rot.astype(cache.k.dtype))

    new_cell_pos = cache.pos[cells] + d_eff
    new_pos = cache.pos.at[cells].set(jnp.where(pad, cache.pos[cells], new_cell_pos))
    dropped = (~pad) & (new_cell_pos < 0)
    new_pos = new_pos.at[cells].set(jnp.where(dropped, -1, new_pos[cells]))
    new_seq = cache.seq.at[cells].set(
        jnp.where(dropped[:, None], jnp.zeros_like(cache.seq[cells]), cache.seq[cells])
    )
    return dataclasses.replace(cache, k=new_k, pos=new_pos, seq=new_seq)


def clear(cache: KVCache) -> KVCache:
    return dataclasses.replace(
        cache,
        pos=jnp.full_like(cache.pos, -1),
        seq=jnp.zeros_like(cache.seq),
    )


# ---------------------------------------------------------------------------
# Attention mask (tree attention)
# ---------------------------------------------------------------------------


def attn_mask(cache: KVCache, tok_pos: jax.Array, tok_seq: jax.Array) -> jax.Array:
    """Additive mask [T, C]: token t attends cell c iff c belongs to t's
    sequence and cell_pos <= tok_pos (causal). Per-token seq membership is
    what makes draft-tree branches attend only their own prefix
    (ref: llama.cpp:5200-5240 graph callback mask)."""
    words = jnp.take(cache.seq, tok_seq // 32, axis=1)  # [C, T]
    bits = (words >> (tok_seq % 32).astype(jnp.uint32)[None, :]) & 1
    visible = (bits.T != 0) & (cache.pos[None, :] <= tok_pos[:, None]) & (cache.pos[None, :] >= 0)
    return jnp.where(visible, 0.0, MASK_VALUE).astype(jnp.float32)


def alibi_slopes(n_heads: int, max_bias: float) -> jax.Array:
    """Per-head ALiBi slopes (ref: ggml.c ggml_alibi semantics — power-of-two
    head bucketing with interpolated slopes for non-pow2 head counts)."""
    import math

    n_floor = 2 ** int(math.floor(math.log2(n_heads)))
    m0 = 2.0 ** (-max_bias / n_floor)
    m1 = 2.0 ** (-max_bias / 2.0 / n_floor)
    slopes = []
    for h in range(n_heads):
        if h < n_floor:
            slopes.append(m0 ** (h + 1))
        else:
            slopes.append(m1 ** (2 * (h - n_floor) + 1))
    return jnp.asarray(slopes, jnp.float32)


def attention(
    q: jax.Array,  # [T, H, D]
    k_cache: jax.Array,  # [KVH, C, D]
    v_cache: jax.Array,  # [KVH, C, D]
    mask: jax.Array,  # [T, C] additive
    *,
    scale: float,
    alibi: jax.Array | None = None,  # [H] slopes; bias = slope * cell_pos
    cache_pos: jax.Array | None = None,  # [C] required with alibi
) -> jax.Array:
    """Dense masked SDPA over the whole cell array (GQA-aware), with
    optional ALiBi position bias (ref: ggml_alibi — bias = slope * key pos).

    C is static so XLA sees fixed shapes; free cells are masked. For long
    cell arrays the Pallas flash kernel (ops.cell_attention) takes over."""
    t, h, d = q.shape
    kvh, c, _ = k_cache.shape
    gsize = h // kvh
    qf = q.astype(jnp.float32).reshape(t, kvh, gsize, d)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("tkgd,kcd->tkgc", qf, kf) * scale
    scores = scores + mask[:, None, None, :]
    if alibi is not None:
        bias = alibi.reshape(kvh, gsize)[None, :, :, None] * jnp.maximum(
            cache_pos, 0
        ).astype(jnp.float32)[None, None, None, :]
        scores = scores + bias
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgc,kcd->tkgd", p, vf)
    return out.reshape(t, h, d)


# Flash-vs-dense dispatch (measured on v5e at 7B shapes, 1024-cell pool):
# - The dense path's cache.k[layer] slice MATERIALIZES per-layer K and V
#   slab copies (2 x ~46 us/layer = ~2.9 ms/token at T=1 — it was the
#   dominant "glue" cost of sequential decode; flash took the 7B chain
#   from 99 to 171 tok/s). Flash reads the 4-D cache in place.
# - At verify batches (T=32) the slab copies amortize over the batch and
#   the dense MXU einsum wins: flash-for-all-T collapsed the speculative
#   step (382 -> 235 tok/s). So small pools use flash only for small T;
#   big pools (>= FLASH_MIN_CELLS_BIG, where slab copies are huge) use
#   flash for every T, as before.
# Overrides: PIPEINFER_FLASH_MIN_CELLS / _FLASH_MAX_T / _FLASH_BIG.
import os as _os

FLASH_MIN_CELLS = int(_os.environ.get("PIPEINFER_FLASH_MIN_CELLS", 512))
FLASH_SMALL_T = int(_os.environ.get("PIPEINFER_FLASH_MAX_T", 4))
FLASH_MIN_CELLS_BIG = int(_os.environ.get("PIPEINFER_FLASH_BIG", 8192))


def hot_bucket(h_pos, trash_cell: int) -> int:
    """Bucketized occupancy high-water mark for a host pos mirror: the
    power-of-two (min 512) covering the highest occupied cell, or 0 for
    "stream the whole pool". ONE definition — the precompile hot ladders
    and every context's _refresh_hot must agree, or warm-compiled hot
    variants miss the runtime values and the first prefill recompiles."""
    import numpy as np

    n = trash_cell + 1
    if n <= 512:
        return 0
    used = np.nonzero(h_pos[:trash_cell] >= 0)[0]
    hw = int(used[-1]) + 1 if len(used) else 1
    b = 512
    while b < hw:
        b *= 2
    b = min(b, n)
    return 0 if b >= n else b


def round_pool(n_cells: int) -> int:
    """Round a cell-pool size up to the flash-dispatch granularity (the
    kernel requires C % 512 == 0; pools that miss it silently fall back to
    the dense slab-copy path). Every context and stage worker MUST use the
    same rounding — cell indices are shared across stages/processes."""
    if n_cells <= 512:
        return n_cells
    return -(-n_cells // 512) * 512


def attend(
    q: jax.Array,
    cache: KVCache,
    layer,
    mask: jax.Array,
    tok_pos: jax.Array,
    tok_seq: jax.Array,
    valid: jax.Array,
    *,
    scale: float,
    alibi: jax.Array | None = None,
) -> jax.Array:
    """Attention dispatcher: dense masked SDPA for short cell arrays, the
    Pallas flash cell kernel for long ones (TPU only). When the cache
    carries a high-water mark (cache.hot), only cells [0, hot) are
    streamed — occupied cells beyond it cannot exist (host allocator is
    first-fit) and free cells are masked out anyway. The flash kernel
    bounds its GRID (tail blocks never DMA'd, zero copies); the dense
    path slices."""
    c = cache.n_cells
    hot = cache.hot if (cache.hot and cache.hot < c) else 0
    if (
        c >= FLASH_MIN_CELLS
        and c % 512 == 0
        and isinstance(layer, int)
        and jax.default_backend() == "tpu"
        and (q.shape[0] <= FLASH_SMALL_T or c >= FLASH_MIN_CELLS_BIG)
    ):
        from ..ops.cell_attention import cell_attention

        # full 4-D cache + static layer: the kernel's index map selects the
        # layer, so no [KVH, C, D] slice copy is materialized per call
        return cell_attention(
            q,
            cache.k,
            cache.v,
            cache.pos,
            cache.seq,
            tok_pos,
            tok_seq,
            valid,
            layer=layer,
            scale=scale,
            alibi=alibi,
            hot=hot,
        )
    if hot:
        k_l = jax.lax.slice_in_dim(cache.k[layer], 0, hot, axis=1)
        v_l = jax.lax.slice_in_dim(cache.v[layer], 0, hot, axis=1)
        cpos = cache.pos[:hot]
        mask = mask[:, :hot]
    else:
        k_l, v_l, cpos = cache.k[layer], cache.v[layer], cache.pos
    return attention(
        q, k_l, v_l, mask, scale=scale,
        alibi=alibi, cache_pos=cpos if alibi is not None else None,
    )
