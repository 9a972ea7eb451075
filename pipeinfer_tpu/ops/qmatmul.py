"""Fused dequantize × matmul for TPU.

The counterpart of the reference's quantized dot-product matmul kernels
(ref: ggml-quants.c `ggml_vec_dot_q4_K_q8_K` etc. driven by ggml.c matmul),
re-designed for the MXU instead of AVX lanes:

- weights live packed in HBM in a **K-major planar layout** (the transpose
  of ``quant.pack``'s host layout): quant planes [K/2|K/4|K, N], scale/bias
  planes [K/G, N]. K-major makes every VMEM tile naturally aligned
  (scales tile is (K_tile/G, N_tile) = (8|16, 128·c)) and the matmul
  canonical (M,K)@(K,N);
- the kernel DMAs packed tiles into VMEM, unpacks nibble/bit planes with
  full-width VPU ops (sublane concats), expands per-group scales with a tiny
  MXU matmul (broadcast-by-matmul: E[tk, K/G] @ s — cheaper than lane
  shuffles), applies ``w = s*q - b`` and feeds bf16 tiles to the MXU;
- accumulation is float32 in VMEM scratch over the K grid dimension.

A pure-jnp reference path (`dequant` + XLA matmul) doubles as the fallback
for CPU tests / tiny shapes and as the golden model for kernel tests.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import GGMLQuantType
from ..quant.pack import FORMAT_INFO, PACK_GROUP, PackedWeight


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantTensor:
    """Device-side packed quantized [N, K] weight.

    Two layouts, chosen for the access pattern:
    - "k_major" (matmul weights): planes transposed to [K-ish, N] so every
      VMEM tile aligns and the matmul is canonical (M,K)@(K,N);
    - "n_major" (embedding tables): planes kept [N, K-ish] so per-token row
      gathers are sublane gathers (lane-axis gathers compile pathologically
      on TPU — measured ~90 s for a 32k-vocab table).
    """

    qs: jax.Array
    qh: jax.Array | None
    scales: jax.Array
    bias: jax.Array
    qtype: GGMLQuantType  # static
    shape: tuple[int, int]  # static (N, K)
    layout: str = "k_major"  # static

    @property
    def bits(self) -> int:
        return FORMAT_INFO[self.qtype][0]

    @property
    def group(self) -> int:
        return FORMAT_INFO[self.qtype][1]

    def nbytes(self) -> int:
        return (
            self.qs.size * self.qs.dtype.itemsize
            + (self.qh.size if self.qh is not None else 0)
            + self.scales.nbytes
            + self.bias.nbytes
        )

    def tree_flatten(self):
        children = (self.qs, self.qh, self.scales, self.bias)
        return children, (self.qtype, self.shape, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def to_device(pw: PackedWeight, sharding=None, layout: str = "k_major") -> QuantTensor:
    """Upload a host PackedWeight in the requested plane layout."""

    def put(a):
        if layout == "k_major":
            a = np.ascontiguousarray(a.T)
        return jax.device_put(a, sharding) if sharding is not None else jnp.asarray(a)

    return QuantTensor(
        qs=put(pw.qs),
        qh=put(pw.qh) if pw.qh is not None else None,
        scales=put(pw.scales),
        bias=put(pw.bias),
        qtype=pw.qtype,
        shape=pw.shape,
        layout=layout,
    )


# ---------------------------------------------------------------------------
# jnp unpack (golden + fallback)
# ---------------------------------------------------------------------------


def _unpack_quants_T_jnp(qt: QuantTensor) -> jax.Array:
    """Packed K-major planes -> integer quants W^T [K, N] (int32)."""
    n, k = qt.shape
    bits = qt.bits
    pg = min(PACK_GROUP, k)
    if bits == 8:
        return qt.qs.astype(jnp.int32)
    if bits in (4, 5, 6):
        b = qt.qs.reshape(k // pg, pg // 2, n).astype(jnp.int32)
        q = jnp.concatenate([b & 0xF, b >> 4], axis=1)
    else:
        b = qt.qs.reshape(k // pg, pg // 4, n).astype(jnp.int32)
        q = jnp.concatenate([(b >> (2 * i)) & 3 for i in range(4)], axis=1)
    if bits == 5:
        h = qt.qh.reshape(k // pg, pg // 8, n).astype(jnp.int32)
        hb = jnp.concatenate([(h >> i) & 1 for i in range(8)], axis=1)
        q = q | (hb << 4)
    elif bits == 6:
        h = qt.qh.reshape(k // pg, pg // 4, n).astype(jnp.int32)
        hb = jnp.concatenate([(h >> (2 * i)) & 3 for i in range(4)], axis=1)
        q = q | (hb << 4)
    elif bits == 3:
        h = qt.qh.reshape(k // pg, pg // 8, n).astype(jnp.int32)
        hb = jnp.concatenate([(h >> i) & 1 for i in range(8)], axis=1)
        q = q | (hb << 2)
    return q.reshape(k, n)


def dequant_T(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """Dequantize to W^T [K, N] (matmul-ready layout)."""
    if qt.layout == "n_major":
        return dequant(qt, dtype).T
    q = _unpack_quants_T_jnp(qt).astype(jnp.float32)
    s = jnp.repeat(qt.scales, qt.group, axis=0, total_repeat_length=qt.shape[1])
    b = jnp.repeat(qt.bias, qt.group, axis=0, total_repeat_length=qt.shape[1])
    return (s * q - b).astype(dtype)


def dequant(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """Dequantize to [N, K]; bit-exact with quant.formats dequantize at f32."""
    if qt.layout == "n_major":
        q = _unpack_quants_N_jnp(qt, qt.qs, qt.qh).astype(jnp.float32)
        s = jnp.repeat(qt.scales, qt.group, axis=1, total_repeat_length=qt.shape[1])
        b = jnp.repeat(qt.bias, qt.group, axis=1, total_repeat_length=qt.shape[1])
        return (s * q - b).astype(dtype)
    return dequant_T(qt, dtype).T


def _unpack_quants_N_jnp(qt: QuantTensor, qs, qh) -> jax.Array:
    """N-major planes (rows [R, cols]) -> integer quants [R, K] (int32)."""
    r = qs.shape[0]
    k = qt.shape[1]
    bits = qt.bits
    pg = min(PACK_GROUP, k)
    if bits == 8:
        return qs.astype(jnp.int32)
    if bits in (4, 5, 6):
        b = qs.reshape(r, k // pg, pg // 2).astype(jnp.int32)
        q = jnp.concatenate([b & 0xF, b >> 4], axis=2)
    else:
        b = qs.reshape(r, k // pg, pg // 4).astype(jnp.int32)
        q = jnp.concatenate([(b >> (2 * i)) & 3 for i in range(4)], axis=2)
    if bits == 5:
        h = qh.reshape(r, k // pg, pg // 8).astype(jnp.int32)
        hb = jnp.concatenate([(h >> i) & 1 for i in range(8)], axis=2)
        q = q | (hb << 4)
    elif bits == 6:
        h = qh.reshape(r, k // pg, pg // 4).astype(jnp.int32)
        hb = jnp.concatenate([(h >> (2 * i)) & 3 for i in range(4)], axis=2)
        q = q | (hb << 4)
    elif bits == 3:
        h = qh.reshape(r, k // pg, pg // 8).astype(jnp.int32)
        hb = jnp.concatenate([(h >> i) & 1 for i in range(8)], axis=2)
        q = q | (hb << 2)
    return q.reshape(r, k)


def dequant_rows(qt: QuantTensor, rows: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Gather + dequantize selected rows of W (token-embedding lookup) —
    the TPU analogue of the reference's per-token `ggml_get_rows` on
    quantized embeddings. Requires the "n_major" layout so the gather is a
    cheap sublane row gather."""
    if qt.layout != "n_major":
        raise ValueError("dequant_rows needs an n_major QuantTensor (embedding layout)")
    flat = rows.reshape(-1)
    qs = qt.qs[flat]
    qh = qt.qh[flat] if qt.qh is not None else None
    q = _unpack_quants_N_jnp(qt, qs, qh).astype(jnp.float32)
    s = jnp.repeat(qt.scales[flat], qt.group, axis=1, total_repeat_length=qt.shape[1])
    b = jnp.repeat(qt.bias[flat], qt.group, axis=1, total_repeat_length=qt.shape[1])
    out = (s * q - b).astype(dtype)
    return out.reshape(*rows.shape, qt.shape[1])


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _expand_groups_mxu(s: jax.Array, group: int, tk: int) -> jax.Array:
    """[tk/G, TN] -> [tk, TN] by MXU matmul with a 0/1 expansion matrix.

    Broadcasting along sublanes via the systolic array avoids unsupported
    shuffle reshapes inside the kernel."""
    ng = tk // group
    row = jax.lax.broadcasted_iota(jnp.int32, (tk, ng), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (tk, ng), 1)
    expand = jnp.where(row // group == grp, 1.0, 0.0).astype(jnp.float32)
    return jax.lax.dot(expand, s, preferred_element_type=jnp.float32)


def _unpack_tile_T(bits: int, qs, qh):
    """Unpack a K-major (tk, TN) tile of integer quants from packed planes
    (arrays, already loaded to VMEM registers).

    The k-tile covers exactly one PACK_GROUP (=256 rows of W^T), so the
    split-packed planes line up: nibble row j holds elems j and j+128."""
    if bits == 8:
        return qs.astype(jnp.float32)
    if bits in (4, 5, 6):
        b = qs.astype(jnp.int32)  # (128, TN)
        q = jnp.concatenate([b & 0xF, b >> 4], axis=0)
    else:
        b = qs.astype(jnp.int32)  # (64, TN)
        q = jnp.concatenate([(b >> (2 * i)) & 3 for i in range(4)], axis=0)
    if bits == 5:
        h = qh.astype(jnp.int32)  # (32, TN)
        hb = jnp.concatenate([(h >> i) & 1 for i in range(8)], axis=0)
        q = q | (hb << 4)
    elif bits == 6:
        h = qh.astype(jnp.int32)  # (64, TN)
        hb = jnp.concatenate([(h >> (2 * i)) & 3 for i in range(4)], axis=0)
        q = q | (hb << 4)
    elif bits == 3:
        h = qh.astype(jnp.int32)
        hb = jnp.concatenate([(h >> i) & 1 for i in range(8)], axis=0)
        q = q | (hb << 2)
    return q.astype(jnp.float32)


def _make_kernel(bits: int, group: int, tk: int, has_qh: bool, has_bias: bool,
                 ku: int, qs_rows: int, qh_rows: int, sg_rows: int):
    """ku pack-groups are processed per grid step (statically unrolled):
    small per-group tiles (36KB for Q4_K) leave the DMA engines idle and the
    grid overhead dominant at decode batch sizes; a 2048-deep K slab per
    step keeps the kernel HBM-bound instead."""

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        qs_ref = refs[idx]; idx += 1
        qh_ref = None
        if has_qh:
            qh_ref = refs[idx]; idx += 1
        s_ref = refs[idx]; idx += 1
        b_ref = None
        if has_bias:
            b_ref = refs[idx]; idx += 1
        o_ref = refs[idx]; idx += 1
        acc_ref = refs[idx]

        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x_all = x_ref[...]
        qs_all = qs_ref[...]
        qh_all = qh_ref[...] if has_qh else None
        s_all = s_ref[...]
        b_all = b_ref[...] if has_bias else None

        total = jnp.zeros_like(acc_ref[...])
        for u in range(ku):
            qs_u = qs_all[u * qs_rows : (u + 1) * qs_rows]
            qh_u = qh_all[u * qh_rows : (u + 1) * qh_rows] if has_qh else None
            q = _unpack_tile_T(bits, qs_u, qh_u)  # (tk, TN) f32
            s = _expand_groups_mxu(s_all[u * sg_rows : (u + 1) * sg_rows], group, tk)
            w = s * q
            if has_bias:
                w = w - _expand_groups_mxu(b_all[u * sg_rows : (u + 1) * sg_rows], group, tk)
            total += jnp.dot(
                x_all[:, u * tk : (u + 1) * tk], w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        acc_ref[...] += total
        o_ref[...] = acc_ref[...]

    return kernel


def _pad_rows(x: jax.Array, m_pad: int) -> jax.Array:
    m = x.shape[0]
    if m == m_pad:
        return x
    return jnp.pad(x, ((0, m_pad - m), (0, 0)))


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _qmm_pallas(x: jax.Array, qt: QuantTensor, block_n: int = 256, interpret: bool = False):
    n, k = qt.shape
    bits, group = FORMAT_INFO[qt.qtype]
    tk = PACK_GROUP
    assert k % tk == 0 and n % block_n == 0
    m = x.shape[0]
    m_pad = max(16, -(-m // 16) * 16)
    xp = _pad_rows(x.astype(jnp.bfloat16), m_pad)

    n_k = k // tk
    # K-unroll: process up to 8 pack-groups (2048 K) per grid step — the
    # largest divisor of n_k that fits the slab budget
    ku = 1
    for d in range(min(8, n_k), 0, -1):
        if n_k % d == 0:
            ku = d
            break
    grid = (n // block_n, n_k // ku)
    has_bias = qt.qtype != GGMLQuantType.Q8_0
    has_qh = qt.qh is not None

    qs_rows = qt.qs.shape[0] // n_k
    sg_rows = tk // group
    qh_rows = qt.qh.shape[0] // n_k if has_qh else 0

    in_specs = [
        pl.BlockSpec((m_pad, tk * ku), lambda i, j: (0, j)),
        pl.BlockSpec((qs_rows * ku, block_n), lambda i, j: (j, i)),
    ]
    args = [xp, qt.qs]
    if has_qh:
        in_specs.append(pl.BlockSpec((qh_rows * ku, block_n), lambda i, j: (j, i)))
        args.append(qt.qh)
    in_specs.append(pl.BlockSpec((sg_rows * ku, block_n), lambda i, j: (j, i)))
    args.append(qt.scales)
    if has_bias:
        in_specs.append(pl.BlockSpec((sg_rows * ku, block_n), lambda i, j: (j, i)))
        args.append(qt.bias)

    out = pl.pallas_call(
        _make_kernel(bits, group, tk, has_qh, has_bias, ku, qs_rows, qh_rows, sg_rows),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, block_n), lambda i, j: (0, i)),
        scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=qt.nbytes() + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m]


def _pallas_supported(qt: QuantTensor) -> bool:
    n, k = qt.shape
    return qt.layout == "k_major" and k % PACK_GROUP == 0 and n % 128 == 0


def qmatmul(
    x: jax.Array,
    qt: QuantTensor,
    *,
    prefer_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """y[M, N] = x[M, K] @ W[N, K]^T with W packed-quantized.

    Chooses the fused Pallas kernel on TPU for supported shapes, else the
    jnp dequant fallback. Output float32.
    """
    use_pallas = prefer_pallas
    if use_pallas is None:
        on_tpu = jax.devices()[0].platform == "tpu"
        use_pallas = on_tpu and _pallas_supported(qt)
    if use_pallas:
        block_n = 256 if qt.shape[0] % 256 == 0 else 128
        return _qmm_pallas(x, qt, block_n=block_n, interpret=interpret)
    w_t = dequant_T(qt, jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w_t, preferred_element_type=jnp.float32)
