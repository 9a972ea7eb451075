"""Fused dequantize × matmul for TPU.

The counterpart of the reference's quantized dot-product matmul kernels
(ref: ggml-quants.c `ggml_vec_dot_q4_K_q8_K` etc. driven by ggml.c matmul),
re-designed for the MXU instead of AVX lanes.

Device layouts, in order of construction:
- "k_major": bit-packed planes transposed to [K-ish, N]; kernel unpacks
  nibbles/scales in VMEM. Minimum HBM bytes, but every weight element
  crosses the VPU — and the v5e VPU sustains only ~1e12 elem-ops/s, so a
  7B decode step is VPU-bound at ~40 ms. Kept as the exact-dequant layout
  for CPU/tests.
- "i8"/"k4": intermediate designs (int8-widened planes / lo-hi nibble
  plane-split that avoids the interleave relayout). Still VPU-bound:
  scale application touches every element. Kept selectable; bit-exact.
- "i8g": weights REQUANTIZED at load to int8 on a per-(512-row slab,
  column) absmax grid; activations quantized per slab at run time; the
  kernel is pure MXU s8xs8->s32 dots with all scaling applied to the
  [M, N_tile] step output (sw_eff = sx*sw premultiplied outside). Zero
  per-weight-element VPU work: measured 700-800 GB/s (85-97% of v5e HBM
  roofline) at llama-7B shapes. 8-bit resolution over a 512 slab carries
  the accuracy of 4-bit over 32-groups; parity budget enforced in
  tests/test_qmatmul.py. Streams ~1 B/param — 2x the reference's 4-bit
  HBM bytes, which caps decode at ~half the packed-weight speed.
- "i4g" (DEFAULT on TPU for 4-bit formats): weights REQUANTIZED at load
  to 4-bit on a per-(256-row slab, column) affine min/max grid and kept
  NIBBLE-PACKED in HBM (~0.53 B/param). The kernel unpacks a packed tile
  with THREE full-width i32 VPU ops per 8 weights — bitcast u8->i32,
  (v & 0x0F0F0F0F) and ((v >> 4) & 0x0F0F0F0F), bitcast back to int8 —
  then feeds two MXU s8xs8->s32 dots per slab (lo/hi nibble planes are
  the two contiguous K-halves of the slab; the dot's K-sum is order-free
  so no interleave relayout ever happens). Scaling and the affine min
  term apply per slab OUTPUT. Measured ~604 GB/s (74% roofline) at 7B
  shapes = 1.87x the i8g step time at the same shapes — the VERDICT r2
  "4-bit-resident MXU matmul". (ref: ggml-quants.c
  ggml_vec_dot_q4_K_q8_K streams ~4.5 bits/weight on AVX; this is the
  MXU counterpart.)

A pure-jnp reference path (`dequant` + XLA matmul) doubles as the fallback
for CPU tests / tiny shapes and as the golden model for kernel tests.

NOTE on this machine's runtime (axon/IFRT proxy): dispatch+fetch RTT is
~30 ms and block_until_ready returns at remote enqueue — benchmark kernels
with a host fetch and amortize over many matmuls per dispatch.
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
    # "k4" layout only: hi-nibble-plane scale/bias ([K/64, N]); the base
    # scales/bias fields then hold the lo plane
    scales2: jax.Array | None = None
    bias2: jax.Array | None = None

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
            + (self.scales2.nbytes if self.scales2 is not None else 0)
            + (self.bias2.nbytes if self.bias2 is not None else 0)
        )

    def tree_flatten(self):
        children = (self.qs, self.qh, self.scales, self.bias, self.scales2, self.bias2)
        return children, (self.qtype, self.shape, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, qh, scales, bias, scales2, bias2 = children
        qtype, shape, layout = aux
        return cls(qs, qh, scales, bias, qtype, shape, layout, scales2, bias2)


def to_device(pw: PackedWeight, sharding=None, layout: str = "k_major") -> QuantTensor:
    """Upload a host PackedWeight in the requested plane layout.

    Layouts: "k_major" (bit-packed planes, minimum HBM), "n_major"
    (embedding row gathers), "i8" (integer quants widened to an int8
    [K, N] plane + f32 scale/bias planes — ~2x the HBM bytes of 4-bit
    packing but the kernel does a trivial cast instead of nibble surgery;
    measured ~30x faster on v5e, where Mosaic sublane relayouts dominate
    the packed kernel), "k4" (4-bit formats only: the packed nibble plane
    [K/2, N] stays 0.5 B/param in HBM and the kernel treats the lo and hi
    nibble planes as two independent K-halves of the dot — summation over
    K is order-free, so NO interleave/relayout is ever needed; scale/bias
    split into per-plane [K/64, N] tensors at load)."""

    def put(a):
        if layout in ("k_major", "i8"):
            a = np.ascontiguousarray(a.T)
        return jax.device_put(a, sharding) if sharding is not None else jnp.asarray(a)

    if layout == "i4g" and pw.bits != 4:
        layout = "i8g"  # 5/6/8/2/3-bit formats don't fit nibble packing
    if layout == "i8g":
        wq, sw = _i8g_planes_jit(
            jnp.asarray(pw.qs),
            jnp.asarray(pw.qh) if pw.qh is not None else None,
            jnp.asarray(pw.scales), jnp.asarray(pw.bias),
            bits=pw.bits, k=pw.shape[1], group=FORMAT_INFO[pw.qtype][1],
        )
        if sharding is not None:
            wq = jax.device_put(wq, sharding)
            sw = jax.device_put(sw, sharding)
        return QuantTensor(
            qs=wq, qh=None, scales=sw, bias=sw[:0],
            qtype=pw.qtype, shape=pw.shape, layout="i8g",
        )
    if layout == "i4g":
        wp4, step4, wmin4 = _i4g_planes_jit(
            jnp.asarray(pw.qs),
            jnp.asarray(pw.qh) if pw.qh is not None else None,
            jnp.asarray(pw.scales), jnp.asarray(pw.bias),
            bits=pw.bits, k=pw.shape[1], group=FORMAT_INFO[pw.qtype][1],
        )
        if sharding is not None:
            wp4 = jax.device_put(wp4, sharding)
            step4 = jax.device_put(step4, sharding)
            wmin4 = jax.device_put(wmin4, sharding)
        return QuantTensor(
            qs=wp4, qh=None, scales=step4, bias=wmin4,
            qtype=pw.qtype, shape=pw.shape, layout="i4g",
        )
    if layout == "k4":
        if pw.bits != 4 or pw.shape[1] % PACK_GROUP != 0:
            return to_device(pw, sharding, "i8")  # k4 is 4-bit, K%256 only
        qs_t, s_lo, s_hi, b_lo, b_hi = _k4_planes_jit(
            jnp.asarray(pw.qs), jnp.asarray(pw.scales), jnp.asarray(pw.bias)
        )
        if sharding is not None:
            qs_t, s_lo, s_hi, b_lo, b_hi = (
                jax.device_put(a, sharding) for a in (qs_t, s_lo, s_hi, b_lo, b_hi)
            )
        return QuantTensor(
            qs=qs_t, qh=None, scales=s_lo, bias=b_lo,
            qtype=pw.qtype, shape=pw.shape, layout="k4",
            scales2=s_hi, bias2=b_hi,
        )
    if layout == "i8":
        # unpack + transpose ON DEVICE: the host only ships the raw packed
        # planes (half the bytes, zero byte-twiddling — this host's numpy
        # does int8 transposes at ~7 MB/s, which made host-side unpack the
        # dominant cost of a 7B load)
        bits, (n, k) = pw.bits, pw.shape
        qh = jnp.asarray(pw.qh) if pw.qh is not None else None
        qs_i8, s_t, b_t = _i8_planes_jit(
            jnp.asarray(pw.qs), qh, jnp.asarray(pw.scales), jnp.asarray(pw.bias),
            bits=bits, k=k,
        )
        if sharding is not None:
            qs_i8 = jax.device_put(qs_i8, sharding)
            s_t = jax.device_put(s_t, sharding)
            b_t = jax.device_put(b_t, sharding)
        return QuantTensor(
            qs=qs_i8,
            qh=None,
            scales=s_t,
            bias=b_t,
            qtype=pw.qtype,
            shape=pw.shape,
            layout="i8",
        )
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
    if qt.layout == "i4g":
        k = qt.shape[1]
        kp = qt.qs.shape[0] * 2
        v = qt.qs.astype(jnp.int32)  # [Kp/2, N] packed bytes
        n = v.shape[1]
        lo = (v & 15).reshape(kp // I4G_SLAB, I4G_SLAB // 2, n)
        hi = (v >> 4).reshape(kp // I4G_SLAB, I4G_SLAB // 2, n)
        u = jnp.concatenate([lo, hi], axis=1).reshape(kp, n).astype(jnp.float32)
        hs = I4G_SLAB // 2
        step = jnp.repeat(qt.scales, hs, axis=0, total_repeat_length=kp)
        wmin = jnp.repeat(qt.bias, hs, axis=0, total_repeat_length=kp)
        return (wmin + step * u)[:k].astype(dtype)
    if qt.layout == "i8g":
        kp = qt.qs.shape[0]
        w = qt.qs.astype(jnp.float32) * jnp.repeat(
            qt.scales, I8G_SLAB, axis=0, total_repeat_length=kp
        )
        return w[: qt.shape[1]].astype(dtype)
    if qt.layout == "k4":
        n, k = qt.shape
        wi = qt.qs[: k // 2].astype(jnp.int32)  # trim pad rows
        sl = jnp.repeat(qt.scales, 32, axis=0, total_repeat_length=qt.scales.shape[0] * 32)[: k // 2]
        sh = jnp.repeat(qt.scales2, 32, axis=0, total_repeat_length=qt.scales2.shape[0] * 32)[: k // 2]
        bl = jnp.repeat(qt.bias, 32, axis=0, total_repeat_length=qt.bias.shape[0] * 32)[: k // 2]
        bh = jnp.repeat(qt.bias2, 32, axis=0, total_repeat_length=qt.bias2.shape[0] * 32)[: k // 2]
        w_lo = sl * (wi & 15).astype(jnp.float32) - bl
        w_hi = sh * (wi >> 4).astype(jnp.float32) - bh
        # plane row p holds elements (p//128)*256 + p%128 (lo) and +128 (hi)
        w4 = jnp.concatenate(
            [w_lo.reshape(k // 256, 128, n), w_hi.reshape(k // 256, 128, n)], axis=1
        )
        return w4.reshape(k, n).astype(dtype)
    if qt.layout == "i8":
        q = qt.qs.astype(jnp.float32)
        s = jnp.repeat(qt.scales, qt.group, axis=0, total_repeat_length=qt.shape[1])
        b = jnp.repeat(qt.bias, qt.group, axis=0, total_repeat_length=qt.shape[1])
        return (s * q - b).astype(dtype)
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
    return _unpack_quants_N_core(qs, qh, bits=qt.bits, k=qt.shape[1])


def _unpack_quants_N_core(qs, qh, *, bits: int, k: int) -> jax.Array:
    r = qs.shape[0]
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


@functools.partial(jax.jit, static_argnames=("bits", "k"))
def _i8_planes_jit(qs, qh, scales, bias, *, bits: int, k: int):
    """Raw N-major packed planes -> (int8 W^T [K,N], scales^T, bias^T)."""
    q = _unpack_quants_N_core(qs, qh, bits=bits, k=k)
    return q.astype(jnp.int8).T, scales.T, bias.T


def _pad_plane_rows(a: jax.Array, mult: int) -> jax.Array:
    r = a.shape[0]
    pad = (-r) % mult
    return a if pad == 0 else jnp.pad(a, ((0, pad), (0, 0)))


I8G_SLAB = 512  # K rows sharing one requant scale (and one grid step)
I4G_SLAB = 256  # K rows per 4-bit affine requant slab (dots are K=128/plane)


@functools.partial(jax.jit, static_argnames=("bits", "k", "group"))
def _i8g_planes_jit(qs, qh, scales, bias, *, bits: int, k: int, group: int):
    """Raw N-major packed planes -> (int8 W^T [Kp, N], sw [Kp/S, N] f32).

    Dequantizes the GGUF block format on device, then REQUANTIZES to int8
    on a per-(slab, column) absmax grid. 8-bit resolution over a 512-row
    slab carries the accuracy of 4-bit resolution over 32-row groups
    (range grows ~scale-spread, levels grow 16x), and the layout feeds the
    MXU int8 path directly — no per-weight-element VPU work at matmul
    time, which is the v5e bottleneck (~1e12 elem-ops/s) for every
    unpack-in-kernel design."""
    q = _unpack_quants_N_core(qs, qh, bits=bits, k=k).astype(jnp.float32)
    s = jnp.repeat(scales, group, axis=1, total_repeat_length=k)
    b = jnp.repeat(bias, group, axis=1, total_repeat_length=k)
    w = (s * q - b).T  # [K, N] f32
    w = _pad_plane_rows(w, I8G_SLAB)
    kp, n = w.shape
    ws = w.reshape(kp // I8G_SLAB, I8G_SLAB, n)
    sw = jnp.maximum(jnp.abs(ws).max(axis=1), 1e-20) / 127.0  # [Kp/S, N]
    wq = jnp.round(ws / sw[:, None, :]).astype(jnp.int8).reshape(kp, n)
    return wq, sw


@functools.partial(jax.jit, static_argnames=("bits", "k", "group"))
def _i4g_planes_jit(qs, qh, scales, bias, *, bits: int, k: int, group: int):
    """Raw N-major packed planes -> 4-bit-resident device layout:
    (wp u8 [Kp/2, N] nibble-packed, step f32 [Kp/HS, N], wmin [Kp/HS, N]).

    Dequantizes the GGUF block format on device, then REQUANTIZES to 4-bit
    unsigned on a per-(128-row half-slab, column) affine grid:
    w ~ wmin + step * u, u in [0, 15]. Packing: byte row p of a 256-row
    pack slab holds element p (lo nibble) and p + 128 (hi nibble); the two
    nibble planes are the slab's two contiguous K-halves, so each K=128
    MXU dot covers EXACTLY one scale half-slab — per-plane scale
    granularity costs nothing in dot shape and no interleave relayout
    ever happens.

    The grid is fit by min/max followed by two rounds of least-squares
    refinement of (step, wmin) given the rounded assignments (the same
    spirit as the reference's iterative make_qkx2_quants fit,
    ggml-quants.c). The source is ALREADY 4-bit-quantized (16 levels per
    32-group), so the half-slab grid re-fits structured values; the
    round-trip budget is enforced by
    tests/test_qmatmul.py::test_dequant_i4g_requant_accuracy."""
    q = _unpack_quants_N_core(qs, qh, bits=bits, k=k).astype(jnp.float32)
    s = jnp.repeat(scales, group, axis=1, total_repeat_length=k)
    b = jnp.repeat(bias, group, axis=1, total_repeat_length=k)
    w = (s * q - b).T  # [K, N] f32
    w = _pad_plane_rows(w, I4G_SLAB)
    kp, n = w.shape
    hs = I4G_SLAB // 2
    ws = w.reshape(kp // hs, hs, n)
    wmin = ws.min(axis=1)
    step = jnp.maximum(ws.max(axis=1) - wmin, 1e-9) / 15.0
    for _ in range(2):
        u = jnp.clip(jnp.round((ws - wmin[:, None, :]) / step[:, None, :]), 0, 15)
        su = u.sum(axis=1)
        suu = (u * u).sum(axis=1)
        sw = ws.sum(axis=1)
        swu = (ws * u).sum(axis=1)
        det = hs * suu - su * su
        safe = jnp.abs(det) > 1e-9
        step_new = jnp.where(safe, (hs * swu - su * sw) / jnp.where(safe, det, 1.0), step)
        step = jnp.maximum(jnp.abs(step_new), 1e-9)
        wmin = (sw - step * su) / hs
    u = jnp.clip(jnp.round((ws - wmin[:, None, :]) / step[:, None, :]), 0, 15)
    u = u.astype(jnp.uint8).reshape(kp // I4G_SLAB, I4G_SLAB, n)
    wp = (u[:, : I4G_SLAB // 2, :] | (u[:, I4G_SLAB // 2 :, :] << 4))
    return wp.reshape(kp // 2, n), step, wmin


@jax.jit
def _k4_planes_jit(qs, scales, bias):
    """Raw 4-bit N-major planes -> k4 device layout.

    qs [N, K/2] bytes: byte row p of the transpose holds element
    (p//128)*256 + p%128 in its low nibble and that +128 in its high
    nibble (quant.pack split-pack layout). Scale/bias [N, K/32] split into
    per-plane tensors in plane-row order: lo-plane row p uses scale row
    p//32 of s_lo — a pure contiguous expansion, kernel-friendly. The byte
    plane is zero-padded to a multiple of 256 rows (Mosaic sublane tiling;
    zero q rows with zero bias contribute nothing)."""
    n = qs.shape[0]
    qs_t = _pad_plane_rows(qs.T, 256)  # [K/2 pad, N]
    def split(a):
        a_t = a.T.reshape(-1, 8, n)  # [K/256, 8, N]; rows 0-3 lo, 4-7 hi
        lo = _pad_plane_rows(a_t[:, :4].reshape(-1, n), 8)
        hi = _pad_plane_rows(a_t[:, 4:].reshape(-1, n), 8)
        return lo, hi
    s_lo, s_hi = split(scales)
    b_lo, b_hi = split(bias)
    return qs_t, s_lo, s_hi, b_lo, b_hi


def concat_qt(qts: list[QuantTensor]) -> QuantTensor | None:
    """Concatenate QuantTensors along their OUTPUT (N) dim — one fused
    HBM tensor for projections that share an input (wq+wk+wv, gate+up),
    so the decode step issues ONE kernel call with a larger N tile
    instead of several small ones (per-call overhead and small-N DMA
    inefficiency are a measurable slice of the 7B sequential step).

    Requires identical (qtype, layout, K); all supported layouts keep N
    as the LAST plane axis, so this is a lane-axis concat of every
    plane. Returns None when the tensors can't fuse (mixed ftypes —
    e.g. Q4_K_M quantizes w_v at Q6_K — or mixed layouts)."""
    first = qts[0]
    if any(
        q.qtype != first.qtype or q.layout != first.layout
        or q.shape[1] != first.shape[1] for q in qts[1:]
    ):
        return None
    if first.layout == "n_major":
        return None  # row-major planes concat on axis 0; not a matmul layout

    def cat(attr):
        planes = [getattr(q, attr) for q in qts]
        if any(p is None for p in planes):
            return None
        return jnp.concatenate(planes, axis=1)

    return QuantTensor(
        qs=cat("qs"), qh=cat("qh"), scales=cat("scales"), bias=cat("bias"),
        qtype=first.qtype, shape=(sum(q.shape[0] for q in qts), first.shape[1]),
        layout=first.layout, scales2=cat("scales2"), bias2=cat("bias2"),
    )


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


def _i8_kernel(group: int):
    """Scales expand via the MXU 0/1 matmul (sublane broadcast+reshape is a
    Mosaic relayout — measured ~50 ms/tensor at 7B ffn shapes); the
    per-group bias term sum_k x_k*b_k = dot(xg, b) is computed OUTSIDE the
    kernel by XLA (its [M, K/G] lane blocking doesn't fit Mosaic tiling,
    and it reads the same bias-plane bytes either way)."""

    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        slab, tn = w_ref.shape
        s = _expand_groups_mxu(s_ref[...], group, slab)
        w = (s * w_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
        o_ref[...] = acc_ref[...]

    return kernel


def _k4_kernel():
    """4-bit planar kernel: one packed byte tile feeds TWO MXU dots (lo and
    hi nibble planes) — the dot's K-sum is order-free, so the planes never
    need to be interleaved back to natural K order (the relayout that made
    bit-packed kernels 30x off roofline on v5e). HBM traffic stays at the
    packed 0.5 B/param + 0.25 B/param of f32 scale/bias planes. The
    group->row expansion matrix E arrives as a constant input (resident in
    VMEM across grid steps; per-step iota+compare was ~2 us/step of VPU)."""

    def kernel(xl_ref, xh_ref, e_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        wi = w_ref[...].astype(jnp.int32)  # u8->f32 casts unsupported in Mosaic
        e = e_ref[...]
        sl = jax.lax.dot(e, sl_ref[...], preferred_element_type=jnp.float32)
        sh = jax.lax.dot(e, sh_ref[...], preferred_element_type=jnp.float32)
        wl = (sl * (wi & 15).astype(jnp.float32)).astype(jnp.bfloat16)
        wh = (sh * (wi >> 4).astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(xl_ref[...], wl, preferred_element_type=jnp.float32)
        acc += jnp.dot(xh_ref[...], wh, preferred_element_type=jnp.float32)
        acc_ref[...] += acc
        o_ref[...] = acc_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("block_n", "ku_cap", "interpret"))
def _qmm_k4_pallas(x: jax.Array, qt: QuantTensor, block_n: int = 256,
                   ku_cap: int = 4, interpret: bool = False):
    """y = x @ W^T for the k4 layout (see _k4_kernel).

    Host-free prep per call: split x into plane order (xl/xh) and compute
    f32 per-group sums (xg) for the bias fold — all O(M*K) jnp ops."""
    n, k = qt.shape
    r2 = qt.qs.shape[0]  # padded byte-plane rows (>= k // 2)
    m = x.shape[0]
    m_pad = max(16, -(-m // 16) * 16)
    xp = _pad_rows(x.astype(jnp.float32), m_pad)

    x4 = xp.reshape(m_pad, k // 256, 2, 128)
    xl = x4[:, :, 0, :].reshape(m_pad, k // 2)
    xh = x4[:, :, 1, :].reshape(m_pad, k // 2)
    xg = xp.reshape(m_pad, k // 32, 32).sum(-1)
    xg4 = xg.reshape(m_pad, k // 256, 8)
    xgl = xg4[:, :, :4].reshape(m_pad, k // 64)
    xgh = xg4[:, :, 4:].reshape(m_pad, k // 64)

    def padc(a, cols):
        return a if a.shape[1] == cols else jnp.pad(a, ((0, 0), (0, cols - a.shape[1])))

    xl = padc(xl, r2).astype(jnp.bfloat16)
    xh = padc(xh, r2).astype(jnp.bfloat16)

    srows = r2 // 32  # scale rows per plane (multiple of 8 by construction)
    ku = 8 * _largest_divisor(srows // 8, ku_cap)  # slab2 = ku*32
    slab2 = ku * 32
    grid = (n // block_n, r2 // slab2)

    # group->row expansion: E[p, g] = (p//32 == g), computed once on device
    row = jax.lax.broadcasted_iota(jnp.int32, (slab2, ku), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (slab2, ku), 1)
    e = (row // 32 == grp).astype(jnp.float32)

    xspec = pl.BlockSpec((m_pad, slab2), lambda i, j: (0, j))
    espec = pl.BlockSpec((slab2, ku), lambda i, j: (0, 0))
    wspec = pl.BlockSpec((slab2, block_n), lambda i, j: (j, i))
    sspec = pl.BlockSpec((ku, block_n), lambda i, j: (j, i))

    out = pl.pallas_call(
        _k4_kernel(),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid=grid,
        in_specs=[xspec, xspec, espec, wspec, sspec, sspec],
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
    )(xl, xh, e, qt.qs, qt.scales, qt.scales2)
    # bias term: sum_k x_k*b_k = xg @ B, a tiny XLA dot per plane (the
    # Mosaic lane tiling can't block [M, K/G] by ku, and HBM traffic is
    # identical either way)
    bias = jnp.dot(xgl, qt.bias[: k // 64], preferred_element_type=jnp.float32)
    bias += jnp.dot(xgh, qt.bias2[: k // 64], preferred_element_type=jnp.float32)
    return out[:m] - bias[:m]


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _i4g_kernel(slabs_per_step: int):
    """4-bit-resident MXU kernel (VERDICT r2 item 4): per 256-row slab,
    bitcast the packed (128, TN) u8 tile to i32 lanes, extract both nibble
    planes with two full-width masks (3 i32 VPU ops per 8 weights — the
    only per-weight VPU work in the kernel), bitcast back to int8 and feed
    two s8xs8->s32 MXU dots; the slab's affine (step, min) applies to the
    [M, TN] OUTPUT. The affine min term sum_g wmin[g,n]*xsum[m,g] is one
    tiny XLA matmul outside. Measured 604 GB/s (74% of v5e HBM roofline)
    at (4096, 11008) — 1.87x the i8g step at ~half the streamed bytes."""

    def kernel(xq_ref, w_ref, se_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc = acc_ref[...]
        for s in range(slabs_per_step):
            pr = s * (I4G_SLAB // 2)
            xa = s * I4G_SLAB
            sr = (j * slabs_per_step + s) * 2  # per-plane scale rows
            v = pltpu.bitcast(w_ref[pl.ds(pr, I4G_SLAB // 2), :], jnp.int32)
            lo = pltpu.bitcast(v & 0x0F0F0F0F, jnp.int8)
            hi = pltpu.bitcast((v >> 4) & 0x0F0F0F0F, jnp.int8)
            p_lo = jax.lax.dot(xq_ref[:, pl.ds(xa, I4G_SLAB // 2)], lo,
                               preferred_element_type=jnp.int32)
            p_hi = jax.lax.dot(xq_ref[:, pl.ds(xa + I4G_SLAB // 2, I4G_SLAB // 2)], hi,
                               preferred_element_type=jnp.int32)
            acc += p_lo.astype(jnp.float32) * se_ref[pl.ds(sr, 1), :]
            acc += p_hi.astype(jnp.float32) * se_ref[pl.ds(sr + 1, 1), :]
        acc_ref[...] = acc
        o_ref[...] = acc

    return kernel


def _i4g_unpack_interpret(w_ref_vals):
    """Interpreter-mode stand-in for the lane bitcast (pltpu.bitcast width
    changes are hardware-only): plain nibble split on the u8 tile."""
    v = w_ref_vals.astype(jnp.int32)
    return (v & 15).astype(jnp.int8), (v >> 4).astype(jnp.int8)


def _i4g_kernel_interpret(slabs_per_step: int):
    def kernel(xq_ref, w_ref, se_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc = acc_ref[...]
        for s in range(slabs_per_step):
            pr = s * (I4G_SLAB // 2)
            xa = s * I4G_SLAB
            sr = (j * slabs_per_step + s) * 2
            lo, hi = _i4g_unpack_interpret(w_ref[pl.ds(pr, I4G_SLAB // 2), :])
            p_lo = jax.lax.dot(xq_ref[:, pl.ds(xa, I4G_SLAB // 2)].astype(jnp.int32),
                               lo.astype(jnp.int32),
                               preferred_element_type=jnp.int32)
            p_hi = jax.lax.dot(xq_ref[:, pl.ds(xa + I4G_SLAB // 2, I4G_SLAB // 2)].astype(jnp.int32),
                               hi.astype(jnp.int32),
                               preferred_element_type=jnp.int32)
            acc += p_lo.astype(jnp.float32) * se_ref[pl.ds(sr, 1), :]
            acc += p_hi.astype(jnp.float32) * se_ref[pl.ds(sr + 1, 1), :]
        acc_ref[...] = acc
        o_ref[...] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _qmm_i4g_pallas(x: jax.Array, qt: QuantTensor, block_n: int = 256,
                    interpret: bool = False):
    """y = x @ W^T for the i4g layout.

    Per call (jnp, O(M*K)): quantize activations to int8 on a per-slab
    absmax grid; premultiply se = step*sx and smin = wmin*sx; compute the
    per-slab int activation sums for the affine min term. The whole K range
    is processed in ONE grid step along j when the packed block fits VMEM
    (measured: large K-blocks are what close the roofline gap — 54 -> 40 us
    at (4096, 11008))."""
    n, k = qt.shape
    kp = qt.qs.shape[0] * 2
    hs = I4G_SLAB // 2
    nhalf = kp // hs
    m = x.shape[0]
    m_pad = max(32, -(-m // 32) * 32)  # int8 min sublane tile
    xp = _pad_rows(x.astype(jnp.float32), m_pad)
    if kp != k:
        xp = jnp.pad(xp, ((0, 0), (0, kp - k)))
    # activations quantized per 128-row half-slab (matches the per-plane
    # weight scale granularity)
    xs = xp.reshape(m_pad, nhalf, hs)
    sx = jnp.maximum(jnp.abs(xs).max(axis=(0, 2)), 1e-20) / 127.0  # [nhalf]
    xq = jnp.round(xs / sx[None, :, None]).astype(jnp.int8).reshape(m_pad, kp)
    se = qt.scales * sx[:, None]  # [nhalf, N]
    smin = qt.bias * sx[:, None]
    xsum = xq.reshape(m_pad, nhalf, hs).sum(axis=2, dtype=jnp.int32).astype(jnp.float32)

    # one j step when the packed block fits the VMEM budget; else the
    # largest 256-multiple divisor under it
    if (kp // 2) * block_n <= 4 * 1024 * 1024:
        bk = kp
    else:
        bk = I4G_SLAB
        for d in range(min(16384, kp), 0, -I4G_SLAB):
            if kp % d == 0:
                bk = d
                break
    grid = (n // block_n, kp // bk)

    kern = (_i4g_kernel_interpret if interpret else _i4g_kernel)(bk // I4G_SLAB)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, bk), lambda i, j: (0, j)),
            pl.BlockSpec((bk // 2, block_n), lambda i, j: (j, i)),
            pl.BlockSpec((nhalf, block_n), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, block_n), lambda i, j: (0, i)),
        scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * kp,
            bytes_accessed=qt.nbytes() + m_pad * kp + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, qt.qs, se)
    out = out + jnp.dot(xsum, smin, preferred_element_type=jnp.float32)
    return out[:m]


def _i8g_kernel(slabs_per_step: int):
    """MXU int8 x int8 -> int32 dots (one per 512-row scale slab, statically
    unrolled); scaling applied to the per-slab OUTPUT (m_pad x tn elements)
    with the premultiplied sw_eff = sx*sw row — the only design whose VPU
    work does not scale with weight count."""

    def kernel(xq_ref, w_ref, se_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc = acc_ref[...]
        for s in range(slabs_per_step):
            lo = s * I8G_SLAB
            p = jax.lax.dot(
                xq_ref[:, lo : lo + I8G_SLAB],
                w_ref[lo : lo + I8G_SLAB, :],
                preferred_element_type=jnp.int32,
            )
            se = se_ref[pl.ds(j * slabs_per_step + s, 1), :]
            acc += p.astype(jnp.float32) * se
        acc_ref[...] = acc
        o_ref[...] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def _qmm_i8g_pallas(x: jax.Array, qt: QuantTensor, block_n: int = 512,
                    block_k: int = 2048, interpret: bool = False):
    """y = x @ W^T for the i8g layout.

    Per call (jnp, O(M*K)): quantize activations to int8 on a per-slab
    absmax grid (sx [Kp/S]), premultiply sw_eff = sx*sw. The kernel then
    runs pure int8 MXU dots with f32 accumulation of scaled step outputs
    (counterpart of the reference's q8 activation path,
    ggml-quants.c ggml_vec_dot_q4_K_q8_K — re-derived for the MXU)."""
    n, k = qt.shape
    kp = qt.qs.shape[0]
    nslab = kp // I8G_SLAB
    m = x.shape[0]
    m_pad = max(32, -(-m // 32) * 32)  # int8 min sublane tile
    xp = _pad_rows(x.astype(jnp.float32), m_pad)
    if kp != k:
        xp = jnp.pad(xp, ((0, 0), (0, kp - k)))
    xs = xp.reshape(m_pad, nslab, I8G_SLAB)
    sx = jnp.maximum(jnp.abs(xs).max(axis=(0, 2)), 1e-20) / 127.0  # [nslab]
    xq = jnp.round(xs / sx[None, :, None]).astype(jnp.int8).reshape(m_pad, kp)
    sw_eff = qt.scales * sx[:, None]  # [nslab, N]

    bk = max(I8G_SLAB, min(block_k, kp))
    while kp % bk:
        bk -= I8G_SLAB
    grid = (n // block_n, kp // bk)

    out = pl.pallas_call(
        _i8g_kernel(bk // I8G_SLAB),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, bk), lambda i, j: (0, j)),
            pl.BlockSpec((bk, block_n), lambda i, j: (j, i)),
            pl.BlockSpec((nslab, block_n), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, block_n), lambda i, j: (0, i)),
        scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=qt.nbytes() + m_pad * k + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, qt.qs, sw_eff)
    return out[:m]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _qmm_i8_pallas(x: jax.Array, qt: QuantTensor, block_n: int = 256, interpret: bool = False):
    """i8-planar fused dequant x matmul: W^T int8 [K, N] + scale/bias
    [K/G, N]; per grid step a (ku*G, block_n) slab is cast, scaled, and fed
    to the MXU in bf16 (counterpart of the reference's q-weight dot
    kernels, ggml-quants.c ggml_vec_dot_*; re-designed around Mosaic's
    strengths — casts and broadcasts, no sublane bit surgery)."""
    n, k = qt.shape
    group = qt.group
    ngroups = k // group
    m = x.shape[0]
    m_pad = max(16, -(-m // 16) * 16)
    xp = _pad_rows(x.astype(jnp.bfloat16), m_pad)

    # Mosaic requires the scales block's sublane dim (ku) be a multiple of
    # 8 or the full array; pick the largest 8-multiple divisor of ngroups
    # under the VMEM cap, falling back to the whole-K slab for small K
    cap = max(1, 2048 // group)
    if ngroups % 8 == 0 and cap >= 8:
        ku = 8 * _largest_divisor(ngroups // 8, cap // 8)
    else:
        ku = ngroups
    slab = ku * group
    grid = (n // block_n, ngroups // ku)
    has_bias = qt.qtype != GGMLQuantType.Q8_0

    in_specs = [
        pl.BlockSpec((m_pad, slab), lambda i, j: (0, j)),
        pl.BlockSpec((slab, block_n), lambda i, j: (j, i)),
        pl.BlockSpec((ku, block_n), lambda i, j: (j, i)),
    ]
    args = [xp, qt.qs, qt.scales]

    out = pl.pallas_call(
        _i8_kernel(group),
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
    if has_bias:
        xg = _pad_rows(x.astype(jnp.float32), m_pad).reshape(
            m_pad, ngroups, group
        ).sum(-1)
        out = out - jnp.dot(xg, qt.bias, preferred_element_type=jnp.float32)
    return out[:m]


def _pallas_supported(qt: QuantTensor) -> bool:
    n, k = qt.shape
    if qt.layout == "i4g":
        return n % 128 == 0
    if qt.layout == "i8g":
        return n % 128 == 0
    if qt.layout == "k4":
        return n % 128 == 0  # K constraints guaranteed at load
    if qt.layout == "i8":
        return k % qt.group == 0 and n % 128 == 0
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
        if qt.layout == "i4g":
            # measured (v5e): 512-wide N tiles win for wide outputs
            # (12288: 530 -> 683 GB/s) but lose on deep-K narrow shapes
            # (11008x4096: 674 -> 567); gate on output width
            n = qt.shape[0]
            if n % 512 == 0 and n >= 8192:
                block_n = 512
            else:
                block_n = 256 if n % 256 == 0 else 128
            return _qmm_i4g_pallas(x, qt, block_n=block_n, interpret=interpret)
        if qt.layout == "i8g":
            block_n = 512 if qt.shape[0] % 512 == 0 else (
                256 if qt.shape[0] % 256 == 0 else 128)
            return _qmm_i8g_pallas(x, qt, block_n=block_n, interpret=interpret)
        block_n = 256 if qt.shape[0] % 256 == 0 else 128
        if qt.layout == "k4":
            return _qmm_k4_pallas(x, qt, block_n=block_n, interpret=interpret)
        if qt.layout == "i8":
            return _qmm_i8_pallas(x, qt, block_n=block_n, interpret=interpret)
        return _qmm_pallas(x, qt, block_n=block_n, interpret=interpret)
    w_t = dequant_T(qt, jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w_t, preferred_element_type=jnp.float32)
