"""Fused dequant-matmul tests: jnp dequant bit-parity, fallback matmul
accuracy, and the Pallas kernel in interpreter mode vs the golden path.
(Real-TPU execution of the same kernel is exercised by bench.py.)"""

import numpy as np
import pytest

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.quant import formats, pack
import importlib

qmm = importlib.import_module("pipeinfer_tpu.ops.qmatmul")

FORMATS = list(pack.FORMAT_INFO)


@pytest.mark.parametrize("qtype", FORMATS)
def test_dequant_jnp_bit_parity(qtype, rng):
    n, k = 8, 512
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = formats.quantize(x.reshape(-1), qtype)
    golden = formats.dequantize(raw, qtype).reshape(n, k)
    qt = qmm.to_device(pack.pack(raw, qtype, (n, k)))
    got = np.asarray(qmm.dequant(qt))
    np.testing.assert_array_equal(got, golden, err_msg=f"{qtype.name} jnp dequant mismatch")


def test_dequant_rows(rng):
    n, k = 32, 256
    x = rng.standard_normal((n, k)).astype(np.float32)
    qt = qmm.to_device(pack.pack_array(x, GGMLQuantType.Q4_K), layout="n_major")
    import jax.numpy as jnp

    ids = jnp.array([[3, 7], [0, 31]])
    out = np.asarray(qmm.dequant_rows(qt, ids))
    full = np.asarray(qmm.dequant(qt))
    np.testing.assert_array_equal(out[0, 0], full[3])
    np.testing.assert_array_equal(out[1, 1], full[31])
    assert out.shape == (2, 2, k)


@pytest.mark.parametrize("qtype", FORMATS)
def test_qmatmul_fallback(qtype, rng):
    n, k, m = 128, 512, 4
    w = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    qt = qmm.to_device(pack.pack_array(w, qtype))
    wd = np.asarray(qmm.dequant(qt))
    want = x @ wd.T
    got = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=False))
    # bf16 in/weight rounding over K=512; normalize by output magnitude
    # (the reference's MAX_DOT_PRODUCT_ERROR-style metric)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.02, f"{qtype.name}: normalized matmul err {rel}"


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q6_K, GGMLQuantType.Q8_0])
def test_qmatmul_pallas_interpret(qtype, rng):
    """Pallas kernel in interpreter mode vs golden. Covers the 4-bit,
    6-bit(+qh) and int8 unpack paths; the remaining formats share those
    code paths and are covered on real TPU by tools/check_tpu_kernels."""
    n, k, m = 128, 512, 3
    w = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    qt = qmm.to_device(pack.pack_array(w, qtype))
    want = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=False))
    got = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=True, interpret=True))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.02, f"{qtype.name}: kernel vs golden normalized err {rel}"


@pytest.mark.parametrize("qtype", sorted(pack.FORMAT_INFO, key=lambda q: q.name))
def test_dequant_i8_layout_bit_parity(qtype, rng):
    """The i8-planar layout dequantizes bit-for-bit like the packed planes
    (same s*q-b math on identical integer quants and f32 scales)."""
    n, k = 8, 512
    x = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    pw = pack.pack_array(x, qtype)
    want = pack.unpack_to_float(pw)
    qt = qmm.to_device(pw, layout="i8")
    got = np.asarray(qmm.dequant(qt))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_0, GGMLQuantType.Q4_1, GGMLQuantType.Q4_K])
def test_dequant_k4_layout_bit_parity(qtype, rng):
    """The k4 plane-split layout dequantizes bit-for-bit like the packed
    planes (same s*q-b math, plane rows mapped back to natural K order)."""
    n, k = 8, 512
    x = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    pw = pack.pack_array(x, qtype)
    want = pack.unpack_to_float(pw)
    qt = qmm.to_device(pw, layout="k4")
    assert qt.layout == "k4" and qt.scales2 is not None
    got = np.asarray(qmm.dequant(qt))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q6_K, GGMLQuantType.Q8_0])
def test_dequant_i8g_requant_accuracy(qtype, rng):
    """i8g REQUANTIZES to int8 on a per-(512, col) absmax grid; the round
    trip must stay within ~1% of the exact dequant (8-bit resolution over
    a 512 slab ~ 4-bit over 32 groups)."""
    n, k = 8, 1024
    x = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    pw = pack.pack_array(x, qtype)
    want = pack.unpack_to_float(pw)
    qt = qmm.to_device(pw, layout="i8g")
    assert qt.layout == "i8g"
    got = np.asarray(qmm.dequant(qt))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.015


@pytest.mark.parametrize("k", [512, 1024, 1536, 2816])  # 2816: pads to 3072
@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q8_0])
def test_qmatmul_i8g_pallas_interpret(qtype, k, rng):
    """The int8xint8 MXU kernel vs the float golden path (requant +
    activation-quant error budget ~2%)."""
    n, m = 256, 5
    w = (rng.standard_normal((n, k)) * 0.3).astype(np.float32)
    pw = pack.pack_array(w, qtype)
    qt = qmm.to_device(pw, layout="i8g")
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    want = x.astype(np.float32) @ pack.unpack_to_float(pw).T
    got = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=True, interpret=True))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2, "i8g kernel mismatch"


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_0, GGMLQuantType.Q4_1])
def test_dequant_i4g_requant_accuracy(qtype, rng):
    """i4g REQUANTIZES already-4-bit-quantized weights onto a per-(128, col)
    affine LS-refit grid. Unlike i8g this is a lossy speed layout (4-bit
    resolution per half-slab vs the source's per-32-group scales); the
    budget pins the noise floor: <=10% added rms relative to the weight
    std and <=8% max (vs ~11% rms the 4-bit source quant itself carries
    against f32 — the layout roughly sqrt(2)s the quant noise in exchange
    for ~half the HBM bytes/step; i8g remains selectable for max
    fidelity)."""
    n, k = 8, 1024
    x = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    pw = pack.pack_array(x, qtype)
    want = pack.unpack_to_float(pw)
    qt = qmm.to_device(pw, layout="i4g")
    assert qt.layout == "i4g"
    assert qt.qs.dtype == np.uint8 and qt.qs.shape == (k // 2, n)  # packed HBM bytes
    got = np.asarray(qmm.dequant(qt))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.08
    assert np.sqrt(((got - want) ** 2).mean()) / want.std() < 0.10


def test_i4g_falls_back_to_i8g_for_non4bit(rng):
    pw = pack.pack_array((rng.standard_normal((8, 512)) * 0.5).astype(np.float32),
                         GGMLQuantType.Q6_K)
    qt = qmm.to_device(pw, layout="i4g")
    assert qt.layout == "i8g"


@pytest.mark.parametrize("k", [512, 1024, 2816])
@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_0])
def test_qmatmul_i4g_pallas_interpret(qtype, k, rng):
    """The 4-bit-resident MXU kernel vs the i4g dequant golden (isolates
    KERNEL correctness — activation int8 quant + f32 accumulation — from
    the requant noise, which test_dequant_i4g_requant_accuracy budgets
    separately; the interpreter build substitutes a plain nibble split for
    the hardware lane bitcast — same values)."""
    n, m = 256, 5
    w = (rng.standard_normal((n, k)) * 0.3).astype(np.float32)
    pw = pack.pack_array(w, qtype)
    qt = qmm.to_device(pw, layout="i4g")
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    want = x.astype(np.float32) @ np.asarray(qmm.dequant_T(qt))
    got = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=True, interpret=True))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2, "i4g kernel mismatch"


def test_k4_falls_back_to_i8_for_non4bit(rng):
    pw = pack.pack_array((rng.standard_normal((8, 512)) * 0.5).astype(np.float32),
                         GGMLQuantType.Q6_K)
    qt = qmm.to_device(pw, layout="k4")
    assert qt.layout == "i8"


@pytest.mark.parametrize("k", [512, 768, 1024])  # 768: ragged, pad to 256-row plane
@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_0])
def test_qmatmul_k4_pallas_interpret(qtype, k, rng):
    """The k4 plane-split Pallas kernel vs the dequant golden path."""
    n, m = 256, 5
    w = (rng.standard_normal((n, k)) * 0.3).astype(np.float32)
    pw = pack.pack_array(w, qtype)
    qt = qmm.to_device(pw, layout="k4")
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    want = x.astype(np.float32) @ pack.unpack_to_float(pw).T
    got = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=True, interpret=True))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2, "k4 kernel mismatch"


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q8_0, GGMLQuantType.Q6_K])
def test_qmatmul_i8_pallas_interpret(qtype, rng):
    """The i8-planar Pallas kernel vs the dequant golden path."""
    n, k, m = 256, 512, 5
    w = (rng.standard_normal((n, k)) * 0.3).astype(np.float32)
    pw = pack.pack_array(w, qtype)
    qt = qmm.to_device(pw, layout="i8")
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    want = x.astype(np.float32) @ pack.unpack_to_float(pw).T
    got = np.asarray(qmm.qmatmul(x, qt, prefer_pallas=True, interpret=True))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2, "i8 kernel mismatch"


def test_i8_layout_end_to_end_decode(rng, tmp_path):
    """A Q4_K model loaded with PIPEINFER_WEIGHT_LAYOUT=i8 produces the
    same greedy tokens as the packed layout (fallback matmul path)."""
    import os

    import jax.numpy as jnp

    from pipeinfer_tpu.models import load_model
    from pipeinfer_tpu.runtime.context import Batch, InferenceContext
    from pipeinfer_tpu.tools import testmodel

    path = tmp_path / "m.gguf"
    testmodel.build_tiny_llama(
        path, seed=5, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        n_ff=512, n_vocab=160, qtype=GGMLQuantType.Q4_K,
    )

    def greedy(layout):
        os.environ["PIPEINFER_WEIGHT_LAYOUT"] = layout
        try:
            params, cfg = load_model(path)
        finally:
            del os.environ["PIPEINFER_WEIGHT_LAYOUT"]
        ctx = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
        b = Batch()
        for i, t in enumerate([3, 17, 42]):
            b.add(t, i, 0, want_logits=(i == 2))
        logits = ctx.decode(b)[-1]
        out = []
        n_past = 3
        for _ in range(8):
            tok = int(np.argmax(logits))
            out.append(tok)
            b.clear()
            b.add(tok, n_past, 0)
            logits = ctx.decode(b)[0]
            n_past += 1
        return out

    assert greedy("i8") == greedy("k_major")
