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
