"""Quant codec tests.

Mirrors the reference test strategy (ref: tests/test-quantize-fns.cpp):
round-trip RMS error thresholds per format, plus — stronger than the
reference — bit-exact parity of our decoder against the compiled reference
kernels on reference-produced payloads, and reference-decode parity of our
encoder's output.
"""

import numpy as np
import pytest

from pipeinfer_tpu.gguf.constants import GGMLQuantType, QUANT_BLOCK_INFO
from pipeinfer_tpu.quant import formats

from . import oracle

# (qtype, max total quantization error) using the reference's metric
# array_rmse = sqrt(sum((x-y)^2)) / n at test_size = 32*128
# (ref: test-quantize-fns.cpp:16-20 thresholds, :33-40 metric).
FORMATS = [
    (GGMLQuantType.Q4_0, 0.002),
    (GGMLQuantType.Q4_1, 0.002),
    (GGMLQuantType.Q5_0, 0.002),
    (GGMLQuantType.Q5_1, 0.002),
    (GGMLQuantType.Q8_0, 0.002),
    (GGMLQuantType.Q2_K, 0.0075),
    (GGMLQuantType.Q3_K, 0.0040),
    (GGMLQuantType.Q4_K, 0.002),
    (GGMLQuantType.Q5_K, 0.002),
    (GGMLQuantType.Q6_K, 0.002),
    (GGMLQuantType.Q8_K, 0.002),
]

_NAME = {q: q.name.lower() if not q.name.endswith("_K") else q.name[0].lower() + q.name[1:] for q, _ in FORMATS}


def _synthetic(n: int) -> np.ndarray:
    # same flavor of synthetic data as the reference generator
    # (test-quantize-fns.cpp generate_data): offset cosines, scale ~1
    i = np.arange(n, dtype=np.float32)
    return 0.1 + 2.0 * np.cos(i + 0.3)


@pytest.mark.parametrize("qtype,tol", FORMATS)
def test_round_trip_error(qtype, tol):
    n = 32 * 128  # reference test_size
    x = _synthetic(n)
    raw = formats.quantize(x, qtype)
    y = formats.dequantize(raw, qtype)
    assert y.shape == x.shape
    err = np.sqrt(np.sum((x - y) ** 2)) / n  # reference array_rmse
    assert err < tol, f"{qtype.name}: total quantization error {err}"


@pytest.mark.parametrize("qtype,_tol", FORMATS)
def test_decode_parity_with_reference(qtype, _tol, rng):
    """Our decoder must reproduce the reference decoder bit-for-bit on
    payloads produced by the reference encoder."""
    if oracle.get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    name = _NAME[qtype]
    be, bb = QUANT_BLOCK_INFO[qtype]
    n = be * 64
    x = (rng.standard_normal(n) * 2.0).astype(np.float32)
    raw = oracle.ref_quantize(name, x, bb, be)
    ours = formats.dequantize(raw, qtype)
    ref = oracle.ref_dequantize(name, raw, n)
    np.testing.assert_array_equal(ours, ref, err_msg=f"{qtype.name} decode mismatch")


@pytest.mark.parametrize("qtype,_tol", FORMATS)
def test_encode_is_reference_decodable(qtype, _tol, rng):
    """Payloads from our encoder must decode identically through the
    reference decoder and ours (validates our bit packing end-to-end)."""
    if oracle.get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    name = _NAME[qtype]
    be, _bb = QUANT_BLOCK_INFO[qtype]
    n = be * 64
    x = (rng.standard_normal(n) * 2.0).astype(np.float32)
    raw = formats.quantize(x, qtype)
    ref_view = oracle.ref_dequantize(name, raw, n)
    ours_view = formats.dequantize(raw, qtype)
    np.testing.assert_array_equal(ours_view, ref_view, err_msg=f"{qtype.name} encode packing mismatch")


@pytest.mark.parametrize(
    "qtype",
    [GGMLQuantType.Q4_0, GGMLQuantType.Q8_0, GGMLQuantType.Q5_0],
)
def test_encode_parity_simple_formats(qtype, rng):
    """For the simple 32-block formats our encoder follows the reference
    algorithm exactly, so payloads should match byte-for-byte."""
    if oracle.get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    name = _NAME[qtype]
    be, bb = QUANT_BLOCK_INFO[qtype]
    n = be * 128
    x = (rng.standard_normal(n) * 1.5).astype(np.float32)
    ours = formats.quantize(x, qtype)
    ref = oracle.ref_quantize(name, x, bb, be)
    np.testing.assert_array_equal(ours, ref, err_msg=f"{qtype.name} encode mismatch")


def test_zero_block():
    for qtype, _ in FORMATS:
        be, _ = QUANT_BLOCK_INFO[qtype]
        x = np.zeros(be * 2, dtype=np.float32)
        y = formats.dequantize(formats.quantize(x, qtype), qtype)
        np.testing.assert_allclose(y, 0.0, atol=1e-6)
