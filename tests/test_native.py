"""Native C++ repacker must be bit-identical with the numpy reference."""

import numpy as np
import pytest

from pipeinfer_tpu import native
from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.quant import formats, pack


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


@pytest.mark.parametrize("qtype", sorted(native.NATIVE_QTYPES, key=int))
def test_native_repack_bit_exact(qtype, rng):
    n, k = 32, 1024
    x = (rng.standard_normal((n, k)) * 1.5).astype(np.float32)
    raw = formats.quantize(x.reshape(-1), qtype)
    ref = pack.pack(raw, qtype, (n, k), backend="numpy")
    nat = pack.pack(raw, qtype, (n, k), backend="auto")
    np.testing.assert_array_equal(nat.qs, ref.qs, err_msg=f"{qtype.name} qs")
    if ref.qh is not None:
        np.testing.assert_array_equal(nat.qh, ref.qh, err_msg=f"{qtype.name} qh")
    np.testing.assert_array_equal(nat.scales, ref.scales, err_msg=f"{qtype.name} scales")
    np.testing.assert_array_equal(nat.bias, ref.bias, err_msg=f"{qtype.name} bias")


def test_native_transpose(rng):
    a = rng.integers(0, 255, (333, 517), dtype=np.uint8)
    out = native.transpose_u8(a)
    np.testing.assert_array_equal(out, a.T)


def test_native_load_speed(rng):
    """Native repack should beat numpy on a model-sized tensor."""
    import time

    n, k = 2048, 4096
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = formats.quantize(x.reshape(-1), GGMLQuantType.Q4_K)
    t0 = time.perf_counter()
    pack.pack(raw, GGMLQuantType.Q4_K, (n, k), backend="numpy")
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    pack.pack(raw, GGMLQuantType.Q4_K, (n, k), backend="auto")
    t_nat = time.perf_counter() - t0
    assert t_nat < t_np * 1.5, f"native {t_nat:.3f}s vs numpy {t_np:.3f}s"
