"""PackedWeight planar repack must be value-exact with the block decoder."""

import numpy as np
import pytest

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.quant import formats, pack

FORMATS = list(pack.FORMAT_INFO)


@pytest.mark.parametrize("qtype", FORMATS)
def test_pack_roundtrip_exact(qtype, rng):
    n, k = 8, 512
    x = (rng.standard_normal((n, k)) * 1.7).astype(np.float32)
    raw = formats.quantize(x.reshape(-1), qtype)
    golden = formats.dequantize(raw, qtype).reshape(n, k)
    pw = pack.pack(raw, qtype, (n, k))
    decoded = pack.unpack_to_float(pw)
    np.testing.assert_array_equal(decoded, golden, err_msg=f"{qtype.name} pack mismatch")


@pytest.mark.parametrize("qtype", FORMATS)
def test_pack_small_k(qtype, rng):
    """K smaller than PACK_GROUP (tiny test models)."""
    be = 256 if qtype.name.endswith("_K") else 32
    n, k = 4, be
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = formats.quantize(x.reshape(-1), qtype)
    golden = formats.dequantize(raw, qtype).reshape(n, k)
    pw = pack.pack(raw, qtype, (n, k))
    np.testing.assert_array_equal(pack.unpack_to_float(pw), golden)


def test_compression_ratio():
    """Packed planes must stay close to the source bit-width (the whole
    point of packing: HBM traffic)."""
    x = np.random.default_rng(0).standard_normal((64, 4096)).astype(np.float32)
    pw = pack.pack_array(x, GGMLQuantType.Q4_K)
    bits_per_weight = pw.nbytes() * 8 / x.size
    assert bits_per_weight < 6.6  # 4 bits + f32 scale/bias per 32
