"""GGUF reader/writer tests: round-trip via our writer, plus parsing the
reference's checked-in vocab fixture files (ref: models/ggml-vocab-*.gguf,
the fixture pattern from tests/CMakeLists.txt:25-40)."""

from pathlib import Path

import numpy as np
import pytest

from pipeinfer_tpu.gguf import GGMLQuantType, GGUFReader, GGUFWriter, Keys

REF_VOCAB = Path("/root/reference/models/ggml-vocab-llama.gguf")


def test_round_trip(tmp_path, rng):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, "llama")
    w.add_arch_kv(Keys.EMBEDDING_LENGTH, 64)
    w.add_kv("test.float", 1.5)
    w.add_kv("test.string", "hello world")
    w.add_kv("test.bool", True)
    w.add_kv("test.strlist", ["a", "bb", "ccc"])
    w.add_kv("test.i32arr", np.arange(5, dtype=np.int32))
    w.add_kv("test.f32arr", np.linspace(0, 1, 4, dtype=np.float32))
    w.add_kv("test.neg", -7)

    t0 = rng.standard_normal((8, 64)).astype(np.float32)
    t1 = rng.standard_normal((4, 256)).astype(np.float32)
    w.add_tensor("tok_embd.weight", t0)
    w.add_tensor("blk.0.attn_q.weight", t1, qtype=GGMLQuantType.Q4_K)
    w.add_tensor("half", t0.astype(np.float16))
    w.write()

    r = GGUFReader(path)
    assert r.architecture == "llama"
    assert r.field(Keys.EMBEDDING_LENGTH) == 64
    assert r.metadata["test.float"] == pytest.approx(1.5)
    assert r.metadata["test.string"] == "hello world"
    assert r.metadata["test.bool"] is True
    assert r.metadata["test.strlist"] == ["a", "bb", "ccc"]
    np.testing.assert_array_equal(r.metadata["test.i32arr"], np.arange(5))
    assert r.metadata["test.neg"] == -7

    np.testing.assert_array_equal(r.tensor("tok_embd.weight"), t0)
    assert r.tensors["blk.0.attn_q.weight"].qtype == GGMLQuantType.Q4_K
    deq = r.tensor("blk.0.attn_q.weight")
    assert deq.shape == (4, 256)
    assert np.abs(deq - t1).mean() < 0.12  # ~4-bit error on N(0,1) data
    np.testing.assert_array_equal(r.tensor("half"), t0.astype(np.float16).astype(np.float32).reshape(8, 64))
    r.close()


@pytest.mark.skipif(not REF_VOCAB.exists(), reason="reference fixtures unavailable")
def test_read_reference_vocab_fixture():
    r = GGUFReader(REF_VOCAB)
    assert r.architecture == "llama"
    toks = r.metadata[Keys.TOKENIZER_LIST]
    scores = r.metadata[Keys.TOKENIZER_SCORES]
    assert len(toks) == 32000
    assert len(scores) == 32000
    assert toks[1] == "<s>"
    assert toks[2] == "</s>"
    assert r.metadata[Keys.TOKENIZER_MODEL] == "llama"
    r.close()


@pytest.mark.skipif(not REF_VOCAB.exists(), reason="reference fixtures unavailable")
def test_read_all_reference_fixtures():
    for p in sorted(REF_VOCAB.parent.glob("ggml-vocab-*.gguf")):
        r = GGUFReader(p)
        assert len(r.metadata[Keys.TOKENIZER_LIST]) > 1000, p.name
        r.close()
