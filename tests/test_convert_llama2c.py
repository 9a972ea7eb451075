"""llama2.c checkpoint conversion: a synthetic .bin round-trips to a GGUF
whose logits match a directly-written GGUF of the same weights, with vocab
from both a GGUF donor and a tokenizer.bin (ref:
examples/convert-llama2c-to-ggml)."""

import struct

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.convert_llama2c import convert, read_llama2c

DIM, HID, L, H, KV, V, SEQ = 64, 128, 2, 4, 2, 256, 64


def _write_llama2c(path, w, *, shared=True):
    head = DIM // H
    with open(path, "wb") as f:
        f.write(struct.pack("<7i", DIM, HID, L, H, KV, V if shared else -V, SEQ))

        def put(a):
            f.write(np.ascontiguousarray(a, "<f4").tobytes())

        put(w["tok_embd"])
        put(np.stack([w[f"layers.{i}.attn_norm"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.wq"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.wk"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.wv"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.wo"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.ffn_norm"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.w_gate"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.w_down"] for i in range(L)]))
        put(np.stack([w[f"layers.{i}.w_up"] for i in range(L)]))
        put(w["output_norm"])
        put(np.zeros((SEQ, head // 2), np.float32))  # legacy freq_cis
        put(np.zeros((SEQ, head // 2), np.float32))
        if not shared:
            put(w["output"])


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(9)
    return testmodel.random_llama_weights(
        rng, n_layers=L, n_embd=DIM, n_heads=H, n_kv_heads=KV, n_ff=HID, n_vocab=V
    )


def _logits(gguf_path, prompt=(3, 9, 27)):
    params, cfg = load_model(gguf_path)
    ctx = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    return ctx.decode(b)[-1]


def test_convert_matches_direct_gguf(weights, tmp_path):
    w = dict(weights)
    bin_path = tmp_path / "m.bin"
    _write_llama2c(bin_path, w, shared=False)

    hp, rw = read_llama2c(bin_path)
    assert hp["dim"] == DIM and hp["n_kv_heads"] == KV
    np.testing.assert_array_equal(rw["layers.1.wk"], w["layers.1.wk"])

    out = tmp_path / "m.gguf"
    convert(bin_path, "", out)
    direct = tmp_path / "d.gguf"
    testmodel.write_llama_gguf(direct, w, n_layers=L, n_embd=DIM, n_heads=H,
                               n_kv_heads=KV, n_ff=HID, n_vocab=V, n_ctx=SEQ)
    np.testing.assert_allclose(_logits(out), _logits(direct), rtol=1e-6, atol=1e-6)


def test_convert_shared_classifier(weights, tmp_path):
    w = dict(weights)
    bin_path = tmp_path / "s.bin"
    _write_llama2c(bin_path, w, shared=True)
    out = tmp_path / "s.gguf"
    convert(bin_path, "", out)
    params, _ = load_model(out)
    from pipeinfer_tpu.ops.qmatmul import QuantTensor, dequant

    def dense(x):
        return np.asarray(dequant(x, jnp.float32) if isinstance(x, QuantTensor) else x)

    np.testing.assert_allclose(dense(params["output"]), w["tok_embd"], atol=1e-6)


def test_convert_with_tokenizer_bin(weights, tmp_path):
    # tokenizer.bin with V entries
    tok_path = tmp_path / "tokenizer.bin"
    with open(tok_path, "wb") as f:
        f.write(struct.pack("<i", 8))
        for i in range(V):
            text = f"t{i}".encode() if i > 2 else b"x"
            f.write(struct.pack("<f", -float(i)))
            f.write(struct.pack("<i", len(text)))
            f.write(text)
    bin_path = tmp_path / "m.bin"
    _write_llama2c(bin_path, dict(weights), shared=True)
    out = tmp_path / "mv.gguf"
    convert(bin_path, str(tok_path), out)

    from pipeinfer_tpu.gguf.reader import GGUFReader

    with GGUFReader(out) as r:
        toks = list(r.metadata["tokenizer.ggml.tokens"])
        assert toks[0] == "<unk>" and toks[1] == "<s>" and toks[2] == "</s>"
        assert toks[5] == "t5"
        assert len(toks) == V
        assert r.metadata["tokenizer.ggml.model"] == "llama"


def test_convert_with_gguf_vocab(weights, tmp_path):
    bin_path = tmp_path / "m.bin"
    _write_llama2c(bin_path, dict(weights), shared=True)
    out = tmp_path / "gv.gguf"
    convert(bin_path, "/root/reference/models/ggml-vocab-llama.gguf", out)
    from pipeinfer_tpu.gguf.reader import GGUFReader
    from pipeinfer_tpu.tokenizer import tokenizer_from_gguf

    with GGUFReader(out) as r:
        tok = tokenizer_from_gguf(r)
    assert tok.encode("hello", add_bos=False), "vocab did not carry over"
