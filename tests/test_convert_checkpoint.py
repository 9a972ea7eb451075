"""Reference training-checkpoint import (tools/convert_train_checkpoint).

Fixtures are constructed in the reference's own checkpoint-GGUF schema
(ref: examples/train-text-from-scratch/convert-train-checkpoint-to-gguf.py
save_gguf — `training.*`/`optimizer.*` keys, flat f32 Adam moment buffers
in set_param_model registration order; examples/finetune/
convert-finetune-checkpoint-to-gguf.py — `<base>.weight.lora_a/_b` pairs)
and converted into this framework's runnable forms."""

import numpy as np
import pytest

from pipeinfer_tpu.gguf.constants import GGUFValueType
from pipeinfer_tpu.gguf.reader import GGUFReader
from pipeinfer_tpu.gguf.writer import GGUFWriter
from pipeinfer_tpu.tools import convert_train_checkpoint as ctc

CFG = dict(n_layers=2, n_embd=32, n_heads=4, n_kv=4, n_ff=48, n_vocab=64)

# checkpoint tensor names in the reference's flat-moment registration order
_ORDER = ["token_embd.weight", "output_norm.weight", "output.weight"] + [
    f"blk.{li}.{s}"
    for li in range(CFG["n_layers"])
    for s in ctc._LAYER_ORDER
]


def _shape(name):
    e, f, v = CFG["n_embd"], CFG["n_ff"], CFG["n_vocab"]
    if name == "token_embd.weight" or name == "output.weight":
        return (v, e)
    if "norm" in name:
        return (e,)
    s = name.split(".")[-2]
    return {
        "attn_q": (e, e), "attn_k": (e, e), "attn_v": (e, e),
        "attn_output": (e, e),
        "ffn_gate": (f, e), "ffn_down": (e, f), "ffn_up": (f, e),
    }[s]


def _write_train_checkpoint(path, rng):
    w = GGUFWriter(path, "llama")
    w.add_kv("llama.embedding_length", np.uint32(CFG["n_embd"]))
    w.add_kv("llama.block_count", np.uint32(CFG["n_layers"]))
    w.add_kv("llama.attention.head_count", np.uint32(CFG["n_heads"]))
    w.add_kv("llama.feed_forward_length", np.uint32(CFG["n_ff"]))
    w.add_kv("llama.rope.dimension_count",
             np.uint32(CFG["n_embd"] // CFG["n_heads"]))
    w.add_kv("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add_kv("training.file_version", np.uint32(0))
    w.add_kv("training.type", "train_model")
    w.add_kv("training.iteration_count", np.uint32(17))
    w.add_kv("optimizer.type", "adam")
    w.add_kv("optimizer.file_version", np.uint32(0))
    w.add_kv("optimizer.iteration_count", np.uint32(17))

    weights, m1, m2 = {}, {}, {}
    for name in _ORDER:
        sh = _shape(name)
        weights[name] = rng.standard_normal(sh).astype(np.float32) * 0.05
        m1[name] = rng.standard_normal(sh).astype(np.float32) * 0.01
        m2[name] = np.abs(rng.standard_normal(sh)).astype(np.float32) * 1e-4
        w.add_tensor(name, weights[name])
    flat1 = np.concatenate([m1[n].ravel() for n in _ORDER])
    flat2 = np.concatenate([m2[n].ravel() for n in _ORDER])
    w.add_tensor("optimizer.adam.first_moments", flat1)
    w.add_tensor("optimizer.adam.second_moments", flat2)
    w.write()
    return weights, m1, m2


def test_train_model_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    ckpt = tmp_path / "ckpt.gguf"
    out = tmp_path / "model.gguf"
    weights, m1, m2 = _write_train_checkpoint(ckpt, rng)

    ctc.main([str(ckpt), str(out)])

    # converted model loads through the normal runtime path
    from pipeinfer_tpu.models import load_model
    from pipeinfer_tpu.tools.finetune import dense_params, load_opt_state

    params, cfg = load_model(out)
    assert cfg.n_layers == CFG["n_layers"] and cfg.n_ff == CFG["n_ff"]
    dense = dense_params(params)
    np.testing.assert_allclose(
        np.asarray(dense["layers"][1]["w_gate"]),
        weights["blk.1.ffn_gate.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dense["tok_embd"]), weights["token_embd.weight"], rtol=1e-6)

    # the .opt.npz restores into an optax template built exactly the way
    # pipeinfer-finetune --resume builds it
    import optax

    state = optax.adamw(1e-4).init(dense)
    state, step = load_opt_state(str(out) + ".opt.npz", state)
    assert step == 16  # iteration_count 17 -> resume continues at 17
    assert int(state[0].count) == 17
    np.testing.assert_allclose(
        np.asarray(state[0].mu["layers"][0]["wq"]),
        m1["blk.0.attn_q.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state[0].nu["layers"][1]["w_down"]),
        m2["blk.1.ffn_down.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state[0].nu["output"]), m2["output.weight"], rtol=1e-6)


def test_train_model_checkpoint_vocab_graft(tmp_path):
    rng = np.random.default_rng(6)
    ckpt = tmp_path / "ckpt.gguf"
    out = tmp_path / "model.gguf"
    _write_train_checkpoint(ckpt, rng)

    # graft from a real third-party vocab file (the reference's fixture)
    from pathlib import Path

    vocab_src = Path("/root/reference/models/ggml-vocab-llama.gguf")
    if not vocab_src.exists():
        pytest.skip("reference vocab fixture unavailable")
    ctc.main([str(ckpt), str(out), "--vocab-from", str(vocab_src)])

    from pipeinfer_tpu.tokenizer import tokenizer_from_gguf

    with GGUFReader(out) as r:
        tok = tokenizer_from_gguf(r)
    assert tok.encode("ab", add_bos=False)  # tokenizer tables carried over


def test_finetune_lora_checkpoint(tmp_path):
    rng = np.random.default_rng(7)
    ckpt = tmp_path / "lora_ckpt.gguf"
    out = tmp_path / "adapter.gguf"

    rank, e = 4, CFG["n_embd"]
    w = GGUFWriter(ckpt, "llama")
    w.add_kv("training.type", "finetune_lora")
    w.add_kv("training.lora.rank.attn_q", np.uint32(rank))
    pairs = {}
    for li in range(2):
        for slot, (n, k) in (("attn_q", (e, e)), ("ffn_gate", (CFG["n_ff"], e))):
            a = rng.standard_normal((rank, k)).astype(np.float32)
            b = rng.standard_normal((n, rank)).astype(np.float32)
            base = f"blk.{li}.{slot}.weight"
            w.add_tensor(base + ".lora_a", a)
            w.add_tensor(base + ".lora_b", b)
            pairs[base] = (a, b)
    # rank-1 norm factors: the reference finetune always writes these;
    # they must be skipped, not crash
    w.add_tensor("blk.0.attn_norm.weight.lora_a", np.ones((1, 1), np.float32))
    w.add_tensor("blk.0.attn_norm.weight.lora_b", np.ones((e, 1), np.float32))
    w.add_tensor("output_norm.weight.lora_a", np.ones((1, 1), np.float32))
    w.add_tensor("output_norm.weight.lora_b", np.ones((e, 1), np.float32))
    w.write()

    ctc.main([str(ckpt), str(out)])

    from pipeinfer_tpu.tools.lora import load_adapter

    alpha, got_rank, got = load_adapter(str(out))
    assert got_rank == rank and alpha == pytest.approx(float(rank))
    assert set(got) == {(0, "wq"), (0, "w_gate"), (1, "wq"), (1, "w_gate")}
    a, b = got[(1, "w_gate")]
    np.testing.assert_allclose(a, pairs["blk.1.ffn_gate.weight"][0])
    np.testing.assert_allclose(b, pairs["blk.1.ffn_gate.weight"][1])


def test_non_checkpoint_rejected(tmp_path):
    from pipeinfer_tpu.tools import testmodel

    plain = tmp_path / "plain.gguf"
    testmodel.build_tiny_llama(plain, n_layers=1, n_embd=32, n_heads=4,
                               n_kv_heads=4, n_ff=48, n_vocab=64)
    with pytest.raises(SystemExit, match="training.type"):
        ctc.main([str(plain), str(tmp_path / "x.gguf")])


_ = GGUFValueType  # imported for fixture parity with the tool's writer use
