"""LoRA: adapter training (loss decreases), GGUF round-trip, load-time
apply, and export-lora merge parity (runtime-applied == merged-file logits)
(ref: examples/finetune LoRA checkpoints + examples/export-lora +
common.cpp --lora load-time apply)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.finetune import dense_params
from pipeinfer_tpu.tools.lora import (
    apply_lora,
    init_lora,
    load_adapter,
    merge_lora,
    save_adapter,
    train_lora,
)

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("lora") / "m.gguf"
    testmodel.build_tiny_llama(
        path, seed=5, vocab_from="/root/reference/models/ggml-vocab-llama.gguf", **CFG
    )
    return path


def _logits(params, cfg, prompt=(1, 5, 9)):
    ctx = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    return ctx.decode(b)[-1]


def test_lora_training_reduces_loss(model):
    params, cfg = load_model(model)
    corpus = np.array(([4, 9, 2, 7, 1] * 40), np.int32)
    lora, losses = train_lora(
        dense_params(params), cfg, corpus,
        rank=4, alpha=8.0, seq_len=16, batch=2, steps=30, lr=5e-3,
        log=lambda s: None,
    )
    assert losses[-1] < losses[0] * 0.9, f"loss did not drop: {losses[0]} -> {losses[-1]}"


def test_adapter_roundtrip_and_apply(model, tmp_path):
    params, cfg = load_model(model)
    dense = dense_params(params)
    lora = init_lora(dense, 4, ("wq", "wo"), seed=1)
    # nonzero B so the delta is visible
    import jax.numpy as jnp2

    for entry in lora:
        for slot in entry:
            a, b = entry[slot]
            entry[slot] = (a, jnp2.ones_like(b) * 0.01)
    path = tmp_path / "adapter.gguf"
    save_adapter(path, lora, rank=4, alpha=8.0)

    alpha, rank, pairs = load_adapter(path)
    assert alpha == 8.0 and rank == 4
    assert set(pairs) == {(i, s) for i in range(cfg.n_layers) for s in ("wq", "wo")}
    np.testing.assert_allclose(pairs[(0, "wq")][0], np.asarray(lora[0]["wq"][0]))

    base_logits = _logits(params, cfg)
    merged = apply_lora(params, path)
    lora_logits = _logits(merged, cfg)
    assert not np.allclose(base_logits, lora_logits), "adapter had no effect"

    # scale 0 must be a no-op
    zero = apply_lora(params, path, scale=0.0)
    np.testing.assert_allclose(_logits(zero, cfg), base_logits, atol=1e-5)

    # runtime merge == offline train-time merge
    scale = alpha / rank
    train_merged = merge_lora(dense, lora, scale)
    np.testing.assert_allclose(
        _logits(train_merged, cfg), lora_logits, rtol=1e-4, atol=1e-4
    )


def test_export_lora_merge_parity(model, tmp_path):
    """export-lora output file decodes to the same logits as load-time
    --lora application, and non-adapted tensors stay byte-identical."""
    from pipeinfer_tpu.gguf.reader import GGUFReader
    from pipeinfer_tpu.tools.export_lora import merge_file

    params, cfg = load_model(model)
    dense = dense_params(params)
    lora = init_lora(dense, 4, ("wq",), seed=2)
    import jax.numpy as jnp2

    for entry in lora:
        for slot in entry:
            a, b = entry[slot]
            entry[slot] = (a, jnp2.ones_like(b) * 0.02)
    apath = tmp_path / "adapter.gguf"
    save_adapter(apath, lora, rank=4, alpha=8.0)

    out = tmp_path / "merged.gguf"
    n = merge_file(str(model), str(out), [(str(apath), 1.0)])
    assert n == cfg.n_layers

    want = _logits(apply_lora(params, apath), cfg)
    mparams, mcfg = load_model(out)
    got = _logits(mparams, mcfg)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    with GGUFReader(str(model)) as rb, GGUFReader(str(out)) as rm:
        assert bytes(rb.tensor_bytes("blk.0.ffn_up.weight")) == bytes(
            rm.tensor_bytes("blk.0.ffn_up.weight")
        ), "non-adapted tensor changed"
        # tokenizer metadata survived the merge
        assert rm.metadata.get("tokenizer.ggml.model") == rb.metadata.get(
            "tokenizer.ggml.model"
        )


def test_export_lora_shape_mismatch_rejected(model, tmp_path):
    from pipeinfer_tpu.tools.export_lora import merge_file
    from pipeinfer_tpu.tools.lora import save_adapter as _save

    bad = [{"wq": (jnp.zeros((4, 32)), jnp.zeros((32, 4)))}]  # wrong K/N
    apath = tmp_path / "bad.gguf"
    _save(apath, bad, rank=4, alpha=8.0)
    with pytest.raises(SystemExit):
        merge_file(str(model), str(tmp_path / "o.gguf"), [(str(apath), 1.0)])
