"""Training utilities: loss decreases when overfitting a tiny corpus, the
trained GGUF round-trips through the inference runtime, and the training
forward agrees with the inference forward."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.models.train import forward_train, lm_loss
from pipeinfer_tpu.runtime import kv_cache as kv
from pipeinfer_tpu.models import llama as mllama
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.finetune import dense_params, save_gguf, train

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=120)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("tr") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=2, **CFG)
    params, cfg = load_model(path)
    return dense_params(params), cfg


def test_train_forward_matches_inference(model):
    params, cfg = model
    toks = [3, 17, 42, 7, 99]
    want, _ = mllama.forward(
        params, cfg,
        kv.create(cfg.n_layers, 16, cfg.n_kv_heads, cfg.head_dim, jnp.float32),
        jnp.asarray(toks, jnp.int32), jnp.arange(5, dtype=jnp.int32),
        jnp.zeros(5, jnp.int32), jnp.arange(5, dtype=jnp.int32), jnp.ones(5, bool),
    )
    got = forward_train(params, cfg, jnp.asarray([toks], jnp.int32))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-3, atol=3e-3)


def test_overfit_decreases_loss(model, tmp_path):
    params, cfg = model
    rng = np.random.default_rng(0)
    stream = np.asarray(rng.integers(2, CFG["n_vocab"], 400), np.int32)
    l0 = float(lm_loss(params, cfg, jnp.asarray(stream[None, :65])))
    trained, losses = train(
        params, cfg, stream, seq_len=64, batch=2, steps=30, lr=3e-3,
        log=lambda s: None,
    )
    assert losses[-1] < l0 * 0.9, (l0, losses[-1])

    # trained model round-trips through GGUF + inference runtime
    out = tmp_path / "trained.gguf"
    save_gguf(trained, cfg, out)
    p2, c2 = load_model(out)
    logits, _ = mllama.forward(
        p2, c2,
        kv.create(c2.n_layers, 16, c2.n_kv_heads, c2.head_dim, jnp.float32),
        jnp.asarray(stream[:4], jnp.int32), jnp.arange(4, dtype=jnp.int32),
        jnp.zeros(4, jnp.int32), jnp.arange(4, dtype=jnp.int32), jnp.ones(4, bool),
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_checkpoint_resume_bitexact(model, tmp_path):
    """Train N steps straight vs train k, checkpoint (model GGUF +
    optimizer .opt.npz), reload, resume — identical loss trajectory
    (ref: common/train.cpp checkpoint round trip)."""
    import numpy as np

    from pipeinfer_tpu.models import load_model
    from pipeinfer_tpu.tools.finetune import load_opt_state, save_opt_state  # noqa: F401

    params, cfg = model
    stream = np.random.default_rng(0).integers(3, 150, 600).astype(np.int32)

    p1 = dense_params(params)
    _, losses_full = train(p1, cfg, stream, seq_len=32, batch=2, steps=6, lr=1e-3,
                           log=lambda s: None)

    ckpt = tmp_path / "ck.gguf"
    p2 = dense_params(params)
    p2, losses_a = train(p2, cfg, stream, seq_len=32, batch=2, steps=3, lr=1e-3,
                         ckpt_every=3, ckpt_path=str(ckpt), log=lambda s: None)
    assert ckpt.exists() and (tmp_path / "ck.gguf.opt.npz").exists()

    rp, rcfg = load_model(ckpt)
    rp = dense_params(rp)
    _, losses_b = train(rp, rcfg, stream, seq_len=32, batch=2, steps=6, lr=1e-3,
                        resume_opt=str(ckpt) + ".opt.npz", log=lambda s: None)
    resumed = losses_a + losses_b
    np.testing.assert_allclose(resumed, losses_full, rtol=2e-4, atol=2e-5)
