"""Fused pp×tp×dp pipeline on the virtual 8-device CPU mesh: the sharded
step must reproduce single-device logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.models import llama as mllama
from pipeinfer_tpu.parallel import pipefused as pf
from pipeinfer_tpu.runtime import kv_cache as kv
from pipeinfer_tpu.tools import testmodel

CFG = dict(n_layers=4, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=96)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pf") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=5, **CFG)
    return load_model(path)


def _reference_logits(params, cfg, tokens):
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    t = len(tokens)
    logits, _ = mllama.forward(
        params,
        cfg,
        cache,
        jnp.asarray(tokens, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.zeros(t, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.ones(t, bool),
    )
    return np.asarray(logits)


@pytest.mark.parametrize("pp,tp,dp", [(2, 2, 2), (4, 2, 1), (2, 1, 1), (1, 2, 1)])
def test_fused_pipeline_matches_single_device(model, pp, tp, dp):
    if pp * tp * dp > len(jax.devices()):
        pytest.skip("not enough devices")
    params, cfg = model
    pc = pf.PipeConfig(n_stages=pp, tp=tp, dp=dp)
    mesh = pf.make_mesh(pc)
    stacked = pf.stack_params(params, cfg, pc, mesh)
    cache = pf.init_cache(cfg, pc, mesh, batch=dp, max_len=16)
    step = pf.build_step(cfg, pc, mesh)

    tokens = [3, 9, 21, 40]
    t = len(tokens)
    tok_arr = jnp.tile(jnp.asarray(tokens, jnp.int32)[None, :], (dp, 1))
    logits, cache = step(stacked, cache, tok_arr, jnp.arange(t, dtype=jnp.int32), 0)
    got = np.asarray(logits)

    want = _reference_logits(params, cfg, tokens)
    for b in range(dp):
        err = np.abs(got[b] - want).max() / (np.abs(want).max() + 1e-6)
        assert err < 0.03, f"pp={pp} tp={tp} dp={dp} stream {b}: err {err}"

    # decode one more token through the pipeline
    logits2, cache = step(
        stacked, cache, jnp.full((dp, 1), 7, jnp.int32), jnp.asarray([t], jnp.int32), t
    )
    cache_ref = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    l1, cache_ref = mllama.forward(
        params, cfg, cache_ref,
        jnp.asarray(tokens, jnp.int32), jnp.arange(t, dtype=jnp.int32),
        jnp.zeros(t, jnp.int32), jnp.arange(t, dtype=jnp.int32), jnp.ones(t, bool),
    )
    l2, _ = mllama.forward(
        params, cfg, cache_ref,
        jnp.asarray([7], jnp.int32), jnp.asarray([t], jnp.int32),
        jnp.zeros(1, jnp.int32), jnp.asarray([t], jnp.int32), jnp.ones(1, bool),
    )
    want2 = np.asarray(l2)
    err2 = np.abs(np.asarray(logits2)[0] - want2).max() / (np.abs(want2).max() + 1e-6)
    assert err2 < 0.03, f"decode step err {err2}"
