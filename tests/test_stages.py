"""Host-driven pipeline stages: multi-device decode must equal single-device,
and the full async PipeInfer controller must run over staged targets
unchanged (CPU 8-device mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.parallel.stages import StagedInferenceContext, split_ranges
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.controller import PipeInferController
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

from .test_sync_spec import CFG, PROMPT, N_PREDICT, _plain_greedy


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("stg") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    return load_model(path)


def test_split_ranges():
    assert split_ranges(8, [0.5, 0.5]) == [(0, 4), (4, 8)]
    assert split_ranges(8, [0.25, 0.75]) == [(0, 2), (2, 8)]
    # weighted splits like --mpi-layer-split 0.1,0.15x6 (8 nodes -> here 3)
    r = split_ranges(10, [0.2, 0.4, 0.4])
    assert [hi - lo for lo, hi in r] == [2, 4, 4]


@pytest.fixture(scope="module")
def model4(tmp_path_factory):
    path = tmp_path_factory.mktemp("stg4") / "m4.gguf"
    cfg4 = dict(CFG, n_layers=4)
    testmodel.build_tiny_llama(path, seed=7, **cfg4)
    return load_model(path)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_staged_decode_matches_single(model4, n_stages):
    params, cfg = model4
    devs = jax.devices()[:n_stages]
    if len(devs) < n_stages:
        pytest.skip("not enough devices")

    single = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=64, devices=devs, cache_dtype=jnp.float32
    )
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=True)
    want = single.decode(b)
    b2 = Batch()
    for i, t in enumerate(PROMPT):
        b2.add(t, i, 0, want_logits=True)
    got = stagedc.decode(b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # decode step + seq ops across stages
    b3 = Batch()
    b3.add(42, len(PROMPT), 0)
    got2 = stagedc.decode(b3)
    b4 = Batch()
    b4.add(42, len(PROMPT), 0)
    want2 = single.decode(b4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4)


def test_pipeinfer_over_staged_pipeline(model):
    """The async controller drives a 2-stage target + single-device draft —
    the full PipeInfer topology — and must stay token-exact."""
    params, cfg = model
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    want = _plain_greedy(params, cfg)

    tgt = StagedInferenceContext(
        params, cfg, n_cells=256, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    dft = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    c = PipeInferController(
        tgt, dft, SamplingParams(temp=0.0),
        SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3), eos_id=-1,
    )
    got = c.generate(list(PROMPT), N_PREDICT)
    assert got == want, f"staged pipeline diverges: {got} vs {want}"
    assert c.stats.n_accept > 0


def test_weighted_split(model):
    params, cfg = model
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=32, devices=jax.devices()[:2], split=[0.25, 0.75],
        cache_dtype=jnp.float32,
    )
    assert stagedc.ranges == [(0, 1), (1, 2)] or stagedc.ranges[0][1] >= 1
    b = Batch()
    b.add(3, 0, 0)
    out = stagedc.decode(b)
    assert np.isfinite(np.asarray(out)).all()
