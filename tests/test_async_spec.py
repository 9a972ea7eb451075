"""Async PipeInfer controller: golden-token equivalence with plain decoding
plus state-machine invariants (offsets recycled, cancellation consistency)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.controller import PipeInferController
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

from .test_sync_spec import CFG, PROMPT, N_PREDICT, _plain_greedy


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    path = tmp_path_factory.mktemp("aspec") / "tgt.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    return load_model(path)


def _run_controller(target_model, draft_model, sp, sampling=None):
    tparams, tcfg = target_model
    dparams, dcfg = draft_model
    ctx_t = InferenceContext(tparams, tcfg, n_cells=256, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(dparams, dcfg, n_cells=256, cache_dtype=jnp.float32)
    c = PipeInferController(ctx_t, ctx_d, sampling or SamplingParams(temp=0.0), sp, eos_id=-1)
    out = c.generate(list(PROMPT), N_PREDICT)
    # state-machine invariants after a run
    assert not c.runs
    assert len(c.free_offsets) == sp.max_inflight, "leaked sequence offsets"
    return out, c


def test_async_self_draft_equivalence(target):
    want = _plain_greedy(*target)
    got, c = _run_controller(
        target, target, SpecParams(n_draft=4, n_parallel=2, p_accept=0.0, max_inflight=3)
    )
    assert got == want, f"async spec diverges: {got} vs {want}"
    assert c.stats.n_drafted > 0
    assert c.stats.n_accept > 0


def test_async_bad_draft_exact(target, tmp_path):
    path = tmp_path / "bad.gguf"
    testmodel.build_tiny_llama(path, seed=1234, **CFG)
    bad = load_model(path)
    want = _plain_greedy(*target)
    got, c = _run_controller(
        target, bad, SpecParams(n_draft=4, n_parallel=2, p_accept=0.0, max_inflight=3)
    )
    assert got == want, f"async spec with bad draft diverges: {got} vs {want}"


def test_async_single_inflight(target):
    want = _plain_greedy(*target)
    got, _ = _run_controller(
        target, target, SpecParams(n_draft=3, n_parallel=1, p_accept=0.0, max_inflight=1)
    )
    assert got == want


def test_async_deep_inflight_with_splits(target):
    want = _plain_greedy(*target)
    got, c = _run_controller(
        target,
        target,
        SpecParams(n_draft=6, n_parallel=3, p_accept=0.0, p_split=0.05, max_inflight=4),
    )
    assert got == want
    # with several runs in flight, at least some should be chained
    assert c.metrics.n_runs > c.stats.n_rounds - 2


def test_async_throttle_disables_speculation(target):
    """p_accept >= 1 means pure non-spec decoding through the async path."""
    want = _plain_greedy(*target)
    got, c = _run_controller(
        target, target, SpecParams(n_draft=4, n_parallel=2, p_accept=1.0, max_inflight=2)
    )
    assert got == want
    assert c.stats.n_drafted == 0


def test_async_stochastic_sampling_exact(target):
    """Under temp>0 with a fixed seed, the async engine must produce the
    SAME stream as plain decoding: every position is sampled exactly once
    from the target chain in order, so the RNG consumption sequence is
    identical. (Stronger than the reference, which re-samples already
    decided positions during verification.)"""
    import jax.numpy as jnp
    from pipeinfer_tpu.runtime.context import Batch
    from pipeinfer_tpu.sampling.samplers import SamplerState, sample

    params, cfg = target
    sp_params = SamplingParams(temp=0.9, top_k=20, seed=1234)

    # plain sampled decode
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    st = SamplerState(params=sp_params)
    b = Batch()
    for i, t in enumerate(PROMPT):
        st.accept(t, apply_grammar=False)
        b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
    logits = ctx.decode(b)[-1]
    want = []
    pos = len(PROMPT)
    for _ in range(N_PREDICT):
        tok = sample(st, logits)
        st.accept(tok)
        want.append(tok)
        b.clear()
        b.add(tok, pos, 0)
        logits = ctx.decode(b)[0]
        pos += 1

    got, c = _run_controller(
        target, target, SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3),
        sampling=sp_params,
    )
    assert got == want, f"stochastic spec diverges: {got} vs {want}"
