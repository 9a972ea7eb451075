"""Golden-token equivalence: speculative decoding must produce exactly the
tokens of plain decoding under deterministic sampling, regardless of
draft-model quality (what the reference validates only by benchmark runs —
SURVEY.md §4 notes this gap)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.spec.sync_spec import SyncSpeculator
from pipeinfer_tpu.tools import testmodel

CFG = dict(n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2, n_ff=256, n_vocab=160)
PROMPT = [3, 17, 42, 7]
N_PREDICT = 24


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    path = tmp_path_factory.mktemp("spec") / "tgt.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    return load_model(path)


def _plain_greedy(params, cfg, n_predict=N_PREDICT):
    ctx = InferenceContext(params, cfg, n_cells=128, cache_dtype=jnp.float32)
    sampler = SamplerState(params=SamplingParams(temp=0.0))
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    n_past = len(PROMPT)
    for _ in range(n_predict):
        tok = sample(sampler, logits)
        sampler.accept(tok)
        out.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1
    return out


def _sync_spec(target_model, draft_model, sp=None):
    tparams, tcfg = target_model
    dparams, dcfg = draft_model
    ctx_t = InferenceContext(tparams, tcfg, n_cells=128, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(dparams, dcfg, n_cells=128, cache_dtype=jnp.float32)
    # random tiny models have flat distributions; p_accept=0 keeps drafting on
    spec = SyncSpeculator(
        ctx_t, ctx_d, SamplingParams(temp=0.0),
        sp or SpecParams(n_draft=5, n_parallel=3, p_accept=0.0),
        eos_id=-1,
    )
    out = spec.generate(list(PROMPT), N_PREDICT)
    return out, spec.stats


def test_self_draft_equivalence_and_acceptance(target):
    """Draft == target: tokens identical to plain decode, near-total
    acceptance (the upper-bound sanity check)."""
    want = _plain_greedy(*target)
    got, stats = _sync_spec(target, target)
    assert got == want, f"spec tokens diverge: {got} vs {want}"
    assert stats.n_drafted > 0
    # with a perfect draft every generated token is either an accepted draft
    # or a round's bonus token (the first comes from prefill)
    assert stats.n_predict <= stats.n_accept + stats.n_rounds + 2, stats
    assert stats.accept_rate > 0.6, f"self-draft acceptance {stats.accept_rate}"


def test_bad_draft_still_exact(target, tmp_path):
    """A garbage draft must not change the output, only the speed."""
    path = tmp_path / "bad_draft.gguf"
    testmodel.build_tiny_llama(path, seed=999, **CFG)
    bad = load_model(path)
    want = _plain_greedy(*target)
    got, stats = _sync_spec(target, bad)
    assert got == want, f"spec tokens diverge with bad draft: {got} vs {want}"
    assert stats.accept_rate < 0.9


def test_narrow_tree(target):
    want = _plain_greedy(*target)
    got, _ = _sync_spec(target, target, SpecParams(n_draft=3, n_parallel=1, p_accept=0.0))
    assert got == want


def test_deep_tree_with_splits(target):
    want = _plain_greedy(*target)
    got, stats = _sync_spec(
        target, target, SpecParams(n_draft=8, n_parallel=4, p_accept=0.0, p_split=0.1)
    )
    assert got == want
