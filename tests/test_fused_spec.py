"""Fused one-dispatch speculative runs (spec/fused.py).

Golden-equivalence with plain greedy decoding, with both a perfect draft
(the target itself — high acceptance, long chains) and a DIVERGENT draft
(different random weights — low acceptance, exercising deferred chain
resolution, cancellation, and pipeline reseeding)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.controller import PipeInferController
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("fused")
    pt = d / "t.gguf"
    pd = d / "d.gguf"
    testmodel.build_tiny_llama(pt, seed=5, n_layers=2, n_embd=128, n_heads=4,
                               n_kv_heads=2, n_ff=256, n_vocab=512)
    testmodel.build_tiny_llama(pd, seed=9, n_layers=1, n_embd=64, n_heads=2,
                               n_kv_heads=2, n_ff=128, n_vocab=512)
    return load_model(pt), load_model(pd)


def _ctx(m):
    params, cfg = m
    return InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)


def _plain_greedy(m, prompt, n):
    ctx = _ctx(m)
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    n_past = len(prompt)
    for _ in range(n):
        tok = int(np.argmax(logits))
        out.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1
    return out


PROMPT = [3, 17, 42]
N = 40


def test_fused_controller_selected(models):
    tgt, dft = models
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY,
                            SpecParams(n_draft=6, n_parallel=1, device_verify=False), eos_id=-1)
    assert c.use_fused

    # penalties force the host drafting path
    c2 = PipeInferController(_ctx(tgt), _ctx(dft), SamplingParams(temp=0.0),
                             SpecParams(n_draft=6, n_parallel=1, device_verify=False), eos_id=-1)
    assert not c2.use_fused


def test_fused_token_exact_perfect_draft(models):
    tgt, _ = models
    ref = _plain_greedy(tgt, PROMPT, N)
    sp = SpecParams(n_draft=6, n_parallel=1, p_accept=0.0, p_split=0.9, max_inflight=3, device_verify=False)
    c = PipeInferController(_ctx(tgt), _ctx(tgt), GREEDY, sp, eos_id=-1)
    assert c.use_fused
    got = c.generate(list(PROMPT), N)
    assert got == ref
    assert c.stats.n_accept > 0


def test_fused_token_exact_divergent_draft(models):
    """A draft with different weights mispredicts constantly: fused runs
    get canceled, deferred chain decisions resolve as divergent, and the
    reseed path must keep making progress — output stays token-exact."""
    tgt, dft = models
    ref = _plain_greedy(tgt, PROMPT, N)
    sp = SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, p_split=0.9, max_inflight=3, device_verify=False)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    assert c.use_fused
    got = c.generate(list(PROMPT), N)
    assert got == ref
    assert c.metrics.n_canceled_runs > 0 or c.stats.accept_rate < 0.9


STOCH = SamplingParams(temp=0.8, penalty_repeat=1.0, penalty_last_n=0, seed=42)


def test_fused_stochastic_selected_and_reproducible(models):
    """temp>0 keeps the fused one-dispatch path (device Gumbel drafting);
    seeded generations are bit-reproducible across fresh engines."""
    tm, dm = models

    def run():
        c = PipeInferController(
            _ctx(tm), _ctx(dm), STOCH,
            SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3, device_verify=False),
            eos_id=-1,
        )
        assert c.use_fused
        return c.generate([3, 17, 42], 12)

    a, b = run(), run()
    assert a == b, f"seeded stochastic fused runs diverge: {a} vs {b}"
    assert len(a) == 12


def test_fused_stochastic_top1_matches_greedy(models):
    """top_k=1 collapses the stochastic chain to argmax: the fused
    stochastic program's output must equal plain greedy decoding exactly
    (end-to-end correctness of the temp>0 path)."""
    tm, dm = models
    want = _plain_greedy(tm, [3, 17, 42], 12)
    c = PipeInferController(
        _ctx(tm), _ctx(dm),
        SamplingParams(temp=0.7, top_k=1, penalty_repeat=1.0, penalty_last_n=0, seed=1),
        SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3, device_verify=False),
        eos_id=-1,
    )
    assert c.use_fused
    got = c.generate([3, 17, 42], 12)
    assert got == want, f"{got} vs {want}"


# -- acceptance-adaptive depth (SpecParams.ladder / pick_depth) -------------


def test_depth_ladder_and_pick():
    sp = SpecParams(n_draft=8)
    assert sp.ladder() == (2, 4, 8)
    sp32 = SpecParams(n_draft=32)
    assert sp32.ladder() == (4, 8, 16, 32)
    # fixed depth when adaptation is off
    assert SpecParams(n_draft=8, adapt_depth=False).ladder() == (8,)
    # perfect acceptance -> full depth; low acceptance -> shallow rung;
    # monotone non-decreasing in the acceptance estimate
    assert sp.pick_depth(1.0) == 8
    assert sp.pick_depth(0.1) == 2
    prev = 0
    for a in np.linspace(0.05, 0.999, 40):
        d = sp.pick_depth(float(a))
        assert d >= prev, f"pick_depth not monotone at a={a}: {d} < {prev}"
        prev = d


def test_adaptive_depth_token_exact_across_transitions(models):
    """A divergent draft drives the acceptance EMA down mid-generation, so
    the controller crosses depth rungs; output must stay token-exact and
    multiple rungs must actually be used."""
    tgt, dft = models
    ref = _plain_greedy(tgt, PROMPT, N)
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0, max_inflight=3, device_verify=False)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    assert c.use_fused
    got = c.generate(list(PROMPT), N)
    assert got == ref
    assert len(c.depth_counts) >= 2, (
        f"divergent draft should cross depth rungs, used {c.depth_counts}"
    )
    assert c.accept_ema < 0.9  # EMA actually moved off the optimistic start


def test_adaptive_depth_perfect_draft_stays_deep(models):
    """A perfect draft keeps the EMA at ~1.0: every fused run uses the full
    configured depth (adaptation must not tax the best case)."""
    tgt, _ = models
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0, max_inflight=3, device_verify=False)
    c = PipeInferController(_ctx(tgt), _ctx(tgt), GREEDY, sp, eos_id=-1)
    got = c.generate(list(PROMPT), N)
    assert got == _plain_greedy(tgt, PROMPT, N)
    assert set(c.depth_counts) == {8}, c.depth_counts
