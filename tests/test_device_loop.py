"""Device-resident speculative loop (spec/device_loop.py): R speculative
rounds per dispatch with on-device verification — golden-equivalent to
plain greedy decoding, correct across dispatch boundaries, EOS/limit
handling, and reproducible seeded stochastic output."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.device_loop import DeviceLoopEngine, supported
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0)
PROMPT = [3, 17, 42]


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("dloop")
    pt = d / "t.gguf"
    pd = d / "d.gguf"
    testmodel.build_tiny_llama(pt, seed=5, n_layers=2, n_embd=128, n_heads=4,
                               n_kv_heads=2, n_ff=256, n_vocab=512)
    testmodel.build_tiny_llama(pd, seed=9, n_layers=1, n_embd=64, n_heads=2,
                               n_kv_heads=2, n_ff=128, n_vocab=512)
    return load_model(pt), load_model(pd)


def _ctx(m, n_cells=512):
    params, cfg = m
    return InferenceContext(params, cfg, n_cells=n_cells, cache_dtype=jnp.float32)


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


def test_supported_gate():
    assert supported(GREEDY)
    assert supported(SamplingParams(temp=0.8, top_k=40, penalty_repeat=1.0,
                                    penalty_last_n=0))
    assert not supported(SamplingParams(temp=0.0))  # default penalties on
    assert not supported(SamplingParams(temp=0.8, top_k=0, penalty_repeat=1.0,
                                        penalty_last_n=0))  # unbounded top_k
    assert not supported(GREEDY, grammar=object())


@pytest.mark.parametrize("depth,rounds", [(4, 4), (8, 2), (3, 5)])
def test_greedy_token_exact_perfect_draft(models, depth, rounds):
    tgt, _ = models
    N = 40
    ref = _plain_greedy(tgt, PROMPT, N)
    eng = DeviceLoopEngine(_ctx(tgt), _ctx(tgt), GREEDY,
                           SpecParams(n_draft=depth), eos_id=-1, rounds=rounds)
    got = eng.generate(list(PROMPT), N, ignore_eos=True)
    assert got == ref
    assert eng.stats.n_accept > 0


def test_greedy_token_exact_divergent_draft(models):
    """Low-acceptance pair: the on-device verify must still commit exactly
    the plain-greedy stream (each round re-drafts from the TRUE frontier)."""
    tgt, dft = models
    N = 40
    ref = _plain_greedy(tgt, PROMPT, N)
    eng = DeviceLoopEngine(_ctx(tgt), _ctx(dft), GREEDY,
                           SpecParams(n_draft=6), eos_id=-1, rounds=4)
    got = eng.generate(list(PROMPT), N, ignore_eos=True)
    assert got == ref
    assert eng.stats.accept_rate < 0.9  # draft actually diverges


def test_eos_stop(models):
    tgt, _ = models
    ref = _plain_greedy(tgt, PROMPT, 40)
    eos = ref[7]  # force a stop at this token's FIRST occurrence
    first = ref.index(eos)
    eng = DeviceLoopEngine(_ctx(tgt), _ctx(tgt), GREEDY,
                           SpecParams(n_draft=4), eos_id=eos, rounds=4)
    got = eng.generate(list(PROMPT), 40)
    assert got == ref[: len(got)]
    assert got[-1] == eos
    assert len(got) == first + 1


def test_multi_generation_cell_reuse(models):
    """Back-to-back generations on the same engine contexts: host-mirror
    reconciliation must free every dead cell (no leak, no double-booking)."""
    tgt, dft = models
    tctx, dctx = _ctx(tgt, n_cells=512), _ctx(dft, n_cells=512)
    ref = _plain_greedy(tgt, PROMPT, 24)
    for trial in range(3):
        eng = DeviceLoopEngine(tctx, dctx, GREEDY, SpecParams(n_draft=4),
                               eos_id=-1, rounds=3)
        got = eng.generate(list(PROMPT), 24, ignore_eos=True)
        assert got == ref, f"trial {trial} diverged"
        tctx.clear_cache()
        dctx.clear_cache()


def test_stochastic_reproducible_and_top1_greedy(models):
    tgt, dft = models
    STOCH = SamplingParams(temp=0.8, top_k=40, penalty_repeat=1.0,
                           penalty_last_n=0, seed=7)

    def run():
        eng = DeviceLoopEngine(_ctx(tgt), _ctx(dft), STOCH,
                               SpecParams(n_draft=4), eos_id=-1, rounds=3)
        return eng.generate(list(PROMPT), 16, ignore_eos=True)

    a, b = run(), run()
    assert a == b, f"seeded stochastic loop diverges: {a} vs {b}"
    assert len(a) == 16

    # top_k=1 collapses the chain to argmax == plain greedy
    ONE = SamplingParams(temp=0.7, top_k=1, penalty_repeat=1.0,
                         penalty_last_n=0, seed=3)
    eng = DeviceLoopEngine(_ctx(tgt), _ctx(dft), ONE,
                           SpecParams(n_draft=4), eos_id=-1, rounds=3)
    got = eng.generate(list(PROMPT), 16, ignore_eos=True)
    assert got == _plain_greedy(tgt, PROMPT, 16)
