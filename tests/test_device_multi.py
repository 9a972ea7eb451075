"""Batched device-resident speculation (spec/device_multi.py): S streams ×
R rounds per dispatch, all verification on device — per-stream greedy
output must be bit-identical to decoding each request alone, across uneven
lengths, EOS retirement, cell reclamation, and stochastic seeding."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.device_multi import BatchedDeviceLoop
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0)
PROMPTS = [[3, 17, 42], [5, 9], [100, 200, 300, 400]]


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("dmulti")
    pt = d / "t.gguf"
    pd = d / "d.gguf"
    testmodel.build_tiny_llama(pt, seed=5, n_layers=2, n_embd=128, n_heads=4,
                               n_kv_heads=2, n_ff=256, n_vocab=512)
    testmodel.build_tiny_llama(pd, seed=9, n_layers=1, n_embd=64, n_heads=2,
                               n_kv_heads=2, n_ff=128, n_vocab=512)
    return load_model(pt), load_model(pd)


def _ctx(m, n_cells=2048):
    params, cfg = m
    return InferenceContext(params, cfg, n_cells=n_cells, cache_dtype=jnp.float32)


def _plain_greedy(m, prompt, n):
    ctx = _ctx(m, n_cells=512)
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


def test_greedy_per_stream_exact_divergent_draft(models):
    """Every stream's output equals its solo plain-greedy decode even with a
    low-acceptance draft (on-device verify from the true frontier)."""
    tgt, dft = models
    N = 24
    refs = [_plain_greedy(tgt, p, N) for p in PROMPTS]
    eng = BatchedDeviceLoop(_ctx(tgt), _ctx(dft), GREEDY,
                            SpecParams(n_draft=4), n_streams=3,
                            eos_id=-1, rounds=3)
    outs = eng.generate_many([list(p) for p in PROMPTS], N, ignore_eos=True)
    for s, (got, ref) in enumerate(zip(outs, refs)):
        assert got == ref, f"stream {s} diverged"
    assert all(st.stats.n_accept >= 0 for st in eng.streams)


def test_uneven_lengths_and_early_retirement(models):
    """Streams with different n_predict: short ones retire and become
    padding rows; long ones keep exact greedy output to the end."""
    tgt, _ = models
    nps = [6, 30, 14]
    refs = [_plain_greedy(tgt, p, n) for p, n in zip(PROMPTS, nps)]
    eng = BatchedDeviceLoop(_ctx(tgt), _ctx(tgt), GREEDY,
                            SpecParams(n_draft=4), n_streams=3,
                            eos_id=-1, rounds=2)
    outs = eng.generate_many([list(p) for p in PROMPTS], nps, ignore_eos=True)
    for s, (got, ref, n) in enumerate(zip(outs, refs, nps)):
        assert len(got) == n, f"stream {s} length"
        assert got == ref, f"stream {s} diverged"
    # rounds committed after a stream retires are tail waste, NOT accepts:
    # accept_rate_decided must never exceed 1.0 (early-retired stream 0
    # keeps riding the dispatch with rounds it never consumes)
    for s, st in enumerate(eng.streams):
        decided = st.stats.n_drafted - st.stats.n_drafted_unverified
        assert st.stats.n_accept <= decided, f"stream {s} double-dips accepts"
        assert 0.0 <= st.stats.accept_rate_decided <= 1.0


def test_eos_retires_one_stream(models):
    tgt, _ = models
    ref1 = _plain_greedy(tgt, PROMPTS[1], 30)
    eos = ref1[5]
    first = ref1.index(eos)
    eng = BatchedDeviceLoop(_ctx(tgt), _ctx(tgt), GREEDY,
                            SpecParams(n_draft=4), n_streams=3,
                            eos_id=eos, rounds=2)
    outs = eng.generate_many([list(p) for p in PROMPTS], 30)
    assert outs[1][-1] == eos and len(outs[1]) == first + 1
    # the other streams stop at eos too, but against THEIR own reference
    for s in (0, 2):
        ref = _plain_greedy(tgt, PROMPTS[s], 30)
        assert outs[s] == ref[: len(outs[s])]


def test_cell_reclamation_back_to_back(models):
    """Two generate_many calls on the same contexts: every scratch cell must
    be freed (host mirrors reconciled), final state trimmed per stream."""
    tgt, dft = models
    tctx, dctx = _ctx(tgt), _ctx(dft)
    free0 = tctx.n_free_cells
    eng = BatchedDeviceLoop(tctx, dctx, GREEDY, SpecParams(n_draft=4),
                            n_streams=3, eos_id=-1, rounds=2)
    outs1 = eng.generate_many([list(p) for p in PROMPTS], 12, ignore_eos=True)
    live = sum(len(p) + len(o) for p, o in zip(PROMPTS, outs1))
    assert tctx.n_free_cells == free0 - live
    for s in range(3):
        tctx.seq_rm(s, 0, -1)
        dctx.seq_rm(s, 0, -1)
    assert tctx.n_free_cells == free0
    outs2 = BatchedDeviceLoop(tctx, dctx, GREEDY, SpecParams(n_draft=4),
                              n_streams=3, eos_id=-1, rounds=2).generate_many(
        [list(p) for p in PROMPTS], 12, ignore_eos=True)
    assert outs1 == outs2


def test_stochastic_seeded_reproducible(models):
    tgt, dft = models
    STOCH = SamplingParams(temp=0.8, top_k=40, penalty_repeat=1.0,
                           penalty_last_n=0, seed=11)

    def run():
        eng = BatchedDeviceLoop(_ctx(tgt), _ctx(dft), STOCH,
                                SpecParams(n_draft=3), n_streams=3,
                                eos_id=-1, rounds=2)
        return eng.generate_many([list(p) for p in PROMPTS], 10, ignore_eos=True)

    a, b = run(), run()
    assert a == b
    assert all(len(x) == 10 for x in a)


def test_empty_prompt_rejected(models):
    """An empty prompt would silently mis-index prefill logits (ends =
    cumsum-1 hands it the previous stream's row) — must fail fast."""
    tgt, _ = models
    eng = BatchedDeviceLoop(_ctx(tgt), _ctx(tgt), GREEDY, SpecParams(n_draft=4),
                            n_streams=3, eos_id=-1, rounds=2)
    with pytest.raises(ValueError, match="empty prompt"):
        eng.generate_many([[3, 17], [], [5]], 4, ignore_eos=True)


def test_seeded_identical_prompts_diverge_across_streams(models):
    """Seeded stochastic runs: identical prompts must not all emit the same
    token stream (the host root draw and device keys fold the stream id)."""
    tgt, dft = models
    STOCH = SamplingParams(temp=1.2, top_k=40, penalty_repeat=1.0,
                           penalty_last_n=0, seed=7)
    eng = BatchedDeviceLoop(_ctx(tgt), _ctx(dft), STOCH,
                            SpecParams(n_draft=3), n_streams=3,
                            eos_id=-1, rounds=2)
    outs = eng.generate_many([[3, 17, 42]] * 3, 12, ignore_eos=True)
    assert not (outs[0] == outs[1] == outs[2]), "streams replay one sample path"


def test_unseeded_runs_differ(models):
    """seed=-1 must draw real entropy: two unseeded stochastic runs on the
    same prompts should not replay identical Gumbel sequences."""
    tgt, dft = models
    STOCH = SamplingParams(temp=1.2, top_k=40, penalty_repeat=1.0,
                           penalty_last_n=0, seed=-1)

    def run():
        eng = BatchedDeviceLoop(_ctx(tgt), _ctx(dft), STOCH,
                                SpecParams(n_draft=3), n_streams=3,
                                eos_id=-1, rounds=2)
        return eng.generate_many([list(p) for p in PROMPTS], 16, ignore_eos=True)

    assert run() != run()


def test_stream_count_guard(models):
    tgt, _ = models
    with pytest.raises(ValueError):
        BatchedDeviceLoop(_ctx(tgt), _ctx(tgt), GREEDY, SpecParams(n_draft=4),
                          n_streams=3, eos_id=-1).generate_many([[1]], 4)
    with pytest.raises(ValueError):
        BatchedDeviceLoop(_ctx(tgt), _ctx(tgt), SamplingParams(temp=0.0),
                          SpecParams(n_draft=4), n_streams=2)
