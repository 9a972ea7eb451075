"""Device-corrected chaining (spec/corrected.py): the async controller's
fused runs verify ON DEVICE and chain from the corrected frontier, so
chained runs are never launched on stale assumptions — greedy output stays
bit-identical to plain decoding with zero cancellations and zero cross-run
dead work, at any draft quality. Plus the acceptance-EMA convergence tests
(round-4 verdict: the estimator must track true per-token acceptance)."""

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
PROMPT = list(range(5, 25))
N = 96


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """Known-acceptance margin pair: the draft's output head disagrees with
    the target's on ~50% of the vocabulary (testmodel.build_bench_pair eps
    design), so per-token acceptance is measurable and far from 1."""
    d = tmp_path_factory.mktemp("corr")
    testmodel.build_bench_pair(d / "t.gguf", d / "d.gguf", scale="nano", eps=0.5)
    return load_model(d / "t.gguf"), load_model(d / "d.gguf")


def _ctx(m, n_cells=1024):
    return InferenceContext(m[0], m[1], n_cells=n_cells, cache_dtype=jnp.float32)


def _plain_greedy(m, prompt, n):
    ctx = _ctx(m)
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out, n_past = [], len(prompt)
    for _ in range(n):
        tok = int(np.argmax(logits))
        out.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1
    return out


def _true_accept(tgt_m, dft_m, stream):
    """Ground-truth per-token acceptance: teacher-forced over the COMMITTED
    stream, does the draft's argmax agree with the target's? (independent
    of any speculation machinery)."""
    rows = {}
    for m in (tgt_m, dft_m):
        ctx = _ctx(m)
        b = Batch()
        for i, t in enumerate(stream):
            b.add(t, i, 0, want_logits=True)
        rows[id(m)] = np.argmax(ctx.decode(b), axis=-1)
    agree = rows[id(tgt_m)] == rows[id(dft_m)]
    return float(np.mean(agree))


def test_corrected_greedy_exact_and_no_dead_work(pair):
    tgt, dft = pair
    want = _plain_greedy(tgt, PROMPT, N)
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0,
                    max_inflight=4, min_inflight=2)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    assert c.use_corrected, "corrected mode should engage for this config"
    got = c.generate(list(PROMPT), N, ignore_eos=True)
    assert got == want, "corrected chaining diverged from plain greedy"
    # the structural win: a 50%-divergent draft causes ZERO cancellations
    # and ZERO cross-run dead work (runs always launch from the true
    # frontier) — the assume-chained path measured 80% dead work here
    assert c.metrics.n_canceled_runs == 0
    assert c.metrics.n_dead_tokens == 0
    assert not c.runs
    assert len(c.free_offsets) == sp.max_inflight


def test_corrected_depth_ladder_engages(pair):
    """At ~50% acceptance the policy must leave the top rung (the round-4
    verdict's 'mixed depth histogram' criterion)."""
    tgt, dft = pair
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0,
                    max_inflight=4, min_inflight=2)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    c.generate(list(PROMPT), N, ignore_eos=True)
    assert len(c.depth_counts) >= 2, f"ladder never engaged: {c.depth_counts}"
    assert min(c.depth_counts) < 8, f"never left the top rung: {c.depth_counts}"


def test_accept_ema_tracks_true_acceptance(pair):
    """The estimator converges to the TRUE per-token acceptance (measured
    independently by teacher-forcing both models over the committed
    stream) within +-0.1 — the round-4 verdict's acceptance criterion."""
    tgt, dft = pair
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0,
                    max_inflight=4, min_inflight=2)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    out = c.generate(list(PROMPT), N, ignore_eos=True)
    truth = _true_accept(tgt, dft, PROMPT + out)
    assert truth < 0.85, f"pair not divergent enough to test ({truth})"
    assert abs(c.accept_ema - truth) <= 0.1, (
        f"EMA {c.accept_ema:.3f} vs true per-token acceptance {truth:.3f}"
    )


def test_accept_ema_tracks_true_acceptance_host_path(pair):
    """Same criterion for the HOST-verified controller (device_verify off):
    the per-token folds must converge for the legacy path too."""
    tgt, dft = pair
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0,
                    max_inflight=4, min_inflight=2, device_verify=False)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    assert not c.use_corrected and c.use_fused
    out = c.generate(list(PROMPT), N, ignore_eos=True)
    want = _plain_greedy(tgt, PROMPT, N)
    assert out == want  # host path exactness unchanged
    truth = _true_accept(tgt, dft, PROMPT + out)
    assert abs(c.accept_ema - truth) <= 0.12, (
        f"host-path EMA {c.accept_ema:.3f} vs true {truth:.3f}"
    )


def test_ema_unit_convergence_bernoulli():
    """Pure-unit injection (round-4 verdict): feed run-shaped evidence from
    a true Bernoulli(0.5) acceptance process and assert the EMA converges
    to 0.5 within +-0.05 — the per-run fold it replaces converged to ~0.6
    (full-depth matches carried several times an early mismatch's weight)."""
    sp = SpecParams(ema_decay=0.96)
    ctrl = type("C", (), {"sp": sp, "accept_ema": 1.0, "_ema_version": 0})()
    update = PipeInferController._update_accept_ema
    rng = np.random.default_rng(0)
    depth = 8
    trace = []
    for _ in range(600):
        # verification shape: matches until the first mismatch, cap depth
        m = 0
        while m < depth and rng.random() < 0.5:
            m += 1
        update(ctrl, m, m + (1 if m < depth else 0))
        trace.append(ctrl.accept_ema)
    # the EMA's instantaneous std at decay 0.96 is ~0.07; unbiasedness is
    # the property under test, so assert on the settled time-average (and
    # the verdict's +-0.1 bound on the endpoint)
    assert abs(float(np.mean(trace[200:])) - 0.5) <= 0.05, np.mean(trace[200:])
    assert abs(ctrl.accept_ema - 0.5) <= 0.1, ctrl.accept_ema


def test_corrected_stochastic_seeded_reproducible(pair):
    tgt, dft = pair
    STOCH = SamplingParams(temp=0.9, top_k=40, penalty_repeat=1.0,
                           penalty_last_n=0, seed=13)
    sp = SpecParams(n_draft=6, n_parallel=1, p_accept=0.0,
                    max_inflight=3, min_inflight=2)

    def run():
        c = PipeInferController(_ctx(tgt), _ctx(dft), STOCH, sp, eos_id=-1)
        assert c.use_corrected
        return c.generate(list(PROMPT), 40, ignore_eos=True)

    a, b = run(), run()
    assert a == b
    assert len(a) == 40


def test_corrected_eos_stops(pair):
    tgt, dft = pair
    want = _plain_greedy(tgt, PROMPT, 64)
    eos = want[20]
    first = want.index(eos)
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0,
                    max_inflight=4, min_inflight=2)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=eos)
    got = c.generate(list(PROMPT), 64)
    assert got == want[: first + 1]


def test_corrected_no_cell_leaks(pair):
    """Back-to-back generations on the same contexts: scratch cells all
    reclaimed; committed cells = live tokens (the newest token's cell is
    legitimately absent — it was decided by logits, never decoded; same
    final state as the reference and the device loop)."""
    tgt, dft = pair
    tctx, dctx = _ctx(tgt), _ctx(dft)
    free0 = tctx.n_free_cells
    sp = SpecParams(n_draft=8, n_parallel=1, p_accept=0.0,
                    max_inflight=4, min_inflight=2)
    c = PipeInferController(tctx, dctx, GREEDY, sp, eos_id=-1)
    out1 = c.generate(list(PROMPT), N, ignore_eos=True)
    live = len(PROMPT) + len(out1)
    assert free0 - live <= tctx.n_free_cells <= free0 - live + 1
    tctx.seq_rm(0, 0, -1)
    dctx.seq_rm(0, 0, -1)
    assert tctx.n_free_cells == free0
    c2 = PipeInferController(tctx, dctx, GREEDY, sp, eos_id=-1)
    out2 = c2.generate(list(PROMPT), N, ignore_eos=True)
    assert out1 == out2


def test_p_chain_gate_cuts_dead_work(pair):
    """The chain-survival launch gate (SpecParams.p_chain, round-4 verdict
    item 9): on the ASSUME-chained host-verified path with a ~50%-divergent
    draft, a high bar refuses chained runs whose assumed prefix is doomed
    (survival accept_ema**L below p_chain), so cross-run dead work drops —
    while min_inflight keeps the pipeline from emptying and greedy output
    stays exact (the gate only skips launches, never verification)."""
    tgt, dft = pair
    want = _plain_greedy(tgt, PROMPT, N)
    dead = {}
    canceled = {}
    for pc in (0.0, 0.9):
        sp = SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, p_split=0.9,
                        max_inflight=4, adapt_depth=False,
                        device_verify=False, p_chain=pc)
        c = PipeInferController(_ctx(tgt, 4096), _ctx(dft, 4096), GREEDY, sp,
                                eos_id=-1)
        out = c.generate(list(PROMPT), N)
        assert out == want, f"p_chain={pc} broke greedy exactness"
        dead[pc] = c.metrics.dead_work_frac
        canceled[pc] = c.metrics.n_canceled_runs
    # at ~50% acceptance the EMA sits near 0.5: survival 0.5**L < 0.9 for
    # every assumed prefix, so the gate blocks all chained launches beyond
    # min_inflight — fewer doomed runs, less dead work and cancellation
    assert dead[0.9] < dead[0.0], (dead, canceled)
    assert canceled[0.9] <= canceled[0.0], (dead, canceled)


def test_corrected_stall_surfaces_cachefull(pair, monkeypatch):
    """An empty pipeline that cannot relaunch (shared-pool cell exhaustion)
    must surface CacheFull from tick(), not read as `done` and silently
    truncate the generation (review finding: _launch_corrected swallows
    CacheFull, so `done` == True with fewer tokens than asked)."""
    from pipeinfer_tpu.runtime.context import CacheFull

    tgt, dft = pair
    sp = SpecParams(n_draft=4, n_parallel=1, max_inflight=2,
                    adapt_depth=False)
    c = PipeInferController(_ctx(tgt), _ctx(dft), GREEDY, sp, eos_id=-1)
    assert c.use_corrected
    c.start_generation(list(PROMPT), N, ignore_eos=True)
    monkeypatch.setattr(c, "_launch_corrected", lambda: False)
    with pytest.raises(CacheFull):
        for _ in range(64):
            c.tick(block=True)
            assert not c.done or len(c.generated) >= N, \
                "controller read as done before the budget (silent truncation)"
