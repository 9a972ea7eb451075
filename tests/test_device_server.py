"""DeviceLoopServer (spec/device_multi.py) + serving scheduler routing:
hot-joining lanes over the batched device loop must stay bit-exact vs solo
greedy decode, and SpecBatchScheduler must route sampler-compatible
requests to the device lanes while grammar/penalty requests keep the
host-verified MultiPipeInfer path (round-4 verdict item 3 — serving was
wired to the slowest engine; ref: examples/server/server.cpp:377-463 slot
scheduler, examples/parallel/parallel.cpp:238-274)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.device_multi import DeviceLoopServer
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("dsrv")
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


def test_hot_join_exact(models):
    """5 requests through 2 lanes: later requests hot-join lanes freed by
    earlier ones; every output equals its solo plain-greedy decode."""
    tgt, dft = models
    srv = DeviceLoopServer(_ctx(tgt), _ctx(dft), GREEDY, SpecParams(n_draft=4),
                           n_lanes=2, seq_base=60, rounds=2, eos_id=-1)
    prompts = [[3, 17, 42], [5, 9], [100, 200, 300, 400], [7, 8, 9], [1, 2]]
    ns = [12, 9, 15, 6, 11]
    hs = [srv.submit(p, n) for p, n in zip(prompts, ns)]
    srv.run_until_idle()
    for h, p, n in zip(hs, prompts, ns):
        assert h.done and h.error is None
        assert h.tokens == _plain_greedy(tgt, p, n)


def test_staggered_submit_mid_decode(models):
    """Requests submitted while other lanes are mid-decode join without
    perturbing the running streams (the dispatch-time active-mask join)."""
    tgt, dft = models
    srv = DeviceLoopServer(_ctx(tgt), _ctx(dft), GREEDY, SpecParams(n_draft=4),
                           n_lanes=2, seq_base=50, rounds=2, eos_id=-1)
    h1 = srv.submit([3, 17, 42], 20)
    h2 = srv.submit([5, 9], 18)
    for _ in range(3):  # progress the first pair mid-flight
        srv.step(block=True)
    h3 = srv.submit([100, 200, 300, 400], 10)
    h4 = srv.submit([7, 8, 9], 8)
    srv.run_until_idle()
    for h, p, n in [(h1, [3, 17, 42], 20), (h2, [5, 9], 18),
                    (h3, [100, 200, 300, 400], 10), (h4, [7, 8, 9], 8)]:
        assert h.done and h.tokens == _plain_greedy(tgt, p, n)


def test_lane_cells_released(models):
    """Finished requests free ALL their KV cells (full seq clear): after
    idle, both pools are back to empty mirrors."""
    tgt, dft = models
    ctx_t, ctx_d = _ctx(tgt, 1024), _ctx(dft, 1024)
    srv = DeviceLoopServer(ctx_t, ctx_d, GREEDY, SpecParams(n_draft=4),
                           n_lanes=2, seq_base=40, rounds=2, eos_id=-1)
    hs = [srv.submit([3 + i, 17, 42], 8) for i in range(4)]
    srv.run_until_idle()
    assert all(h.done for h in hs)
    assert int((ctx_t.h_pos >= 0).sum()) == 0
    assert int((ctx_d.h_pos >= 0).sum()) == 0


def test_eos_retires_lane(models):
    """A lane hitting EOS retires early and its lane is reused."""
    tgt, dft = models
    # discover the greedy continuation, then pick as EOS a token whose
    # FIRST occurrence is past position 1 (toy models repeat tokens)
    want = _plain_greedy(tgt, [3, 17, 42], 16)
    j = next(i for i in range(2, len(want)) if want[i] not in want[:i])
    eos = want[j]
    srv = DeviceLoopServer(_ctx(tgt), _ctx(dft), GREEDY, SpecParams(n_draft=4),
                           n_lanes=1, seq_base=10, rounds=2, eos_id=eos)
    h = srv.submit([3, 17, 42], 50)
    h2 = srv.submit([5, 9], 6)  # queued behind the single lane
    srv.run_until_idle()
    assert h.tokens == want[: j + 1]  # stops AT the eos token
    assert h2.done and len(h2.tokens) == 6


def test_compatible_routing_envelope(models):
    tgt, dft = models
    srv = DeviceLoopServer(_ctx(tgt), _ctx(dft), GREEDY, SpecParams(n_draft=4),
                           n_lanes=1, seq_base=0, rounds=2, eos_id=-1)
    assert srv.compatible(GREEDY)
    # default penalties alter even greedy output -> host path
    assert not srv.compatible(SamplingParams(temp=0.0))
    assert not srv.compatible(SamplingParams(temp=0.0, penalty_repeat=1.3,
                                             penalty_last_n=64))
    # stochastic request vs a greedy-compiled server -> host path
    assert not srv.compatible(SamplingParams(temp=0.8, penalty_repeat=1.0,
                                             penalty_last_n=0))
    # stochastic server takes matching unseeded chains only
    stoch = SamplingParams(temp=0.8, penalty_repeat=1.0, penalty_last_n=0,
                           seed=-1)
    srv2 = DeviceLoopServer(_ctx(tgt), _ctx(dft), stoch, SpecParams(n_draft=4),
                            n_lanes=1, seq_base=0, rounds=2, eos_id=-1)
    assert srv2.compatible(stoch)
    assert not srv2.compatible(
        SamplingParams(temp=0.8, penalty_repeat=1.0, penalty_last_n=0, seed=7))
    assert not srv2.compatible(
        SamplingParams(temp=0.5, penalty_repeat=1.0, penalty_last_n=0))
    assert not srv2.compatible(GREEDY)


def test_scheduler_routes_and_matches(models):
    """Mixed workload through SpecBatchScheduler: greedy requests ride the
    device lanes, penalty requests keep host verification; every greedy
    output is exact and both engines actually carried work."""
    from pipeinfer_tpu.serving.batching import Request, SpecBatchScheduler

    tgt, dft = models
    ctx_t, ctx_d = _ctx(tgt, 4096), _ctx(dft, 4096)
    sched = SpecBatchScheduler(
        ctx_t, ctx_d,
        spec_params=SpecParams(n_draft=4, n_parallel=1, p_accept=0.0,
                               max_inflight=2),
        max_slots=2, eos_id=-1, device_lanes=2, device_rounds=2,
    )
    assert sched.devsrv is not None
    greedy_prompts = [[3, 17, 42], [5, 9], [100, 200]]
    pen = SamplingParams(temp=0.0, penalty_repeat=1.3, penalty_last_n=64)
    reqs = [
        sched.submit(Request(prompt_ids=p, n_predict=10, sampling=GREEDY))
        for p in greedy_prompts
    ]
    rp = sched.submit(Request(prompt_ids=[11, 12], n_predict=8, sampling=pen))
    sched.run_until_idle()
    for r, p in zip(reqs, greedy_prompts):
        assert r.done and r.error is None
        assert r.generated == _plain_greedy(tgt, p, 10)
    assert rp.done and len(rp.generated) == 8
    # routing proof: device lanes carried the greedy requests, the host
    # engine carried the penalty one (beyond the device chain's envelope)
    assert sched.n_device_served == 3
    assert sched.n_host_served == 1
    assert not sched.devsrv.compatible(pen)


def test_scheduler_seq_namespaces_disjoint(models):
    """The host engine's slot cap shrinks by the carved device lanes."""
    from pipeinfer_tpu.serving.batching import SpecBatchScheduler
    from pipeinfer_tpu.spec.multi import MAX_SEQS

    tgt, dft = models
    sched = SpecBatchScheduler(
        _ctx(tgt), _ctx(dft),
        spec_params=SpecParams(n_draft=4, n_parallel=1, max_inflight=2),
        eos_id=-1, device_lanes=4,
    )
    stride = 1 + 1 * 2
    assert sched.engine.max_streams <= (MAX_SEQS - 4) // stride
    assert sched.devsrv.seq_base == MAX_SEQS - 4


def test_admit_reserves_running_lanes(models):
    """Admission must reserve running lanes' outstanding n_predict + scratch:
    two requests that each fit the pool alone but not together run
    SEQUENTIALLY (review finding: admitting against the instantaneous free
    count overcommits the pool and livelocks _dispatch on CacheFull)."""
    tgt, dft = models
    srv = DeviceLoopServer(_ctx(tgt, n_cells=176), _ctx(dft, n_cells=176),
                           GREEDY, SpecParams(n_draft=4), n_lanes=2,
                           seq_base=60, rounds=2, eos_id=-1)
    h1 = srv.submit([3, 17, 42], 100)
    h2 = srv.submit([5, 9, 11], 100)
    srv.step()
    running = [h for h in srv.lanes if h is not None]
    assert len(running) == 1, "second request must wait for headroom"
    assert len(srv.queue) == 1
    srv.run_until_idle()
    for h, p in ((h1, [3, 17, 42]), (h2, [5, 9, 11])):
        assert h.done and h.error is None, h.error
        assert h.tokens == _plain_greedy(tgt, p, 100)
