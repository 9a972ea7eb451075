"""Speculation × continuous batching: concurrent PipeInfer streams over one
shared target/draft context pair must each emit exactly the tokens plain
decoding would (disjoint seq namespaces, interleaved retirement), with slot
reclamation and hot-join (ref: examples/parallel scheduling semantics,
combined with the PipeInfer pipeline — a pairing the reference never ships)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.multi import MultiPipeInfer
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

from .test_sync_spec import CFG, N_PREDICT, PROMPT


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    path = tmp_path_factory.mktemp("mspec") / "tgt.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    return load_model(path)


def _plain_decode(params, cfg, prompt, n_predict, sp_params):
    """Plain decoding with the controller's exact sampling chain (the
    oracle must share penalty/RNG state handling, not just argmax)."""
    from pipeinfer_tpu.sampling.samplers import SamplerState, sample

    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    st = SamplerState(params=sp_params)
    b = Batch()
    for i, t in enumerate(prompt):
        st.accept(t, apply_grammar=False)
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out, pos = [], len(prompt)
    for _ in range(n_predict):
        tok = sample(st, logits)
        st.accept(tok)
        out.append(tok)
        b.clear()
        b.add(tok, pos, 0)
        logits = ctx.decode(b)[0]
        pos += 1
    return out


PROMPTS = [list(PROMPT), [3, 14, 15, 9, 2], [31, 4, 1, 5, 9, 26]]


def test_multi_streams_each_exact(target):
    params, cfg = target
    want = [_plain_decode(params, cfg, p, N_PREDICT, SamplingParams(temp=0.0)) for p in PROMPTS]

    ctx_t = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    sp = SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=2)
    eng = MultiPipeInfer(ctx_t, ctx_d, SamplingParams(temp=0.0), sp, eos_id=-1)

    reqs = [eng.submit(p, N_PREDICT) for p in PROMPTS]
    eng.run_until_idle()

    for r, w in zip(reqs, want):
        assert r.done
        assert r.tokens == w, f"stream {r.id} diverges: {r.tokens} vs {w}"
    # all slots reclaimed, all cells freed
    assert len(eng.free_bases) == eng.max_streams
    assert not eng.active and not eng.pending
    assert (ctx_t.h_pos[: ctx_t.trash_cell] < 0).all(), "leaked target cells"
    assert (ctx_d.h_pos[: ctx_d.trash_cell] < 0).all(), "leaked draft cells"


def test_multi_hot_join_and_overcommit(target):
    """More requests than stream slots: later requests queue, join as
    earlier streams finish, and still decode exactly."""
    params, cfg = target
    prompts = PROMPTS + [[9, 9, 2, 7], [1, 2, 3, 4, 5]]
    want = [_plain_decode(params, cfg, p, N_PREDICT, SamplingParams(temp=0.0)) for p in prompts]

    ctx_t = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    sp = SpecParams(n_draft=4, n_parallel=2, p_accept=0.0, max_inflight=2)
    eng = MultiPipeInfer(
        ctx_t, ctx_d, SamplingParams(temp=0.0), sp, eos_id=-1, max_streams=2
    )
    assert eng.max_streams == 2

    reqs = [eng.submit(p, N_PREDICT) for p in prompts[:3]]
    # hot-join: submit two more after the engine is already running
    for _ in range(4):
        eng.step()
    reqs += [eng.submit(p, N_PREDICT) for p in prompts[3:]]
    eng.run_until_idle()

    for r, w in zip(reqs, want):
        assert r.done and r.tokens == w, f"stream {r.id}: {r.tokens} vs {w}"
    assert len(eng.free_bases) == eng.max_streams


def test_multi_stochastic_streams_independent(target):
    """Seeded stochastic sampling per stream: each stream's RNG is its own
    controller's, so concurrency must not perturb any stream's tokens."""
    params, cfg = target
    sp_params = SamplingParams(temp=0.9, top_k=20, seed=77)
    want = [_plain_decode(params, cfg, p, N_PREDICT, sp_params) for p in PROMPTS[:2]]

    ctx_t = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    sp = SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=2)
    eng = MultiPipeInfer(ctx_t, ctx_d, sp_params, sp, eos_id=-1)
    reqs = [eng.submit(p, N_PREDICT) for p in PROMPTS[:2]]
    eng.run_until_idle()
    for r, w in zip(reqs, want):
        assert r.tokens == w, f"stream {r.id} diverges: {r.tokens} vs {w}"


def test_multi_streams_over_staged_target(target):
    """Composition: concurrent speculative streams over a PIPELINED target
    (multi-stage host-driven contexts) — stages x streams x speculation all
    at once, still token-exact."""
    from pipeinfer_tpu.parallel.stages import StagedInferenceContext

    params, cfg = target
    want = [_plain_decode(params, cfg, p, N_PREDICT, SamplingParams(temp=0.0))
            for p in PROMPTS[:2]]

    ctx_t = StagedInferenceContext(params, cfg, n_cells=512,
                                   devices=[jax.devices("cpu")[0]] * 2)
    ctx_d = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    sp = SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=2)
    eng = MultiPipeInfer(ctx_t, ctx_d, SamplingParams(temp=0.0), sp, eos_id=-1)
    reqs = [eng.submit(p, N_PREDICT) for p in PROMPTS[:2]]
    eng.run_until_idle()
    for r, w in zip(reqs, want):
        assert r.done and r.tokens == w, f"staged stream {r.id}: {r.tokens} vs {w}"
