"""Continuous batching + HTTP server tests (ref strategy: the reference
validates these only by example binaries; we test concurrency directly)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample
from pipeinfer_tpu.serving.batching import BatchScheduler, Request
from pipeinfer_tpu.tools import testmodel

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=260)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("srv") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=11, **CFG)
    return load_model(path)


def _plain(params, cfg, prompt, n):
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    st = SamplerState(params=SamplingParams(temp=0.0))
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    pos = len(prompt)
    for _ in range(n):
        tok = sample(st, logits)
        st.accept(tok)
        out.append(tok)
        b.clear()
        b.add(tok, pos, 0)
        logits = ctx.decode(b)[0]
        pos += 1
    return out


def test_continuous_batching_matches_sequential(model):
    """Three interleaved greedy requests must each produce exactly what a
    dedicated context produces."""
    params, cfg = model
    prompts = [[5, 9, 23], [7, 100, 42, 8], [11]]
    want = [_plain(params, cfg, p, 12) for p in prompts]

    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    sched = BatchScheduler(ctx, max_slots=4, eos_id=-1, topk=None)
    reqs = [
        sched.submit(Request(prompt_ids=p, n_predict=12, sampling=SamplingParams(temp=0.0)))
        for p in prompts
    ]
    sched.run_until_idle()
    for r, w in zip(reqs, want):
        assert r.done
        assert r.generated == w


def test_hot_join(model):
    """A request admitted while others are mid-generation still decodes
    correctly (the hot-swap behavior of examples/parallel)."""
    params, cfg = model
    want = _plain(params, cfg, [42, 17], 8)
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    sched = BatchScheduler(ctx, max_slots=4, eos_id=-1, topk=None)
    r1 = sched.submit(Request(prompt_ids=[5, 9, 23], n_predict=20, sampling=SamplingParams(temp=0.0)))
    for _ in range(5):
        sched.step()
    r2 = sched.submit(Request(prompt_ids=[42, 17], n_predict=8, sampling=SamplingParams(temp=0.0)))
    sched.run_until_idle()
    assert r1.done and r2.done
    assert r2.generated == want


def test_http_server(model, tmp_path_factory):
    params, cfg = model
    path = tmp_path_factory.mktemp("srv2") / "m.gguf"
    testmodel.build_tiny_llama(
        path, seed=11, vocab_from="/root/reference/models/ggml-vocab-llama.gguf",
        n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128,
    )
    from pipeinfer_tpu.serving.server import serve

    httpd, engine = serve(str(path), "127.0.0.1", 0, n_cells=512, max_slots=4)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/props", timeout=30) as r:
            props = json.load(r)
            assert props["arch"] == "llama"

        body = json.dumps({"prompt": "Hello", "n_predict": 4, "temperature": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/completion", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
            assert out["tokens_predicted"] >= 1
            assert isinstance(out["content"], str)

        # OpenAI-style endpoint
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "Hi", "max_tokens": 3, "temperature": 0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req2, timeout=120) as r:
            out = json.load(r)
            assert out["object"] == "text_completion"
            assert out["usage"]["completion_tokens"] >= 1

        # malformed body
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/completion", data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        engine.shutdown()


def test_spec_scheduler_matches_sequential(model):
    """Speculative continuous batching (server --draft): each slot is a
    full PipeInfer stream; greedy outputs must be exact."""
    from pipeinfer_tpu.serving.batching import SpecBatchScheduler
    from pipeinfer_tpu.spec.params import SpecParams

    params, cfg = model
    prompts = [[5, 9, 23], [7, 100, 42, 8], [11]]
    want = [_plain(params, cfg, p, 12) for p in prompts]

    ctx = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(params, cfg, n_cells=512, cache_dtype=jnp.float32)
    sched = SpecBatchScheduler(
        ctx, ctx_d,
        spec_params=SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=2),
        max_slots=4, eos_id=-1,
    )
    reqs = [
        sched.submit(Request(prompt_ids=p, n_predict=12, sampling=SamplingParams(temp=0.0)))
        for p in prompts
    ]
    sched.run_until_idle()
    for r, w in zip(reqs, want):
        assert r.done
        assert r.generated == w


def test_http_server_speculative(model, tmp_path_factory):
    """End-to-end: pipeinfer-server --draft serves concurrent speculative
    requests over HTTP."""
    d = tmp_path_factory.mktemp("srv3")
    path = d / "m.gguf"
    testmodel.build_tiny_llama(
        path, seed=11, vocab_from="/root/reference/models/ggml-vocab-llama.gguf",
        n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128,
    )
    from pipeinfer_tpu.serving.server import serve
    from pipeinfer_tpu.spec.params import SpecParams

    httpd, engine = serve(
        str(path), "127.0.0.1", 0, n_cells=512, max_slots=4,
        draft_path=str(path),
        spec_params=SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=2),
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # two concurrent requests through the speculative engine
        results = {}

        def post(key, prompt):
            body = json.dumps({"prompt": prompt, "n_predict": 6, "temperature": 0}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/completion", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                results[key] = json.load(r)

        th = [threading.Thread(target=post, args=(k, p))
              for k, p in [("a", "Hello"), ("b", "The quick")]]
        for x in th:
            x.start()
        for x in th:
            x.join()
        for k in ("a", "b"):
            assert results[k]["tokens_predicted"] >= 1
            assert isinstance(results[k]["content"], str)
    finally:
        httpd.shutdown()
        engine.shutdown()


def test_kv_admission_control(model):
    """A request that can never fit fails with .error (no hang, engine
    alive); oversubscribing requests queue until cells free up
    (ADVICE r1: find_cells RuntimeError used to kill the engine thread)."""
    params, cfg = model
    ctx = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    sched = BatchScheduler(ctx, max_slots=4, eos_id=-1, topk=None)

    too_big = sched.submit(
        Request(prompt_ids=[1] * 10, n_predict=200, sampling=SamplingParams(temp=0.0))
    )
    sched.step()
    assert too_big.done and too_big.error and "KV cells" in too_big.error

    # two requests that each fit but not together: both must complete
    reqs = [
        sched.submit(
            Request(prompt_ids=[5, 9, 23], n_predict=35, sampling=SamplingParams(temp=0.0))
        )
        for _ in range(2)
    ]
    sched.run_until_idle()
    for r in reqs:
        assert r.done and r.error is None
        assert len(r.generated) == 35
    assert sched._reserved == 0
