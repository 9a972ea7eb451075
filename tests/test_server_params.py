"""Server request-parameter parity (round-4 verdict item 7): per-request
`grammar`, `n_probs`, `logit_bias` (incl. the JSON-false ban form),
`ignore_eos`, and `stop` sequences, matching the reference server's
request schema (ref: examples/server/server.cpp:721-760, stop handling
:1043-1086, probs output :1106-1123)."""

import json
import threading
import urllib.request

import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.serving.batching import BatchScheduler, Request
from pipeinfer_tpu.tools import testmodel


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srvp")
    path = d / "m.gguf"
    testmodel.build_tiny_llama(
        path, seed=11, vocab_from="/root/reference/models/ggml-vocab-llama.gguf",
        n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128,
    )
    from pipeinfer_tpu.serving.server import serve

    httpd, engine = serve(str(path), "127.0.0.1", 0, n_cells=1024, max_slots=4)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    engine.shutdown()


def _post(port, body, path="/completion"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.load(r)


def test_grammar_constrains_output(server):
    """A GBNF grammar forces output into its language even for a random
    model (the grammar engine masks every illegal continuation)."""
    out = _post(server, {
        "prompt": "Answer:", "n_predict": 8, "temperature": 0,
        "grammar": 'root ::= "yes" | "no"',
    })
    assert out["content"] in ("yes", "no")


def test_bad_grammar_is_400(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/completion",
        data=json.dumps({"prompt": "x", "grammar": "root := broken"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_n_probs_payload(server):
    out = _post(server, {
        "prompt": "Hello", "n_predict": 5, "temperature": 0, "n_probs": 3,
    })
    probs = out["completion_probabilities"]
    assert len(probs) == out["tokens_predicted"]
    for entry in probs:
        assert 1 <= len(entry["probs"]) <= 3
        vals = [p["prob"] for p in entry["probs"]]
        assert vals == sorted(vals, reverse=True)
        assert all(0.0 <= v <= 1.0 for v in vals)
        # greedy: the committed token IS the top candidate
        assert entry["probs"][0]["tok_str"] == entry["content"]


def test_stop_sequence_truncates_and_cancels(server):
    base = _post(server, {"prompt": "Once", "n_predict": 24, "temperature": 0,
                          "repeat_penalty": 1.0, "repeat_last_n": 0})
    text = base["content"]
    assert len(text) > 6
    stop = text[3:6]
    out = _post(server, {"prompt": "Once", "n_predict": 24, "temperature": 0,
                         "repeat_penalty": 1.0, "repeat_last_n": 0,
                         "stop": [stop]})
    assert out["stopped_word"] is True
    assert out["stopping_word"] == stop
    assert out["content"] == text[: text.find(stop)]
    assert stop not in out["content"]


def test_stop_sequence_streaming(server):
    base = _post(server, {"prompt": "Once", "n_predict": 24, "temperature": 0,
                          "repeat_penalty": 1.0, "repeat_last_n": 0})
    text = base["content"]
    stop = text[3:6]
    body = json.dumps({"prompt": "Once", "n_predict": 24, "temperature": 0,
                       "repeat_penalty": 1.0, "repeat_last_n": 0,
                       "stop": [stop], "stream": True}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/completion", data=body,
        headers={"Content-Type": "application/json"},
    )
    pieces, final = [], None
    with urllib.request.urlopen(req, timeout=300) as r:
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            obj = json.loads(line[6:])
            if obj.get("stop"):
                final = obj
            else:
                pieces.append(obj["content"])
    got = "".join(pieces) + (final.get("content") or "")
    assert final["stopped_word"] is True
    assert got == text[: text.find(stop)]


def _sched(model_path_params, n_cells=512):
    params, cfg = model_path_params
    ctx = InferenceContext(params, cfg, n_cells=n_cells, cache_dtype=jnp.float32)
    return BatchScheduler(ctx, max_slots=4, eos_id=-1, topk=None)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("srvp2") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=11, n_layers=2, n_embd=64,
                               n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=260)
    return load_model(path)


def test_logit_bias_ban_and_boost(model):
    """bias=-inf (the JSON-false form) bans a token; +100 forces it."""
    sched = _sched(model)
    r0 = sched.submit(Request(prompt_ids=[5, 9], n_predict=6,
                              sampling=SamplingParams(temp=0.0)))
    sched.run_until_idle()
    banned = r0.generated[0]
    r1 = sched.submit(Request(
        prompt_ids=[5, 9], n_predict=6,
        sampling=SamplingParams(temp=0.0,
                                logit_bias={banned: float("-inf")})))
    sched.run_until_idle()
    assert banned not in r1.generated
    r2 = sched.submit(Request(
        prompt_ids=[5, 9], n_predict=4,
        sampling=SamplingParams(temp=0.0, penalty_repeat=1.0,
                                penalty_last_n=0,
                                logit_bias={123: 1000.0})))
    sched.run_until_idle()
    assert r2.generated == [123] * 4


def test_spec_scheduler_grammar_and_nprobs(model):
    """The speculative scheduler carries grammar + n_probs down the
    host-verified engine (device lanes are excluded for both)."""
    from pipeinfer_tpu.serving.batching import SpecBatchScheduler
    from pipeinfer_tpu.spec.params import SpecParams

    params, cfg = model
    ctx = InferenceContext(params, cfg, n_cells=2048, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(params, cfg, n_cells=2048, cache_dtype=jnp.float32)
    sched = SpecBatchScheduler(
        ctx, ctx_d,
        spec_params=SpecParams(n_draft=4, n_parallel=1, p_accept=0.0,
                               max_inflight=2),
        max_slots=2, eos_id=-1, device_lanes=2, device_rounds=2,
    )
    req = sched.submit(Request(
        prompt_ids=[5, 9, 23], n_predict=8,
        sampling=SamplingParams(temp=0.0, penalty_repeat=1.0,
                                penalty_last_n=0),
        n_probs=2,
    ))
    sched.run_until_idle()
    assert req.done and req.error is None
    assert sched.n_host_served == 1  # n_probs excludes device lanes
    assert len(req.probs) == len(req.generated)
    for toks, row in zip(req.generated, req.probs):
        assert row[0][0] == toks  # greedy commit == top candidate


def test_top_probs_logit_bias_normalized():
    """logit_bias must move the NORMALIZER too: probs are exact full-vocab
    softmax probabilities of the BIASED distribution, never >1 (review
    finding: vals were biased but exp(vals - lse) kept the pre-bias lse)."""
    import numpy as np

    from pipeinfer_tpu.sampling.samplers import (
        SamplerState, SamplingParams, SparseLogits, top_probs,
    )

    rng = np.random.default_rng(3)
    row = rng.normal(size=32).astype(np.float32)
    order = np.argsort(-row)[:8]
    sl = SparseLogits(
        order.astype(np.int32), row[order],
        float(np.log(np.exp(row.astype(np.float64)).sum())),
    )
    tid = int(order[0])
    p = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0,
                       logit_bias={tid: 10.0})
    probs = dict(top_probs(SamplerState(params=p), sl, 8))

    biased = row.astype(np.float64).copy()
    biased[tid] += 10.0
    want = np.exp(biased) / np.exp(biased).sum()
    assert 0.0 <= probs[tid] <= 1.0
    assert abs(probs[tid] - want[tid]) < 1e-4, (probs[tid], want[tid])
    for t, v in probs.items():
        assert abs(v - want[t]) < 1e-4
    # ban form: a large negative bias removes the token's mass and the
    # remaining window renormalizes against the shrunken Z
    p2 = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0,
                        logit_bias={tid: -1e9})
    probs2 = dict(top_probs(SamplerState(params=p2), sl, 8))
    banned = row.astype(np.float64).copy()
    Z2 = np.exp(banned).sum() - np.exp(banned[tid])
    for t, v in probs2.items():
        if t == tid:
            assert v <= 1e-6
        else:
            assert abs(v - np.exp(banned[t]) / Z2) < 1e-4
