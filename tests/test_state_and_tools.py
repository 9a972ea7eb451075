"""State save/load round-trip (ref: examples/save-load-state), quantize
tool, and perplexity tool tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime import state as rstate
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.quantize import quantize_file

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=300)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("st") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=3, **CFG)
    return load_model(path)


def _decode_tokens(ctx, tokens, pos0=0):
    b = Batch()
    for i, t in enumerate(tokens):
        b.add(t, pos0 + i, 0, want_logits=True)
    return ctx.decode(b)


def test_state_round_trip(model, tmp_path):
    """ref: examples/save-load-state round-trip check."""
    params, cfg = model
    ctx = InferenceContext(params, cfg, n_cells=32, cache_dtype=jnp.float32)
    prompt = [5, 9, 23, 41]
    _decode_tokens(ctx, prompt)
    rstate.save_state(ctx, tmp_path / "s.npz", tokens=prompt)

    # continue from the live context
    want = _decode_tokens(ctx, [7], pos0=4)

    # restore into a fresh context and continue identically
    ctx2 = InferenceContext(params, cfg, n_cells=32, cache_dtype=jnp.float32)
    toks = rstate.load_state(ctx2, tmp_path / "s.npz")
    assert toks == prompt
    got = _decode_tokens(ctx2, [7], pos0=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_state_shape_mismatch(model, tmp_path):
    params, cfg = model
    ctx = InferenceContext(params, cfg, n_cells=32, cache_dtype=jnp.float32)
    rstate.save_state(ctx, tmp_path / "s.npz")
    ctx2 = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        rstate.load_state(ctx2, tmp_path / "s.npz")


def test_quantize_tool(tmp_path):
    src = tmp_path / "f32.gguf"
    dst = tmp_path / "q.gguf"
    testmodel.build_tiny_llama(src, seed=3, n_layers=1, n_embd=256, n_ff=256,
                               n_heads=4, n_kv_heads=2, n_vocab=512)
    quantize_file(str(src), str(dst), GGMLQuantType.Q4_K)
    p1, c1 = load_model(src)
    p2, c2 = load_model(dst)
    assert c1.n_embd == c2.n_embd
    ctx1 = InferenceContext(p1, c1, n_cells=16, cache_dtype=jnp.float32)
    ctx2 = InferenceContext(p2, c2, n_cells=16, cache_dtype=jnp.float32)
    l1 = _decode_tokens(ctx1, [1, 2, 3])
    l2 = _decode_tokens(ctx2, [1, 2, 3])
    # 4-bit error on random N(0,σ) weights is large relative to the tiny
    # near-tied logits such weights produce; just bound it structurally
    rel = np.abs(l1 - l2).max() / (np.abs(l1).max() + 1e-6)
    assert rel < 0.5, rel


def test_perplexity_tool(model):
    from pipeinfer_tpu.tools.perplexity import perplexity

    params, cfg = model

    class TokStub:
        class vocab:
            eos_id = 2

        def encode(self, text, add_bos=True):
            rng = np.random.default_rng(0)
            return [1] + rng.integers(3, CFG["n_vocab"], 130).tolist()

    ctx = InferenceContext(params, cfg, n_cells=80, cache_dtype=jnp.float32)
    ppl, n = perplexity(ctx, TokStub(), "x", n_ctx=64)
    assert n > 0
    assert 1.0 < ppl < CFG["n_vocab"] * 2


def test_beam_search(model):
    """Beam 1 must equal greedy; beams stay sorted and improve on greedy
    total logprob."""
    from pipeinfer_tpu.tools.beam_search import beam_search
    from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample

    params, cfg = model
    prompt = [5, 9, 23]

    ctx = InferenceContext(params, cfg, n_cells=128, cache_dtype=jnp.float32)
    beams = beam_search(ctx, prompt, 8, n_beams=1, eos_id=-1, topk=None)
    assert len(beams) == 1

    ctx2 = InferenceContext(params, cfg, n_cells=128, cache_dtype=jnp.float32)
    st = SamplerState(params=SamplingParams(temp=0.0))
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx2.decode(b)
    greedy = []
    pos = len(prompt)
    lg = logits[-1]
    for _ in range(8):
        tok = sample(st, lg)
        greedy.append(tok)
        b.clear(); b.add(tok, pos, 0); lg = ctx2.decode(b)[0]; pos += 1
    assert beams[0][1] == greedy

    ctx3 = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    beams4 = beam_search(ctx3, prompt, 8, n_beams=4, eos_id=-1, topk=None)
    assert len(beams4) == 4
    scores = [s for s, _ in beams4]
    assert scores == sorted(scores, reverse=True)
    assert beams4[0][0] >= beams[0][0] - 1e-4  # beam>=greedy
