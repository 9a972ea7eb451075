"""Interactive / instruct chat loop mechanics (ref: examples/main/main.cpp
interactive mode: -i, --interactive-first, -r antiprompts, --instruct).
Scripted stdin via an injected input_fn; greedy sampling for determinism."""

import argparse
from pathlib import Path

import pytest

from pipeinfer_tpu.cli.main import generate, interactive_loop
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams
from pipeinfer_tpu.tokenizer import tokenizer_from_gguf
from pipeinfer_tpu.gguf.reader import GGUFReader
from pipeinfer_tpu.tools import testmodel

VOCAB = "/root/reference/models/ggml-vocab-llama.gguf"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("imodel") / "tiny.gguf"
    testmodel.build_tiny_llama(
        path, seed=9, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        n_ff=128, vocab_from=VOCAB,
    )
    params, cfg = load_model(path)
    with GGUFReader(path) as r:
        tok = tokenizer_from_gguf(r)
    return params, cfg, tok


def make_ctx(setup):
    params, cfg, _ = setup
    import jax.numpy as jnp

    return InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)


def args_ns(**kw):
    base = dict(
        interactive=True, interactive_first=False, instruct=False,
        chatml=False, reverse_prompt=[], in_prefix="", in_suffix="",
        input_prefix_bos=False, keep=-1, n_predict=4, ignore_eos=False,
        color=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0)


def scripted(lines):
    it = iter(lines)

    def fn():
        try:
            return next(it)
        except StopIteration:
            raise EOFError

    return fn


def test_turn_budget_and_eof(setup):
    """Each turn generates n_predict tokens, then control returns; EOF ends."""
    _, _, tok = setup
    ctx = make_ctx(setup)
    prompt = tok.encode("Once upon", add_bos=True)
    out = interactive_loop(
        ctx, tok, SamplerState(params=GREEDY), prompt,
        args_ns(n_predict=4), input_fn=scripted(["hello there", ""]),
        write=lambda s: None,
    )
    # 3 turns (initial gen + 1 input + 1 empty pass-back), 4 tokens each,
    # unless EOS lands early
    assert 4 <= len(out) <= 12
    eos = tok.vocab.eos_id
    body = [t for t in out if t != eos]
    assert len(body) >= 4 or eos in out


def test_matches_plain_generate_first_turn(setup):
    """Before any user input, the interactive loop greedy-decodes exactly
    the tokens plain generate() produces."""
    _, _, tok = setup
    prompt = tok.encode("The quick brown", add_bos=True)

    ctx1 = make_ctx(setup)
    ref = generate(ctx1, tok, SamplerState(params=GREEDY), prompt, 6)

    ctx2 = make_ctx(setup)
    out = interactive_loop(
        ctx2, tok, SamplerState(params=GREEDY), prompt,
        args_ns(n_predict=6), input_fn=scripted([]), write=lambda s: None,
    )
    k = min(len(ref), len(out))
    assert out[:k] == ref[:k]


def test_reverse_prompt_stops_generation(setup):
    """An antiprompt equal to the first generated piece pauses after it."""
    _, _, tok = setup
    prompt = tok.encode("Hello", add_bos=True)

    ctx1 = make_ctx(setup)
    ref = generate(ctx1, tok, SamplerState(params=GREEDY), prompt, 8)
    first_piece = tok.decode(ref[:1])
    if not first_piece.strip():
        pytest.skip("first greedy piece is whitespace; antiprompt ambiguous")

    ctx2 = make_ctx(setup)
    out = interactive_loop(
        ctx2, tok, SamplerState(params=GREEDY), prompt,
        args_ns(n_predict=8, reverse_prompt=[first_piece]),
        input_fn=scripted([]), write=lambda s: None,
    )
    # stopped at the reverse prompt, long before the 8-token budget
    assert len(out) < 8
    assert first_piece in tok.decode(out)


def test_instruct_mode_wraps_input(setup):
    """Instruct mode: '> ' prompt is shown, the Response suffix is decoded
    after each user line, and generation continues deterministically."""
    _, _, tok = setup
    ctx = make_ctx(setup)
    prompt = tok.encode("Below is an instruction.", add_bos=True)
    writes = []
    out = interactive_loop(
        ctx, tok, SamplerState(params=GREEDY), prompt,
        args_ns(instruct=True, interactive_first=True, n_predict=3),
        input_fn=scripted(["Say hi.", "And again."]), write=writes.append,
    )
    joined = "".join(writes)
    assert "> " in joined
    assert len(out) >= 3
    # instruct consumed two turns: prompt + wrapped inputs all fit in cells
    assert ctx.n_free_cells > 0


def test_in_prefix_suffix_and_bos(setup):
    _, _, tok = setup
    ctx = make_ctx(setup)
    prompt = tok.encode("Chat:", add_bos=True)
    writes = []
    out = interactive_loop(
        ctx, tok, SamplerState(params=GREEDY), prompt,
        args_ns(n_predict=2, in_prefix="User: ", in_suffix="Bot: ",
                input_prefix_bos=True),
        input_fn=scripted(["question?"]), write=writes.append,
    )
    joined = "".join(writes)
    assert "User: " in joined and "Bot: " in joined
    assert len(out) >= 2
