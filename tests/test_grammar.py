"""GBNF parser + grammar PDA tests (ref strategy: tests/test-grammar-parser.cpp
and tests/test-llama-grammar.cpp), using the reference's example grammars as
inputs."""

from pathlib import Path

import numpy as np
import pytest

from pipeinfer_tpu.sampling.gbnf_parser import parse_gbnf
from pipeinfer_tpu.sampling.grammar import GrammarState, _Machine

GRAMMARS = Path("/root/reference/grammars")


def _accepts(g: GrammarState, text: str) -> bool:
    st = g.copy()
    for ch in text:
        st.stacks = st.machine.accept_char(st.stacks, ord(ch))
        if not st.stacks:
            return False
    return st.complete


def _state(gbnf: str, pieces=None) -> GrammarState:
    pieces = pieces or [chr(c) for c in range(128)]
    return GrammarState.from_gbnf(gbnf, pieces, eos_id=0)


def test_literal_sequence():
    g = _state('root ::= "ab" "c"')
    assert _accepts(g, "abc")
    assert not _accepts(g, "ab")
    assert not _accepts(g, "abcd")
    assert not _accepts(g, "abd")


def test_alternates_and_class():
    g = _state('root ::= ("x" | [0-9]+) "!"')
    assert _accepts(g, "x!")
    assert _accepts(g, "123!")
    assert not _accepts(g, "!")
    assert not _accepts(g, "x9!")


def test_star_and_optional():
    g = _state('root ::= "a"* "b"?')
    for ok in ["", "a", "aaa", "b", "aab"]:
        assert _accepts(g, ok), ok
    assert not _accepts(g, "ba")


def test_negated_class_and_escapes():
    g = _state('root ::= [^"\\\\]+')
    assert _accepts(g, "hello")
    assert not _accepts(g, 'he"llo')


def test_rule_refs_recursive():
    g = _state('root ::= expr\nexpr ::= "(" expr ")" | "x"')
    assert _accepts(g, "x")
    assert _accepts(g, "((x))")
    assert not _accepts(g, "((x)")


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"a": 1}', True),
        ('{"a": [1, 2.5, -3e4], "b": {"c": "d"}}', True),
        ('{"a": tru}', False),
        ("[1, 2]", False),  # json.gbnf root is an object
        ('{"s": "\\u00ff"}', True),
    ],
)
def test_reference_json_grammar(text, ok):
    gbnf = (GRAMMARS / "json.gbnf").read_text()
    g = _state(gbnf)
    assert _accepts(g, text) == ok, text


def test_reference_grammars_parse():
    for path in sorted(GRAMMARS.glob("*.gbnf")):
        g = parse_gbnf(path.read_text())
        m = _Machine(g)
        assert m.init_stacks(), path.name


def test_mask_logits_json():
    gbnf = (GRAMMARS / "json.gbnf").read_text()
    pieces = [chr(c) for c in range(128)]
    g = GrammarState.from_gbnf(gbnf, pieces, eos_id=0)
    logits = np.zeros(128, np.float32)
    masked = g.mask_logits(logits)
    assert masked[ord("{")] == 0.0  # object must start with {
    assert masked[ord("[")] == -np.inf
    assert masked[ord("a")] == -np.inf
    assert masked[0] == -np.inf  # EOS not allowed before completion
    # walk '{ }' and then EOS becomes legal (after ws)
    g.accept_token(ord("{"))
    g.accept_token(ord("}"))
    m2 = g.mask_logits(logits)
    assert m2[0] == 0.0


def test_constrained_sampling_end_to_end():
    """Grammar plugged into the sampler chain forces valid output."""
    from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample

    gbnf = 'root ::= [0-9] [0-9]'
    pieces = [chr(c) for c in range(128)]
    g = GrammarState.from_gbnf(gbnf, pieces, eos_id=0)
    st = SamplerState(params=SamplingParams(temp=0.8, top_k=0, seed=42), grammar=g)
    rng = np.random.default_rng(0)
    out = []
    for _ in range(2):
        logits = rng.standard_normal(128).astype(np.float32) * 3
        t = sample(st, logits)
        st.accept(t)
        out.append(chr(t))
    assert all(c.isdigit() for c in out), out
    assert st.grammar.complete


# ---------------------------------------------------------------------------
# grammar x speculation: async + sync speculative decoding under a grammar
# must be token-exact vs plain grammar-constrained decoding
# (ref: speculative.cpp:1234-1245 snapshots grammar sampler state per run)
# ---------------------------------------------------------------------------


def _spec_grammar_setup(tmp_path_factory):
    import jax.numpy as jnp

    from pipeinfer_tpu.models import load_model
    from pipeinfer_tpu.runtime.context import Batch, InferenceContext
    from pipeinfer_tpu.tools import testmodel

    cfg = dict(n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2, n_ff=256, n_vocab=160)
    path = tmp_path_factory.mktemp("gramspec") / "tgt.gguf"
    testmodel.build_tiny_llama(path, seed=11, **cfg)
    return load_model(path)


def _ascii_grammar(gbnf, n_vocab=160):
    # ids >= 128 get unmatchable multi-byte pieces so the grammar masks them
    pieces = [chr(c) for c in range(128)] + ["§"] * (n_vocab - 128)
    return GrammarState.from_gbnf(gbnf, pieces, eos_id=0)


def test_speculation_under_grammar_token_exact(tmp_path_factory):
    import jax.numpy as jnp

    from pipeinfer_tpu.runtime.context import Batch, InferenceContext
    from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample
    from pipeinfer_tpu.spec.controller import PipeInferController
    from pipeinfer_tpu.spec.params import SpecParams
    from pipeinfer_tpu.spec.sync_spec import SyncSpeculator

    params, cfg = _spec_grammar_setup(tmp_path_factory)
    gbnf = r'root ::= ("ab" | "ba" | [0-9] [0-9]?)+'
    prompt = [3, 17, 42, 7]
    n_predict = 20

    def make_ctx():
        return InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)

    # plain grammar-constrained greedy decode (the oracle)
    ctx = make_ctx()
    st = SamplerState(params=SamplingParams(temp=0.0), grammar=_ascii_grammar(gbnf))
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    want = []
    n_past = len(prompt)
    for _ in range(n_predict):
        tok = sample(st, logits)
        st.accept(tok)
        want.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1
    assert all(t < 128 for t in want), "grammar failed to constrain the oracle"

    sp = SpecParams(n_draft=4, n_parallel=2, p_accept=0.0, max_inflight=3)
    sync = SyncSpeculator(
        make_ctx(), make_ctx(), SamplingParams(temp=0.0), sp,
        eos_id=-1, grammar=_ascii_grammar(gbnf),
    )
    got_sync = sync.generate(list(prompt), n_predict)
    assert got_sync == want, f"sync spec under grammar diverges: {got_sync} vs {want}"
    assert sync.stats.n_accept > 0

    c = PipeInferController(
        make_ctx(), make_ctx(), SamplingParams(temp=0.0), sp,
        eos_id=-1, grammar=_ascii_grammar(gbnf),
    )
    assert c.topk is None, "sparse head must be disabled under a grammar"
    got_async = c.generate(list(prompt), n_predict)
    assert got_async == want, f"async spec under grammar diverges: {got_async} vs {want}"
    assert c.stats.n_accept > 0
