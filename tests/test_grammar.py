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
