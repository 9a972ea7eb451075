"""JSON-schema -> GBNF converter + checked-in sample grammars: generated
grammars must parse with the engine and accept/reject byte strings
correctly (ref: examples/json-schema-to-grammar.py; grammars/)."""

from pathlib import Path

import pytest

from pipeinfer_tpu.sampling.gbnf_parser import parse_gbnf
from pipeinfer_tpu.sampling.grammar import _Machine
from pipeinfer_tpu.tools.json_schema import schema_to_gbnf

GRAMMARS_DIR = Path(__file__).resolve().parent.parent / "grammars"


def _accepts(gbnf: str, text: str) -> bool:
    g = parse_gbnf(gbnf)
    m = _Machine(g)
    stacks = m.init_stacks()
    for ch in text:
        stacks = m.accept_char(stacks, ord(ch))
        if not stacks:
            return False
    return any(len(s) == 0 for s in stacks)


SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 2},
        "mode": {"enum": ["fast", "slow"]},
    },
    "required": ["name", "age"],
}


def test_object_schema_accepts_conforming():
    g = schema_to_gbnf(SCHEMA)
    ok = '{ "age" : 3 , "name" : "bo" , "mode" : "fast" , "tags" : [ "a" ] }'
    # property order: alphabetical (age < mode < name < tags), required first
    ok2 = '{ "age" : 41 , "name" : "x" }'
    assert _accepts(g, '{ "age" : 3 , "name" : "bo" }')
    assert _accepts(g, ok2)
    del ok


def test_object_schema_rejects_wrong_types_and_missing():
    g = schema_to_gbnf(SCHEMA)
    assert not _accepts(g, '{ "age" : "three" , "name" : "bo" }')  # wrong type
    assert not _accepts(g, '{ "name" : "bo" }')  # missing required age
    assert not _accepts(g, '{ "age" : 3 , "name" : "bo" , "mode" : "warp" }')


def test_optional_properties_and_bounds():
    g = schema_to_gbnf(SCHEMA)
    assert _accepts(g, '{ "age" : 1 , "name" : "a" , "tags" : [ ] }')
    assert _accepts(g, '{ "age" : 1 , "name" : "a" , "tags" : [ "x" , "y" ] }')
    assert not _accepts(g, '{ "age" : 1 , "name" : "a" , "tags" : [ "x" , "y" , "z" ] }')


def test_prop_order_controls_sequence():
    g = schema_to_gbnf(SCHEMA, prop_order=["name"])
    assert _accepts(g, '{ "name" : "bo" , "age" : 3 }')
    assert not _accepts(g, '{ "age" : 3 , "name" : "bo" }')


def test_oneof_const_ref_prefixitems():
    schema = {
        "$defs": {"coord": {"type": "array",
                            "prefixItems": [{"type": "number"}, {"type": "number"}]}},
        "oneOf": [
            {"const": "origin"},
            {"$ref": "#/$defs/coord"},
        ],
    }
    g = schema_to_gbnf(schema)
    assert _accepts(g, '"origin"')
    assert _accepts(g, "[ 1.5 , -2 ]")
    assert not _accepts(g, "[ 1.5 ]")  # tuple arity fixed
    assert not _accepts(g, '"elsewhere"')


def test_min_items():
    schema = {"type": "array", "items": {"type": "integer"}, "minItems": 2}
    g = schema_to_gbnf(schema)
    assert _accepts(g, "[ 1 , 2 ]")
    assert _accepts(g, "[ 1 , 2 , 3 ]")
    assert not _accepts(g, "[ 1 ]")


def test_all_optional_object():
    """Zero required properties: any SUBSET must be expressible with
    correct commas (regression: the first emitted optional carried a
    leading comma, accepting '{ , \"b\": 1 }' and rejecting '{ \"b\": 1 }')."""
    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "integer"},
                       "c": {"type": "integer"}},
        "required": [],
    }
    g = schema_to_gbnf(schema)
    for ok in ("{ }", '{ "a" : 1 }', '{ "b" : 2 }', '{ "c" : 3 }',
               '{ "a" : 1 , "c" : 3 }', '{ "b" : 2 , "c" : 3 }',
               '{ "a" : 1 , "b" : 2 , "c" : 3 }'):
        assert _accepts(g, ok), ok
    for bad in ('{ , "b" : 2 }', '{ "a" : 1 , }', '{ "c" : 3 , "a" : 1 }'):
        assert not _accepts(g, bad), bad


def test_recursive_ref():
    """Recursive $defs (linked list) must emit a self-referencing rule
    instead of inlining forever (regression: RecursionError)."""
    schema = {
        "$defs": {
            "node": {
                "type": "object",
                "properties": {"v": {"type": "integer"},
                               "next": {"$ref": "#/$defs/node"}},
                "required": ["v"],
            }
        },
        "$ref": "#/$defs/node",
    }
    g = schema_to_gbnf(schema)
    assert _accepts(g, '{ "v" : 1 }')
    assert _accepts(g, '{ "v" : 1 , "next" : { "v" : 2 , "next" : { "v" : 3 } } }')
    assert not _accepts(g, '{ "next" : { "v" : 2 } }')  # missing required v


def test_unconstrained_schema_any_value():
    g = schema_to_gbnf({})
    for text in ('{ "k" : [ 1 , true , null ] }', '"s"', "3.5", "[ ]"):
        assert _accepts(g, text), text


@pytest.mark.parametrize("name,ok,bad", [
    ("json.gbnf", '{ "a": [1, 2.5, "x"], "b": null }', '{ "a": }'),
    ("json_arr.gbnf", '[1, {"k": "v"}, false]', '{"k": 1}'),
    ("arithmetic.gbnf", "x+1*(y-2)=z\n", "x++1=\n"),
    ("list.gbnf", "- one\n- two\n", "* one\n"),
    ("chess.gbnf", "1. e4 e5\n2. Nf3 Nc6\n", "1. z9 e5\n"),
])
def test_sample_grammars(name, ok, bad):
    text = (GRAMMARS_DIR / name).read_text()
    assert _accepts(text, ok), f"{name} should accept {ok!r}"
    assert not _accepts(text, bad), f"{name} should reject {bad!r}"
