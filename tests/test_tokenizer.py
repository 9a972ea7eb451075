"""Tokenizer parity against the reference implementation (compiled oracle),
using the reference's checked-in vocab fixtures
(ref test strategy: tests/test-tokenizer-0-llama.cpp with models/ggml-vocab-*.gguf)."""

from pathlib import Path

import pytest

from pipeinfer_tpu.gguf import GGUFReader
from pipeinfer_tpu.tokenizer import tokenizer_from_gguf

from . import oracle

LLAMA_VOCAB = Path("/root/reference/models/ggml-vocab-llama.gguf")

# Same flavor of coverage as the reference tokenizer tests: ascii, leading
# spaces, punctuation, unicode, emoji/byte-fallback, mixed scripts.
TEXTS = [
    "",
    " ",
    "  ",
    "\t",
    "Hello world",
    " Hello world",
    "Hello World!",
    " this is 🦙.cpp",
    "w048 7tuijk dsdfhu",
    "нещо на Български",
    "かたちづくり",
    "Hello, y'all! How are you 😁 ?",
    "3.14159 26535",
    "  spaced   out  ",
    "CamelCaseTest and_underscores",
    "ümlaut Ünïcode",
]


@pytest.fixture(scope="module")
def spm():
    if not LLAMA_VOCAB.exists():
        pytest.skip("reference vocab fixture unavailable")
    with GGUFReader(LLAMA_VOCAB) as r:
        return tokenizer_from_gguf(r)


def test_spm_parity_with_reference(spm):
    want = oracle.ref_tokenize(str(LLAMA_VOCAB), TEXTS, add_bos=True)
    if want is None:
        pytest.skip("tokenizer oracle unavailable")
    for text, expected in zip(TEXTS, want):
        got = spm.encode(text, add_bos=True)
        assert got == expected, f"mismatch for {text!r}: got {got}, want {expected}"


def test_spm_round_trip(spm):
    for text in ["Hello world", "a b  c", "🦙 llama", "tab\tchar"]:
        ids = spm.encode(text, add_bos=False)
        # SPM round trip re-adds the leading space
        assert spm.decode(ids) == " " + text.replace("\t", "\t")


def test_byte_fallback(spm):
    ids = spm.encode("🦙", add_bos=False)
    assert all(i >= 0 for i in ids)
    assert spm.decode(ids).strip() == "🦙"


def test_special_token_splitting(spm):
    ids = spm.encode("hi <s> there", add_bos=False, special=True)
    assert spm.vocab.bos_id in ids


FALCON_VOCAB = Path("/root/reference/models/ggml-vocab-falcon.gguf")
BPE_TEXTS = [
    "Hello world",
    " Hello world",
    "Hello World!",
    "w048 7tuijk dsdfhu",
    "нещо на Български",
    "3.14159 26535",
    "  spaced   out  ",
    "CamelCaseTest and_underscores",
    "don't stop believin'",
]


@pytest.fixture(scope="module")
def bpe():
    if not FALCON_VOCAB.exists():
        pytest.skip("falcon vocab fixture unavailable")
    with GGUFReader(FALCON_VOCAB) as r:
        return tokenizer_from_gguf(r)


def test_bpe_parity_with_reference(bpe):
    want = oracle.ref_tokenize(str(FALCON_VOCAB), BPE_TEXTS, add_bos=False)
    if want is None:
        pytest.skip("tokenizer oracle unavailable")
    for text, expected in zip(BPE_TEXTS, want):
        got = bpe.encode(text, add_bos=False)
        assert got == expected, f"BPE mismatch for {text!r}: got {got}, want {expected}"


def test_bpe_round_trip(bpe):
    for text in BPE_TEXTS:
        ids = bpe.encode(text, add_bos=False)
        assert bpe.decode(ids) == text


# full fixture matrix, mirroring the reference's tokenizer test list
# (tests/CMakeLists.txt:25-40: llama, falcon, aquila, mpt, stablelm,
# gpt-neox, refact, starcoder, baichuan — aquila's fixture is not shipped)
MATRIX = [
    ("ggml-vocab-gpt-neox.gguf", False),
    ("ggml-vocab-mpt.gguf", False),
    ("ggml-vocab-refact.gguf", False),
    ("ggml-vocab-starcoder.gguf", False),
    ("ggml-vocab-stablelm-3b-4e1t.gguf", False),
    ("ggml-vocab-baichuan.gguf", True),  # SPM family
]


@pytest.mark.parametrize("fixture,add_bos", MATRIX)
def test_tokenizer_matrix_parity(fixture, add_bos):
    path = Path("/root/reference/models") / fixture
    if not path.exists():
        pytest.skip("fixture unavailable")
    with GGUFReader(path) as r:
        tok = tokenizer_from_gguf(r)
    texts = BPE_TEXTS
    want = oracle.ref_tokenize(str(path), texts, add_bos=add_bos)
    if want is None:
        pytest.skip("tokenizer oracle unavailable")
    for text, expected in zip(texts, want):
        # the oracle tokenizes with specials OFF (test-tokenizer-0 calls
        # llama_tokenize without special parsing); gpt-neox/mpt/stablelm
        # type their added whitespace-run tokens CONTROL, which our
        # special cache would otherwise match
        got = tok.encode(text, add_bos=add_bos, special=False)
        assert got == expected, f"{fixture}: mismatch for {text!r}: got {got}, want {expected}"
