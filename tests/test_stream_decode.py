"""UTF-8-safe incremental detokenization + byte-accurate grammar matching
(ref: the server buffers incomplete UTF-8 before SSE chunks,
examples/server/server.cpp; grammar partial_utf8 carry, llama.cpp)."""

from pathlib import Path

import pytest

from pipeinfer_tpu.gguf import GGUFReader
from pipeinfer_tpu.sampling.grammar import GrammarState
from pipeinfer_tpu.tokenizer import tokenizer_from_gguf
from pipeinfer_tpu.tokenizer.stream import StreamDecoder, complete_utf8_prefix

LLAMA_VOCAB = Path("/root/reference/models/ggml-vocab-llama.gguf")


@pytest.fixture(scope="module")
def spm():
    if not LLAMA_VOCAB.exists():
        pytest.skip("reference vocab fixture unavailable")
    with GGUFReader(LLAMA_VOCAB) as r:
        return tokenizer_from_gguf(r)


def test_complete_utf8_prefix():
    emoji = "🦙".encode()  # 4 bytes
    assert complete_utf8_prefix(emoji) == 4
    for cut in (1, 2, 3):
        assert complete_utf8_prefix(emoji[:cut]) == 0
    assert complete_utf8_prefix(b"ab" + emoji[:2]) == 2
    assert complete_utf8_prefix(b"hello") == 5
    # invalid bytes are passed through (decode will replace them)
    assert complete_utf8_prefix(b"\xff\xff") == 2
    two = "é".encode()  # 2-byte char
    assert complete_utf8_prefix(b"x" + two[:1]) == 1
    assert complete_utf8_prefix(b"x" + two) == 3


def test_stream_decoder_no_mojibake(spm):
    """Feeding the byte-fallback tokens of an emoji one at a time must emit
    nothing until the final byte, then the full character."""
    ids = spm.encode("🦙", add_bos=False)
    assert len(ids) >= 4  # leading-space piece + 4 byte tokens
    sdec = StreamDecoder(spm)
    out = "".join(sdec.feed(t) for t in ids)
    assert "�" not in out
    assert out.strip() == "🦙"
    assert sdec.flush() == ""


def test_stream_decoder_matches_decode(spm):
    for text in ["Hello 🦙 world", "かたちづくり", "нещо", "mixed 😁 emoji"]:
        ids = spm.encode(text, add_bos=False)
        sdec = StreamDecoder(spm)
        streamed = "".join(sdec.feed(t) for t in ids) + sdec.flush()
        assert streamed == spm.decode(ids)


def test_piece_bytes_byte_token(spm):
    ids = spm.encode("🦙", add_bos=False)
    raw = b"".join(spm.piece_bytes(t) for t in ids)
    assert "🦙".encode() in raw


def test_grammar_split_utf8_token(spm):
    """A grammar requiring a multi-byte character must accept the byte
    tokens one by one (partial carry) and reject wrong continuations."""
    gbnf = 'root ::= "a" [à-ÿ] "b"'
    g = GrammarState.from_gbnf(
        gbnf,
        [spm.piece_bytes(i) for i in range(spm.vocab.n_vocab)],
        eos_id=spm.vocab.eos_id,
    )
    # "aàb" tokenizes with à possibly split into byte tokens; drive with
    # explicit byte-fallback ids to force the partial path.
    by = {bytes([b]): None for b in range(256)}
    byte_ids = {}
    for i in range(spm.vocab.n_vocab):
        pb = spm.piece_bytes(i)
        if len(pb) == 1 and pb in by and byte_ids.get(pb) is None:
            byte_ids[pb] = i
    a_id = byte_ids[b"a"]
    b_id = byte_ids[b"b"]
    aa = "à".encode()  # c3 a0
    lead, cont = byte_ids[aa[:1]], byte_ids[aa[1:]]

    st = g.copy()
    assert st.allows_token(a_id)
    st.accept_token(a_id)
    assert st.allows_token(lead)  # incomplete tail optimistically allowed
    st.accept_token(lead)
    assert st.partial == aa[:1]
    assert not st.complete
    assert st.allows_token(cont)
    # a continuation forming a codepoint outside the class must be rejected
    bad_cont = byte_ids[bytes([0x80])]
    assert not st.allows_token(bad_cont)
    # a lead byte while a partial is pending is invalid UTF-8 here
    assert not st.allows_token(a_id)
    st.accept_token(cont)
    assert st.partial == b""
    st.accept_token(b_id)
    assert st.complete


def test_grammar_rejects_bad_continuation_in_tail(spm):
    """A non-continuation byte directly after a lead byte is invalid even
    while the sequence is still incomplete (ref decode_utf8 semantics):
    without this, sampling could walk into a dead-end partial state."""
    g = GrammarState.from_gbnf(
        'root ::= "🦙"',
        [spm.piece_bytes(i) for i in range(spm.vocab.n_vocab)],
        eos_id=spm.vocab.eos_id,
    )
    ids = [t for t in spm.encode("🦙", add_bos=False)
           if spm.piece_bytes(t) not in (b"", b" ")]
    assert len(ids) == 4
    g.accept_token(ids[0])  # lead byte 0xf0 pending
    ascii_a = next(i for i in range(spm.vocab.n_vocab) if spm.piece_bytes(i) == b"a")
    assert not g.allows_token(ascii_a)
    for t in ids[1:]:
        assert g.allows_token(t)
        g.accept_token(t)
    assert g.complete
