"""Native (C++) vs Python tokenizer parity.

The C++ tokenizer (native/indexer.cpp) is byte-oriented; the builder must
route any non-ASCII doc through the Python tokenizer so indexing never
depends on whether g++ was available (reference behavior is defined by
str.split()/str.lower(): /root/reference/searcharray/postings.py:206-211).
"""
import numpy as np
import pytest

from searcharray_tpu.index import builder as B
from searcharray_tpu.index import native as native_mod
from searcharray_tpu.index.builder import build_index, std_tokenizer, ws_tokenizer

MIXED_CORPUS = [
    "the quick brown fox",
    "CAFÉ au lait",                      # uppercase accented: lower() -> café
    "unicode whitespace here",  # NBSP + em-space split by str.split
    "ascii UPPER lower 123",
    "emoji 🦖 token",
    "ascii\x1cseparators\x1dhere",        # \x1c-\x1f are Python whitespace
    "",
    "punct,strip.me!now",
]


def _term_vectors(built):
    """doc -> sorted term strings, for cross-build comparison."""
    out = []
    for d in range(built.corpus_size):
        out.append(sorted(
            built.vocab.get_term(int(tid))
            for tid in built.doc_term.row_terms(d)
        ))
    return out


def _force_python(monkeypatch):
    monkeypatch.setattr(native_mod, "native_available", lambda: False)
    monkeypatch.setattr(native_mod, "tokenize_corpus",
                        lambda *a, **k: None)
    monkeypatch.setattr(native_mod, "sort_by_term", lambda *a, **k: None)
    monkeypatch.setattr(native_mod, "invert_encode", lambda *a, **k: None)


@pytest.mark.parametrize("tokenizer", [ws_tokenizer, std_tokenizer],
                         ids=["ws", "std"])
def test_native_matches_python_on_mixed_corpus(monkeypatch, tokenizer):
    if not native_mod.native_available():
        pytest.skip("no native library (g++ unavailable)")
    b_native = build_index(MIXED_CORPUS, tokenizer=tokenizer)
    with monkeypatch.context() as m:
        _force_python(m)
        b_python = build_index(MIXED_CORPUS, tokenizer=tokenizer)
    assert _term_vectors(b_native) == _term_vectors(b_python)
    np.testing.assert_array_equal(b_native.doc_lens, b_python.doc_lens)
    # posting wire words must be identical term-by-term
    for tid_n in range(len(b_native.vocab)):
        term = b_native.vocab.get_term(tid_n)
        tid_p = b_python.vocab.get_term_id(term)
        np.testing.assert_array_equal(
            b_native.postings.term_slice(tid_n),
            b_python.postings.term_slice(tid_p), err_msg=term)


def test_accented_lowercase_matches_query_tokenization():
    """'CAFÉ' must index as 'café' so query-time tokenization matches."""
    built = build_index(["CAFÉ ole", "nothing here"], tokenizer=std_tokenizer)
    q = std_tokenizer("CAFÉ")
    assert q == ["café"]
    assert built.vocab.get_term_id("café") >= 0


def test_ascii_control_whitespace_parity():
    """\\x1c-\\x1f are whitespace to str.split(); C++ must agree."""
    docs = ["a\x1cb\x1dc\x1ed\x1fe"]
    built = build_index(docs, tokenizer=ws_tokenizer)
    assert built.doc_lens[0] == 5.0


def test_mixed_batch_stitches_doc_order(monkeypatch):
    """Interleaved ASCII / non-ASCII docs keep correct doc ids."""
    docs = ["alpha beta", "naïve café", "gamma", "Ωmega prime", "delta"]
    b_mixed = build_index(docs, tokenizer=ws_tokenizer)
    with monkeypatch.context() as m:
        _force_python(m)
        b_py = build_index(docs, tokenizer=ws_tokenizer)
    np.testing.assert_array_equal(b_mixed.doc_lens, b_py.doc_lens)
    assert _term_vectors(b_mixed) == _term_vectors(b_py)
