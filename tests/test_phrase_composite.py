"""The single-dispatch composite phrase path must match the stepped path."""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import phrase as phrase_mod

CASES = [
    ("foo bar bar baz|data2|data3 bar|bunny funny wunny", "foo bar"),
    ("foo foo foo foo|x", "foo foo"),
    ("foo bar baz foo bar baz|x y", "foo bar baz"),
    ("a b c rare d e|a b c d e|rare a", "a b rare d e"),  # middle-out split
]


# merged-chain (>=3 terms) coverage: directions, middle-out, same-term
# runs, block-boundary adjacency
MERGED_CASES = [
    # l2r (rarest at front)
    ("zzz foo bar|foo bar zzz baz|zzz foo bar baz", "zzz foo bar"),
    # r2l (rarest at tail)
    ("foo bar qqq|foo bar baz|bar qqq", "foo bar qqq"),
    # middle-out (rarest strictly interior, 5 terms)
    ("a b c rare d e|a b rare d e|rare b a|a b c d e", "a b rare d e"),
    # same-term first pair, 3 terms
    ("foo foo bar|foo bar|foo foo foo bar", "foo foo bar"),
    # same-term tail pair (r2l same-term first step)
    ("foo bar bar|bar bar|foo bar bar bar", "foo bar bar"),
    # 4-term repeats
    ("foo bar baz foo bar baz qux|x", "foo bar baz foo"),
]


@pytest.mark.parametrize("corpus,phrase", MERGED_CASES)
def test_merged_chain_matches_stepped(corpus, phrase):
    docs = SearchArray.index(corpus.split("|") * 7)
    toks = phrase.split()
    old = phrase_mod.COMPOSITE_MODE
    try:
        phrase_mod.COMPOSITE_MODE = "never"
        want = docs.termfreqs(toks)
        phrase_mod.COMPOSITE_MODE = "always"
        got = docs.termfreqs(toks)
    finally:
        phrase_mod.COMPOSITE_MODE = old
    assert np.array_equal(got, want), (got[:6], want[:6])


@pytest.mark.parametrize("off", list(range(14, 23)) + [35, 36, 53, 89, 90])
def test_merged_chain_block_boundaries(off):
    doc = " ".join(["pad"] * off) + " alpha beta gamma"
    docs = SearchArray.index([doc, "alpha beta", "no match"] * 5)
    old = phrase_mod.COMPOSITE_MODE
    try:
        phrase_mod.COMPOSITE_MODE = "never"
        want = docs.termfreqs(["alpha", "beta", "gamma"])
        phrase_mod.COMPOSITE_MODE = "always"
        got = docs.termfreqs(["alpha", "beta", "gamma"])
    finally:
        phrase_mod.COMPOSITE_MODE = old
    assert np.array_equal(got, want), f"offset {off}"
    assert got[0] == 1


def test_merged_chain_random_differential():
    rng = np.random.default_rng(9)
    vocab = ["a", "b", "c", "d"]
    corpus = [" ".join(rng.choice(vocab, size=rng.integers(1, 60)))
              for _ in range(200)]
    docs = SearchArray.index(corpus)
    old = phrase_mod.COMPOSITE_MODE
    try:
        for phrase in (["a", "b", "c"], ["b", "c", "d", "a"],
                       ["a", "a", "b"], ["c", "b", "b"],
                       ["a", "b", "a", "b"]):
            phrase_mod.COMPOSITE_MODE = "never"
            want = docs.termfreqs(phrase)
            phrase_mod.COMPOSITE_MODE = "always"
            got = docs.termfreqs(phrase)
            assert np.array_equal(got, want), phrase
    finally:
        phrase_mod.COMPOSITE_MODE = old


@pytest.mark.parametrize("corpus,phrase", CASES)
def test_composite_matches_stepped(corpus, phrase):
    docs = SearchArray.index(corpus.split("|") * 10)
    toks = phrase.split()
    old = phrase_mod.COMPOSITE_MODE
    try:
        phrase_mod.COMPOSITE_MODE = "never"
        stepped = docs.termfreqs(toks)
        stepped_score = docs.score(toks)
        phrase_mod.COMPOSITE_MODE = "always"
        comp = docs.termfreqs(toks)
        comp_score = docs.score(toks)
    finally:
        phrase_mod.COMPOSITE_MODE = old
    assert np.array_equal(stepped, comp)
    assert np.allclose(stepped_score, comp_score)


def test_composite_windowed_phrase():
    corpus = ["foo bar bar baz " + " ".join(["boz"] * 25) + " foo bar gap",
              "data2", "data3 bar"] * 10
    docs = SearchArray.index(corpus)
    old = phrase_mod.COMPOSITE_MODE
    try:
        for phrase, win in ((["foo", "bar"], dict(min_posn=0, max_posn=17)),
                            (["foo", "bar"], dict(min_posn=18, max_posn=None)),
                            (["foo", "bar", "gap"], dict(min_posn=18,
                                                         max_posn=None))):
            phrase_mod.COMPOSITE_MODE = "never"
            want = docs.termfreqs(phrase, **win)
            phrase_mod.COMPOSITE_MODE = "always"
            got = docs.termfreqs(phrase, **win)
            assert np.array_equal(got, want), (phrase, win)
    finally:
        phrase_mod.COMPOSITE_MODE = old
