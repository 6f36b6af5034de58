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
