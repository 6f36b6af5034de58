"""Slop phrase matching on realistic documents (reference: test_slop_matches.py)."""
import numpy as np
import pytest

from searcharray_tpu import SearchArray

DOC_CRITTERS = (
    "A massive ball of furry creatures from another world eat their way "
    "through a small mid-western town followed by intergalactic bounty "
    "hunters opposed only by militant townspeople."
)
DOC_NYE = (
    "Broke and alone on New Year's Eve, Wilson just wants to spend the rest "
    "of a very bad year in bed. But, when his best friend convinces him to "
    "post a personal ad, he meets a woman bent on finding the right guy to "
    "be with at midnight."
)
DOC_MURDERS = (
    "A series of hideous murders is taking place, and Inspector Capell and "
    "cop-turned-novelist Lonergan are investigating. The murders are found "
    "to be the work of an out-of-control experiment in genetic engineering. "
    "The two men must descend into the city's sewer systems to destroy the "
    "horrific miscreation. It won't be hard to find, as it's already looking "
    "for its next victims..."
)
DOC_DUNE = (
    "In the year 10,191, the world is at war for control of the desert planet "
    "Dune—the only place where the time-travel substance spice can be found "
    "But when one leader gives up control, it's only so he can stage a coup "
    "with some unsavory characters."
)

SLOP_CASES = {
    "exact_phrase_at_slop0": ("intergalactic bounty hunters", DOC_CRITTERS, 0, True),
    "one_gap": ("massive ball furry", DOC_CRITTERS, 1, True),
    "two_gaps": ("the to be", DOC_NYE, 2, True),
    "reordered": ("the to be", DOC_MURDERS, 3, True),
    # "the" occurs at positions 18/24/35/41/48 in DOC_MURDERS; a pair within
    # window width n+slop-1 exists from slop 5 on (35..41). (The reference
    # matched "the the the" at slop 3 only via its span-automaton position
    # leak — see spans.py docstring; we enforce the sound width bound.)
    "same_term_pair": ("the the", DOC_MURDERS, 5, True),
    "same_term_far_apart_no_match": ("the the the", DOC_MURDERS, 3, False),
    "slop_5": ("spice found substance", DOC_DUNE, 5, True),
    "slop_5_len_5": ("spice found substance can be", DOC_DUNE, 5, True),
    "no_match": ("there is no match for this", DOC_DUNE, 5, False),
}


def simple_tokenizer(text):
    import re

    return re.sub(r"[^\w\s]", " ", text.replace("—", " ")).lower().split()


@pytest.mark.parametrize("name", list(SLOP_CASES))
def test_slop_scenarios(name):
    phrase, doc, slop, match = SLOP_CASES[name]
    sa = SearchArray.index([doc, " empty ", doc + " " + doc, " empty"] * 100,
                           tokenizer=simple_tokenizer)
    toks = simple_tokenizer(phrase)
    for s in range(slop, max(slop, 10)):
        scores = sa.score(toks, slop=s)
        if match:
            assert np.all(scores[::2] > 0), f"slop {s}"
        else:
            assert np.all(scores[::2] == 0), f"slop {s}"
        assert np.all(scores[1::2] == 0), f"slop {s} matched empty doc"


def test_slop_cross_block_boundary():
    # phrase terms on both sides of the 18-position block boundary
    for off in (14, 15, 16, 17, 18):
        doc = " ".join(["pad"] * off) + " alpha gap gap beta"
        sa = SearchArray.index([doc, "nothing here"])
        got = sa.termfreqs(["alpha", "beta"], slop=2)
        assert got[0] > 0 and got[1] == 0, f"offset {off}"


def test_slop_zero_equals_exact():
    docs = SearchArray.index(
        ["foo bar baz qux", "foo baz bar qux", "bar foo"] * 10
    )
    exact = docs.termfreqs(["foo", "bar"])
    slop0 = docs.termfreqs(["foo", "bar"], slop=0)
    assert np.array_equal(exact, slop0)


def test_same_term_within_window():
    docs = SearchArray.index(
        ["dig the well the whole the way down", "no such words"] * 10
    )
    got = docs.termfreqs(["the", "the", "the"], slop=2)  # width <= 4: posns 1,3,5
    assert np.all(got[::2] > 0) and np.all(got[1::2] == 0)
    got1 = docs.termfreqs(["the", "the", "the"], slop=1)  # width <= 3: no
    assert np.all(got1 == 0)


def test_width_bound_is_sound():
    # The reference automaton would match these via its position-bit leak;
    # we enforce the documented width bound (span width < n + slop).
    docs = SearchArray.index(["foo " + " ".join(["x"] * 49) + " bar"])
    assert docs.termfreqs(["foo", "bar"], slop=1)[0] == 0
    assert docs.termfreqs(["foo", "bar"], slop=9)[0] == 0
    assert docs.termfreqs(["foo", "bar"], slop=49)[0] == 1


def test_unordered_within_window():
    # slop search is unordered: reversed pair within width
    docs = SearchArray.index(["beta alpha", "alpha beta", "beta gap gap gap alpha"])
    got = docs.termfreqs(["alpha", "beta"], slop=1)
    assert got[0] > 0 and got[1] > 0 and got[2] == 0
    got3 = docs.termfreqs(["alpha", "beta"], slop=4)
    assert got3[2] > 0


def test_dense_slop_matches_sparse_kernel():
    """The dense dilation path must equal the windowed gather kernel on a
    randomized corpus, including cross-block windows."""
    import numpy as np
    import pytest

    from searcharray_tpu import SearchArray
    from searcharray_tpu.search import dense as dense_mod

    rng = np.random.default_rng(9)
    vocab = ["a", "b", "c", "d", "e"] + [f"x{i}" for i in range(50)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 80)))
        for _ in range(500)
    ]
    arr = SearchArray.index(docs)
    for q, slop in ((["a", "b"], 1), (["a", "b"], 5), (["a", "b", "c"], 3),
                    (["d", "e"], 15), (["a", "c", "e"], 10)):
        dense_scores = arr.termfreqs(q, slop=slop)
        with pytest.MonkeyPatch.context() as m:
            m.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
            sparse_scores = arr.termfreqs(q, slop=slop)
        np.testing.assert_allclose(dense_scores, sparse_scores, rtol=1e-6,
                                   err_msg=f"{q} slop={slop}")
        assert dense_scores.sum() > 0


def test_dense_slop_repeated_terms_matches_sparse():
    """Multiplicity-2 slop (repeated query terms, e.g. stopword-ish
    phrases) must take the dense pair-dilation path and agree with the
    windowed gather kernel."""
    import numpy as np
    import pytest

    from searcharray_tpu import SearchArray
    from searcharray_tpu.search import dense as dense_mod

    rng = np.random.default_rng(17)
    vocab = ["a", "b", "c"] + [f"x{i}" for i in range(20)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 80)))
        for _ in range(400)
    ]
    docs.append("a b a")
    docs.append("a x0 x1 b x2 a")
    arr = SearchArray.index(docs)
    for q, slop in ((["a", "b", "a"], 1), (["a", "b", "a"], 4),
                    (["a", "a"], 2), (["b", "a", "b", "a"], 6),
                    (["c", "c", "c"], 5)):
        dense_scores = arr.termfreqs(q, slop=slop)
        with pytest.MonkeyPatch.context() as m:
            m.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
            sparse_scores = arr.termfreqs(q, slop=slop)
        np.testing.assert_allclose(dense_scores, sparse_scores, rtol=1e-6,
                                   err_msg=f"{q} slop={slop}")
        assert dense_scores.sum() > 0, f"{q} slop={slop}"
