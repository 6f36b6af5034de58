"""Exact phrase matching: semantics table, offset sweeps, invariants.

Covers the same behavior space as the reference's test_phrase_matches.py:
every case's expected counts follow the reference's chained-bigram
semantics (same-term run correction, continuation chaining, middle-out).
"""
import numpy as np
import pytest

from searcharray_tpu import SearchArray

# (corpus docs, phrase, expected counts) — corpus repeated x25 to cross
# batch/vector width edges.
CASES = {
    "single_term": ("foo bar bar baz|data2|data3 bar|bunny funny wunny",
                    "foo", [1, 0, 0, 0]),
    "bigram": ("foo bar bar baz|data2|data3 bar|bunny funny wunny",
               "foo bar", [1, 0, 0, 0]),
    "missing_terms": ("foo bar bar baz|data2|data3 bar|bunny funny wunny",
                      "nope nothere", [0, 0, 0, 0]),
    "and_not_phrase": ("foo bear bar baz|data2|data3 bar|bunny funny wunny",
                       "foo bar", [0, 0, 0, 0]),
    "term_repeats": ("foo foo bar bar baz|data2|data3 bar|bunny funny wunny",
                     "foo bar", [1, 0, 0, 0]),
    "multi_term_one_doc": ("foo bar bar bar foo|data2|data3 bar|bunny funny wunny",
                           "foo bar", [1, 0, 0, 0]),
    "trigram_match": ("foo bar baz baz|data2|data3 bar|bunny funny wunny",
                      "foo bar baz", [1, 0, 0, 0]),
    "trigram_no_match": ("foo bar bar baz|data2|data3 bar|bunny funny wunny",
                         "foo bar baz", [0, 0, 0, 0]),
    "spread_out": ("foo bar EEK foo URG bar baz|data2|data3 bar|bunny funny wunny",
                   "foo bar baz", [0, 0, 0, 0]),
    "same_term": ("foo foo foo|data2|data3 bar|bunny funny wunny",
                  "foo foo", [1, 0, 0, 0]),
    "same_term_prefix": ("foo foo bar|data2|data3 bar|bunny funny wunny",
                         "foo foo bar", [1, 0, 0, 0]),
    "same_term_tail": ("foo bar bar|data2|data3 bar|bunny funny wunny",
                       "foo bar bar", [1, 0, 0, 0]),
    "same_term_tail_x2": ("foo bar bar foo bar bar|data2|data3 bar|bunny funny wunny",
                          "foo bar bar", [2, 0, 0, 0]),
    "same_term_3": ("foo foo foo|data2|data3 bar|bunny funny wunny",
                    "foo foo foo", [1, 0, 0, 0]),
    "same_term_4": ("foo foo foo foo|data2|data3 bar|bunny funny wunny",
                    "foo foo foo foo", [1, 0, 0, 0]),
    "same_term_run_of_4": ("foo foo foo foo|data2|data3 bar|bunny funny wunny",
                           "foo foo", [2, 0, 0, 0]),
    "same_term_run_with_break": ("foo foo foo foo baz foo foo|data2|data3 bar|bunny funny wunny",
                                 "foo foo", [3, 0, 0, 0]),
    "double_double": ("foo foo bar bar|data2|data3 bar|bunny funny wunny",
                      "foo foo bar bar", [1, 0, 0, 0]),
    "repeat_phrase": ("foo bar foo bar|data2|data3 bar|bunny funny wunny",
                      "foo bar", [2, 0, 0, 0]),
    "repeat_trigram": ("foo bar baz foo bar baz|data2|data3 bar|bunny funny wunny",
                       "foo bar baz", [2, 0, 0, 0]),
    "repeat_trigram_tail_differs": ("foo bar baz foo bar buzz|data2|data3 bar|bunny funny wunny",
                                    "foo bar baz", [1, 0, 0, 0]),
    "skewed_lengths": ("foo " + " ".join(["bar"] * 50) + "|data2|data3 bar|bunny funny wunny",
                       "foo bar", [1, 0, 0, 0]),
    "skewed_lengths_small": ("foo " + " ".join(["bar"] * 5) + "|data2|data3 bar|bunny funny wunny",
                             "foo bar", [1, 0, 0, 0]),
    "long_doc": ("foo bar bar baz|data2|data3 bar|bunny funny wunny|"
                 "la ma ta wa ga ao a b c d e f g a be ae i foo bar foo bar",
                 "foo bar", [1, 0, 0, 0, 2]),
    "seven_term_phrase": ("foo la ma bar bar baz|data2 ma ta|data3 bar ma|bunny funny wunny|"
                          "la ma ta wa ga ao a b c d e f g a be ae i la ma ta wa ga ao a foo bar foo bar",
                          "la ma ta wa ga ao a", [0, 0, 0, 0, 2]),
    "many_occurrences": ("foo bar bar baz " + " ".join([" dummy foo bar baz"] * 100)
                         + "|data2|data3 bar|bunny funny wunny foo bar",
                         "foo bar", [101, 0, 0, 1]),
}


def _index(corpus_spec, repeat=25):
    docs = corpus_spec.split("|") * repeat
    return SearchArray.index(docs), repeat


def assert_bigram_superset(docs, phrase, matches):
    """Phrase matches must be a subset of every constituent bigram's matches."""
    phrase_idx = np.flatnonzero(matches > 0)
    for bigram in zip(phrase[:-1], phrase[1:]):
        bigram_idx = np.flatnonzero(docs.termfreqs(list(bigram)) > 0)
        assert np.all(np.isin(phrase_idx, bigram_idx)), f"bigram {bigram}"


def assert_slop_monotone(docs, phrase, matches):
    """Slop-k matches/freqs must be supersets of slop-(k-1) and of exact."""
    phrase_idx = np.flatnonzero(matches > 0)
    last = None
    for slop in range(1, 10):
        freqs = docs.termfreqs(phrase, slop=slop)
        idx = np.flatnonzero(freqs > 0)
        assert np.all(np.isin(phrase_idx, idx)), f"slop {slop} lost exact matches"
        assert np.all(freqs >= matches), f"slop {slop} freq < exact freq"
        if last is not None:
            assert np.all(freqs >= last), f"slop {slop} freq decreased"
        last = freqs


@pytest.mark.parametrize("name", list(CASES))
def test_phrase_semantics(name):
    corpus, phrase, expected = CASES[name]
    docs, repeat = _index(corpus, repeat=1 if name == "many_occurrences" else 25)
    phrase = phrase.split()
    expected = np.asarray(expected * repeat, dtype=np.float32)
    if len(phrase) == 1:
        got = docs.termfreqs(phrase[0]) > 0
        assert np.array_equal(got.astype(np.float32), (expected > 0).astype(np.float32))
        return
    got = docs.termfreqs(phrase)
    assert np.array_equal(got, expected), f"{name}: {got[:8]} != {expected[:8]}"
    assert_bigram_superset(docs, phrase, got)
    assert_slop_monotone(docs, phrase, got)


@pytest.mark.parametrize("name", ["bigram", "trigram_match", "same_term_run_of_4",
                                  "repeat_phrase", "many_occurrences"])
def test_phrase_on_slice(name):
    corpus, phrase, expected = CASES[name]
    docs, repeat = _index(corpus, repeat=1 if name == "many_occurrences" else 25)
    sliced = docs[1::2]
    got = sliced.termfreqs(phrase.split())
    expected = np.asarray(expected * repeat, dtype=np.float32)[1::2]
    assert len(got) == len(sliced)
    assert np.array_equal(got, expected)


SWEEP_PHRASES = ["foo bar baz", "foo bar", "foo foo foo", "foo foo bar",
                 "foo bar bar", "foo bar bar baz buz foo bar",
                 "foo bar bar baz buz foo foo", "foo foo"]
# Offsets crossing the 18-position block boundaries (0..39 covers blocks
# 0->2; 85..99 covers the 90 boundary + tail parity).
SWEEP_OFFSETS = list(range(40)) + list(range(85, 100))


@pytest.mark.parametrize("phrase", SWEEP_PHRASES)
def test_phrase_offset_sweep(phrase):
    toks = phrase.split()
    for off in SWEEP_OFFSETS:
        docs = SearchArray.index([" ".join(["dummy"] * off) + " " + phrase,
                                  "not match"])
        got = docs.termfreqs(toks)
        assert np.array_equal(got, [1, 0]), f"offset {off}: {got}"


@pytest.mark.parametrize("phrase", ["foo bar", "foo bar baz"])
def test_phrase_offset_sweep_many_docs(phrase):
    toks = phrase.split()
    for off in SWEEP_OFFSETS[::3]:
        docs = SearchArray.index(
            ["not match"] * 100 + [" ".join(["dummy"] * off) + " " + phrase]
        )
        got = docs.termfreqs(toks)
        assert np.array_equal(got, [0] * 100 + [1]), f"offset {off}"


@pytest.mark.parametrize("off", [0, 5, 16, 17, 18, 19, 35, 36, 37, 54, 90])
def test_phrase_scattered(off):
    scattered = "foo bar " + " ".join(["dummy"] * off) + " foo bar baz"
    docs = SearchArray.index([scattered, "not match"])
    assert np.array_equal(docs.termfreqs(["foo", "bar"]), [2, 0])


@pytest.mark.parametrize("off", [0, 1, 16, 17, 18, 19, 35, 36, 53, 90])
def test_phrase_scattered_same_term_fill(off):
    scattered = "foo bar " + " ".join(["foo"] * off) + " foo bar baz"
    docs = SearchArray.index([scattered, "not match"] * 50)
    sliced = docs[::2]
    assert np.array_equal(sliced.termfreqs(["foo", "bar"]), [2] * 50)


def test_random_corpus_vs_naive_oracle():
    """Differential test vs a pure-Python overlapping-occurrence counter."""
    rng = np.random.default_rng(0)
    vocab = ["a", "b", "c", "d", "e"]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 60)))
        for _ in range(300)
    ]
    docs = SearchArray.index(corpus)
    for phrase in (["a", "b"], ["b", "c", "d"], ["a", "b", "c", "d"],
                   ["e", "a", "b", "c", "d"]):
        got = docs.termfreqs(phrase)
        for i, doc in enumerate(corpus):
            toks = doc.split()
            naive = sum(
                toks[j : j + len(phrase)] == phrase
                for j in range(len(toks) - len(phrase) + 1)
            )
            assert got[i] == naive, f"{phrase} doc {i}: {got[i]} != {naive}"


def test_too_many_positions_raises():
    from searcharray_tpu.ops.encoding import MAX_POSN

    big = " ".join(["x"] * (MAX_POSN + 5))
    with pytest.raises(ValueError):
        SearchArray.index([big, "ok"])


def test_truncate_allows_long_docs():
    from searcharray_tpu.ops.encoding import MAX_POSN

    big = "foo bar baz " + " ".join(["dummy"] * MAX_POSN) + " tail tail"
    arr = SearchArray.index([big, "not match"], truncate=True)
    assert len(arr) == 2
    got = arr.termfreqs(["foo", "bar", "baz"])
    assert np.array_equal(got, [1, 0])


def test_positions_api():
    docs = SearchArray.index(
        ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25
    )
    positions = docs.positions("bar")
    for idx, posn in enumerate(positions):
        if idx % 4 == 0:
            assert np.array_equal(posn, [1, 2])
        elif idx % 4 == 2:
            assert np.array_equal(posn, [1])
        else:
            assert len(posn) == 0


def test_positions_with_mask():
    docs = SearchArray.index(
        ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25
    )
    positions = docs.positions("bar", np.asarray([True, False, False, False] * 25))
    assert len(positions) == 25
    for posn in positions:
        assert np.array_equal(posn, [1, 2])


def test_trim_spans_narrows_stopwords_and_preserves_results():
    """trim_phrase_search analog (middle_out.py:44-70): terms >20x the
    rarest term pre-slice to its doc-key range, with identical scores."""
    import numpy as np

    from searcharray_tpu import SearchArray
    from searcharray_tpu.search import dense as dense_mod
    from searcharray_tpu.search.phrase import trim_spans

    rng = np.random.default_rng(3)
    docs = []
    for i in range(600):
        words = list(rng.choice(["the", "of", "a"], size=30))
        if i in (100, 400):
            words[5:7] = ["rareterm", "the"]  # phrase "rareterm the"
        docs.append(" ".join(words))
    arr = SearchArray.index(docs)
    dev = arr.dev
    tids = [arr.term_dict.get_term_id(t) for t in ["rareterm", "the"]]
    spans = [dev.term_span(t) for t in tids]
    trimmed = trim_spans(dev, spans)
    assert trimmed[0] == spans[0]  # rarest untouched
    assert trimmed[1][1] < spans[1][1]  # stopword narrowed
    # key range covers both occurrences' docs
    assert trimmed[1][1] >= 2
    # trimmed sparse path == dense path scores
    dense_scores = arr.score(["rareterm", "the"])
    import pytest

    with pytest.MonkeyPatch.context() as m:
        m.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
        sparse_scores = arr.score(["rareterm", "the"])
    np.testing.assert_allclose(dense_scores, sparse_scores, rtol=1e-6)
    assert sparse_scores[100] > 0 and sparse_scores[400] > 0
    assert sparse_scores.sum() == pytest.approx(
        sparse_scores[100] + sparse_scores[400])
