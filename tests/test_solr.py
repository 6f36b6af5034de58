"""edismax DSL: mm parsing and score composition (reference: test_solr.py)."""
import numpy as np
import pandas as pd
import pytest

from searcharray_tpu import SearchArray, edismax
from searcharray_tpu.solr import parse_min_should_match


@pytest.mark.parametrize(
    "clauses,spec,expected",
    [
        (10, "50%", 5),
        (10, "150%", 10),
        (10, "-50%", 5),
        (10, "3", 3),
        (10, "-3", 7),
        (10, "15", 10),
        (10, "5<70%", 7),
        (10, "15<70%", 10),
        (10, "3<50% 5<30%", 3),
        (10, "2<2 5<3 7<40%", 4),
    ],
)
def test_parse_mm(clauses, spec, expected):
    assert parse_min_should_match(clauses, spec) == expected


@pytest.mark.parametrize("spec", ["five%", "five", "5<", ""])
def test_parse_mm_invalid(spec):
    with pytest.raises(ValueError):
        parse_min_should_match(10, spec)


TITLE_DOCS = ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"]


def one_token_lowercase(text):
    return [text.lower()]


def all_b_tokenizer(text):
    return ["b"] * len(text.split())


@pytest.fixture
def frame():
    return pd.DataFrame(
        {
            "title": SearchArray.index(TITLE_DOCS),
            "body": SearchArray.index(["buzz", "data2", "data3 bar", "bunny funny wunny"]),
        }
    )


def test_term_centric_max_over_fields(frame):
    scores, explain = edismax(frame, q="foo bar", qf=["title", "body"])
    title = frame["title"].array
    body = frame["body"].array
    expected0 = title.score("foo")[0] + title.score("bar")[0]
    expected2 = max(title.score("bar")[2], body.score("bar")[2])
    assert np.allclose(scores, [expected0, 0, expected2, 0])
    assert "title:foo" in explain


def test_field_boost(frame):
    scores, _ = edismax(frame, q="foo bar", qf=["title^10", "body"])
    title = frame["title"].array
    body = frame["body"].array
    expected0 = 10 * (title.score("foo")[0] + title.score("bar")[0])
    expected2 = max(10 * title.score("bar")[2], body.score("bar")[2])
    assert np.allclose(scores, [expected0, 0, expected2, 0])


def test_field_centric_when_tokenizers_disagree():
    frame = pd.DataFrame(
        {
            "title": SearchArray.index(TITLE_DOCS),
            "body": SearchArray.index(
                ["foo bar", "data2", "data3 bar", "bunny funny wunny"],
                tokenizer=one_token_lowercase,
            ),
        }
    )
    scores, _ = edismax(frame, q="foo bar", qf=["title", "body"])
    title = frame["title"].array
    body = frame["body"].array
    expected0 = max(
        title.score("foo")[0] + title.score("bar")[0], body.score("foo bar")[0]
    )
    assert np.allclose(scores, [expected0, 0, title.score("bar")[2], 0])


def test_field_centric_tie():
    frame = pd.DataFrame(
        {
            "title": SearchArray.index(TITLE_DOCS),
            "body": SearchArray.index(
                ["foo bar", "data2", "data3 bar", "bunny funny wunny"],
                tokenizer=one_token_lowercase,
            ),
        }
    )
    scores, _ = edismax(frame, q="foo bar", qf=["title", "body"], tie=0.1)
    title = frame["title"].array
    body = frame["body"].array
    qf_title = title.score("foo")[0] + title.score("bar")[0]
    qf_body = body.score("foo bar")[0]
    hi, lo = max(qf_title, qf_body), min(qf_title, qf_body)
    assert np.allclose(scores[0], hi + 0.1 * lo)


def test_mm_two(frame):
    scores, _ = edismax(frame, q="foo bar", qf=["title", "body"], mm="2")
    # only doc 0 has both terms
    assert scores[0] > 0
    assert np.all(scores[1:] == 0)


def test_q_op_and(frame):
    scores_and, _ = edismax(frame, q="foo bar", qf=["title", "body"], q_op="AND")
    scores_mm, _ = edismax(frame, q="foo bar", qf=["title", "body"], mm="100%")
    assert np.allclose(scores_and, scores_mm)


def test_term_centric_tie(frame):
    scores, _ = edismax(frame, q="bar", qf=["title", "body"], tie=0.5)
    title = frame["title"].array
    body = frame["body"].array
    t, b = title.score("bar")[2], body.score("bar")[2]
    assert np.allclose(scores[2], max(t, b) + 0.5 * min(t, b))


def test_pf_adds_phrase_score(frame):
    scores, _ = edismax(frame, q="foo bar", qf=["title", "body"], pf=["title"])
    title = frame["title"].array
    expected0 = (
        title.score(["foo", "bar"])[0]
        + title.score("foo")[0]
        + title.score("bar")[0]
    )
    assert np.allclose(scores[0], expected0)


def test_pf_single_term_noop(frame):
    direct = frame["title"].array.score("foo")
    scores, _ = edismax(frame[["title"]], q="foo", qf=["title"], pf=["title"])
    assert np.allclose(scores, direct)


def test_pf2_single_term_noop(frame):
    direct = frame["title"].array.score("foo")
    scores, _ = edismax(frame[["title"]], q="foo", qf=["title"], pf2=["title"])
    assert np.allclose(scores, direct)
    scores2, _ = edismax(frame[["title"]], q="foo bar", qf=["title"], pf2=["title"])
    assert not np.allclose(scores2, direct)


def test_pf3_needs_three_terms(frame):
    title = frame["title"].array
    direct2 = title.score("foo") + title.score("bar")
    scores2, _ = edismax(frame[["title"]], q="foo bar", qf=["title"], pf3=["title"])
    assert np.allclose(scores2, direct2)
    scores3, _ = edismax(frame[["title"]], q="foo bar bar", qf=["title"],
                         pf3=["title"])
    assert not np.allclose(scores3, direct2)


def binary_similarity(term_freqs, doc_freqs, doc_lens, avg_doc_lens, num_docs):
    return np.asarray(term_freqs) > 0


def test_custom_similarity(frame):
    scores, _ = edismax(frame, q="foo bar", qf=["title", "body"],
                        similarity=binary_similarity)
    assert np.all(scores.astype(np.int64) == scores)


def test_custom_similarity_per_field(frame):
    def tiny(term_freqs, doc_freqs, doc_lens, avg_doc_lens, num_docs):
        return (np.asarray(term_freqs) > 0).astype(np.float32) * 0.0001

    scores, _ = edismax(
        frame, q="foo bar", qf=["title", "body"],
        similarity={"title": binary_similarity, "body": tiny},
    )
    assert np.allclose(scores.astype(np.int64).astype(np.float32), scores,
                       atol=0.001)


def test_different_analyzers_term_centric():
    frame = pd.DataFrame(
        {
            "title": SearchArray.index(TITLE_DOCS),
            "body": SearchArray.index(
                ["buzz", "data2", "data3 bar", "bunny funny wunny"],
                tokenizer=all_b_tokenizer,
            ),
        }
    )
    scores, _ = edismax(frame, q="bar", qf=["title", "body"])
    title = frame["title"].array
    body = frame["body"].array
    expected = [
        max(title.score("bar")[i], body.score("b")[i]) for i in range(4)
    ]
    assert np.allclose(scores, expected)


def test_ps_wires_slop_into_pf(frame):
    # "foo ... baz": not an exact phrase in doc 0 ("foo bar bar baz"),
    # but within slop 2 — ps must loosen the pf phase.
    exact, _ = edismax(frame, q="foo baz", qf=["title"], pf=["title"])
    sloppy, _ = edismax(frame, q="foo baz", qf=["title"], pf=["title"], ps=2)
    assert sloppy[0] > exact[0]
    # ps on a matching exact phrase must not reduce the score
    tight, _ = edismax(frame, q="foo bar", qf=["title"], pf=["title"])
    loose, _ = edismax(frame, q="foo bar", qf=["title"], pf=["title"], ps=3)
    assert loose[0] >= tight[0]


def test_phase_candidate_rows_parity(monkeypatch):
    """Candidate-row phrase phases (cost proportional to matches) must be
    bit-identical to the full-corpus mask-after composition."""
    import searcharray_tpu.solr as solr_mod

    rng = np.random.default_rng(13)
    vocab = ["foo", "bar", "baz", "qux"] + [f"w{i}" for i in range(150)]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    docs = [" ".join(rng.choice(vocab, size=rng.integers(4, 30), p=probs))
            for _ in range(2500)]
    docs[7] = "foo bar baz deep phrase " + docs[7]
    fr = pd.DataFrame({
        "title": SearchArray.index(docs),
        "body": SearchArray.index(list(reversed(docs))),
    })
    kwargs = dict(q="foo bar baz", qf=["title", "body^2"],
                  pf=["title"], pf2=["title", "body"], pf3=["body"])
    full, full_exp = edismax(fr, **kwargs)
    full2, _ = edismax(fr, ps2=1, **kwargs)
    monkeypatch.setattr(solr_mod, "PHASE_SUBSET_MIN_DOCS", 0)
    monkeypatch.setattr(solr_mod, "PHASE_SUBSET_MAX_FRAC", 1)
    sub, sub_exp = edismax(fr, **kwargs)
    assert sub_exp == full_exp
    np.testing.assert_allclose(sub, full, rtol=1e-6, atol=1e-6)
    # and with slop phases (ps2 keeps that phase full-corpus internally)
    sub2, _ = edismax(fr, ps2=1, **kwargs)
    np.testing.assert_allclose(sub2, full2, rtol=1e-6, atol=1e-6)

    # packed-rows middle zone: match count above the optimistic one-shot
    # cap forces the count-sized second fetch — parity must hold there too
    monkeypatch.setattr(solr_mod, "PHASE_ROWS_CAP", 4)
    mid, mid_exp = edismax(fr, **kwargs)
    assert mid_exp == full_exp
    np.testing.assert_allclose(mid, full, rtol=1e-6, atol=1e-6)


def test_edismax_top_k_matches_dense(frame):
    """top_k= returns the device-ranked head of the dense result."""
    dense, exp1 = edismax(frame, q="foo bar", qf=["title^2", "body"],
                          mm=1, tie=0.1, pf2=["body"])
    (sc, ix), exp2 = edismax(frame, q="foo bar", qf=["title^2", "body"],
                             mm=1, tie=0.1, pf2=["body"], top_k=3)
    assert exp1 == exp2
    order = np.argsort(dense)[::-1][:3]
    np.testing.assert_allclose(sc, dense[order], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dense[ix], dense[order], rtol=1e-6,
                               atol=1e-6)


def _zipf_frame(seed=13, n=2500):
    rng = np.random.default_rng(seed)
    vocab = ["foo", "bar", "baz", "qux"] + [f"w{i}" for i in range(150)]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    docs = [" ".join(rng.choice(vocab, size=rng.integers(4, 30), p=probs))
            for _ in range(n)]
    docs[7] = "foo bar baz deep phrase " + docs[7]
    return pd.DataFrame({
        "title": SearchArray.index(docs),
        "body": SearchArray.index(list(reversed(docs))),
    })


def test_edismax_batch_differential():
    """edismax_batch == per-query edismax: dense scores, top-k wires, and
    explain strings, across term counts, mm classes, phases, slop phases,
    boosts, and no-match / empty queries."""
    from searcharray_tpu.solr import edismax_batch

    fr = _zipf_frame()
    queries = ["foo bar", "foo bar baz", "qux", "w5 w9 foo",
               "zzz_nomatch qux", "foo", "bar baz qux w3", ""]
    kwargs = dict(qf=["title^2", "body"], mm="2<75%", tie=0.1,
                  pf=["title", "body"], pf2=["body"], pf3=["title"],
                  ps2=1)

    dense_b, exp_b = edismax_batch(fr, queries, **kwargs)
    assert dense_b.shape == (len(queries), len(fr))
    (sc_b, ix_b), exp_k = edismax_batch(fr, queries, top_k=5, **kwargs)
    assert exp_k == exp_b
    for qi, q in enumerate(queries):
        if not q:
            assert np.all(dense_b[qi] == 0)
            continue
        dense, exp = edismax(fr, q, **kwargs)
        assert exp_b[qi] == exp, q
        np.testing.assert_allclose(dense_b[qi], dense, rtol=1e-6,
                                   atol=1e-6)
        (sc, ix), _ = edismax(fr, q, top_k=5, **kwargs)
        np.testing.assert_allclose(sc_b[qi], sc, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(ix_b[qi], ix)


def test_edismax_batch_field_centric():
    """FC queries (tokenizers disagree) group into fc compose classes."""
    from searcharray_tpu.solr import edismax_batch

    fr = pd.DataFrame({
        "title": SearchArray.index(TITLE_DOCS),
        "body": SearchArray.index(
            ["foo bar", "data2", "data3 bar", "bunny funny wunny"],
            tokenizer=one_token_lowercase,
        ),
    })
    queries = ["foo bar", "bar", "bunny funny"]
    dense_b, exp_b = edismax_batch(fr, queries, qf=["title", "body"],
                                   tie=0.1, pf=["title"])
    for qi, q in enumerate(queries):
        dense, exp = edismax(fr, q, qf=["title", "body"], tie=0.1,
                             pf=["title"])
        assert exp_b[qi] == exp, q
        np.testing.assert_allclose(dense_b[qi], dense, rtol=1e-6,
                                   atol=1e-6)


def test_edismax_batch_fallback_paths():
    """Custom (non-fused) similarity falls back to the scalar loop and
    still returns batch-shaped results."""
    from searcharray_tpu.solr import edismax_batch

    fr = _zipf_frame(seed=5, n=300)
    queries = ["foo bar", "qux"]
    dense_b, exp_b = edismax_batch(fr, queries, qf=["title", "body"],
                                   similarity=binary_similarity)
    assert dense_b.shape == (2, len(fr))
    for qi, q in enumerate(queries):
        dense, exp = edismax(fr, q, qf=["title", "body"],
                             similarity=binary_similarity)
        assert exp_b[qi] == exp
        np.testing.assert_allclose(dense_b[qi], dense, rtol=1e-6,
                                   atol=1e-6)
    (sc, ix), _ = edismax_batch(fr, queries, qf=["title", "body"],
                                similarity=binary_similarity, top_k=3)
    assert sc.shape == (2, 3) and ix.shape == (2, 3)

    # empty batch
    (sc0, ix0), exps = edismax_batch(fr, [], qf=["title"], top_k=4)
    assert sc0.shape == (0, 4) and exps == []
