"""Frozen ranking snapshot over a fixed synthetic corpus.

The environment has no egress, so real MSMARCO qrels/MRR@10 cannot run
here; this is the regression harness VERDICT round 1 asked for instead: a
checked-in top-5 snapshot (scores + doc ids) for a fixed seed, query mix,
and similarity, so any change to scoring/ranking semantics is detected.

Snapshot generated 2026-08-16 (round 2, dense engine == sparse engine ==
sharded engine by the parity suites).  If a deliberate semantic change
invalidates it, regenerate with tests/gen via the commands in the
docstring history — never "fix" numbers by hand.
"""
import numpy as np
import pandas as pd
import pytest

from searcharray_tpu import SearchArray, edismax

GOLDEN = {
    "what": ([0.0324, 0.0322, 0.0321, 0.0321, 0.032],
             [1897, 760, 1478, 1435, 1187]),
    "star": ([0.4427, 0.4328, 0.4328, 0.4296, 0.4281],
             [883, 1183, 1463, 1149, 1997]),
    "w42": ([1.7609, 1.7609, 1.7002, 1.6714, 1.6435],
            [756, 917, 1892, 46, 1056]),
    "what is": ([0.1523, 0.1507, 0.1491, 0.1447, 0.1447],
                [891, 1528, 1970, 544, 839]),
    "star trek": ([0.7325, 0.677, 0.6571, 0.6294, 0.6121],
                  [1311, 1081, 1928, 1595, 731]),
    "the of": ([0.4494, 0.4421, 0.4273, 0.4273, 0.4204],
               [234, 1540, 1596, 1832, 47]),
    "what is the": ([0.3264, 0.2948, 0.2856, 0.2812, 0.2812],
                    [1775, 1701, 1883, 807, 1835]),
    "what is the purpose": ([0.0, 0.0, 0.0, 0.0, 0.0], [0, 1, 2, 3, 4]),
}
GOLDEN_EDISMAX = {
    "what is": ([0.9738, 0.9319, 0.928, 0.925, 0.9186],
                [891, 1528, 1419, 1786, 1715]),
    "star trek the": ([1.448, 1.3719, 1.0623, 1.0603, 1.0599],
                      [1849, 1691, 1209, 440, 1104]),
}


@pytest.fixture(scope="module")
def corpus_frame():
    rng = np.random.default_rng(20260816)
    vocab = ["what", "is", "the", "of", "star", "trek", "purpose", "cat"] + [
        f"w{i}" for i in range(2000)
    ]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.07
    probs /= probs.sum()
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(8, 60), p=probs))
        for _ in range(2000)
    ]
    docs = SearchArray.index(corpus)
    frame = pd.DataFrame({
        "body": docs,
        "title": SearchArray.index([c[:50] for c in corpus]),
    })
    return docs, frame


@pytest.mark.parametrize("query", list(GOLDEN))
def test_topk_snapshot(corpus_frame, query):
    docs, _ = corpus_frame
    q = query.split() if " " in query else query
    scores, idx = docs.topk(q, k=5)
    want_scores, want_idx = GOLDEN[query]
    np.testing.assert_allclose(scores, want_scores, atol=2e-4, err_msg=query)
    # ties may reorder between engines; the returned docs' scores must
    # reproduce the snapshot scores, and a strict top-1 must match exactly
    dense = docs.score(q)
    np.testing.assert_allclose(dense[idx], scores, rtol=1e-6)
    if want_scores[0] > want_scores[1] + 3e-4:
        assert idx[0] == want_idx[0], query


@pytest.mark.parametrize("query", list(GOLDEN_EDISMAX))
def test_edismax_snapshot(corpus_frame, query):
    _, frame = corpus_frame
    if query == "what is":
        sc, _ = edismax(frame, q=query, qf=["body^2", "title"], mm="1",
                        tie=0.3, pf2=["body"])
    else:
        sc, _ = edismax(frame, q=query, qf=["body"], mm="2", pf=["body"])
    want_scores, want_idx = GOLDEN_EDISMAX[query]
    top = np.argsort(sc)[::-1][:5]
    np.testing.assert_allclose(sc[top], want_scores, atol=2e-4,
                               err_msg=query)
    if want_scores[0] > want_scores[1] + 3e-4:
        assert top[0] == want_idx[0], query
