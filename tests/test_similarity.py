"""BM25 similarity vs Lucene golden values.

Golden numbers are Lucene 9 scores (same fixtures as the reference's
test_similarity.py:16-49 — they pin the exact formula and float behavior).
"""
import numpy as np
import pytest

from searcharray_tpu.search.similarity import (
    bm25_impact,
    bm25_legacy_similarity,
    bm25_similarity,
    classic_similarity,
    compute_idf,
)

LUCENE_GOLDENS = [
    # (tf, df, doc_len, avg_dl, num_docs, expected)
    (2, 14, 4, 2.7322686, 8516, 3.52482),
    (1, 5, 35, 50.580456, 8514, 3.8199246),
    (2, 7, 44, 50.580456, 8514, 4.5636616),
    (25, 7823, 152, 119.18542, 8516, 0.08028283),
]


def _arr(x):
    return np.asarray([x], dtype=np.float32)


@pytest.mark.parametrize("tf,df,dl,avg,n,expected", LUCENE_GOLDENS)
def test_bm25_matches_lucene(tf, df, dl, avg, n, expected):
    sim = bm25_similarity(k1=1.2, b=0.75)
    got = sim(_arr(tf), _arr(df), _arr(dl), avg, n)
    assert np.isclose(got, expected).all(), got


@pytest.mark.parametrize("tf,df,dl,avg,n,expected", LUCENE_GOLDENS)
def test_bm25_impact_times_idf_equals_bm25(tf, df, dl, avg, n, expected):
    full = bm25_similarity()(_arr(tf), _arr(df), _arr(dl), avg, n)
    imp = bm25_impact()(_arr(tf), _arr(df), _arr(dl), avg, n)
    assert np.isclose(imp * compute_idf(n, _arr(df)), full).all()


def test_zero_avg_doc_len():
    for sim in (bm25_similarity(), bm25_legacy_similarity(), bm25_impact()):
        got = sim(_arr(3), _arr(1), _arr(5), 0, 10)
        assert (got == 0).all()


def test_legacy_k1_plus_one():
    tf, df, dl, avg, n = 2.0, 14.0, 4.0, 2.7322686, 8516
    new = bm25_similarity()(_arr(tf), _arr(df), _arr(dl), avg, n)
    old = bm25_legacy_similarity()(_arr(tf), _arr(df), _arr(dl), avg, n)
    assert np.isclose(old, new * (1.2 + 1)).all()


def test_classic_formula():
    got = classic_similarity()(_arr(4), _arr(10), _arr(16), 10, 99)
    idf = np.log((99 + 1) / (10 + 1)) + 1
    assert np.isclose(got, idf * 2.0 * 0.25, rtol=1e-6).all()


def test_device_arrays_accepted():
    import jax.numpy as jnp

    sim = bm25_similarity()
    got = sim(jnp.asarray([2.0], jnp.float32), _arr(14), jnp.asarray([4.0], jnp.float32),
              2.7322686, 8516)
    assert np.isclose(np.asarray(got), 3.52482).all()
