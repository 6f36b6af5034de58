"""Phrase-tf cache: repeated phrases score from a materialized tf-pool
row (search/dense.py "ph"/"phs" sub-fills) with exact parity against the
dense chain — including promotion batches, slop spans, repeated terms,
top-k packing, LRU eviction + re-promotion, and the single-query path.

The reference recomputes phrase freqs per call (its termfreq cache at
`/root/reference/searcharray/phrase/middle_out.py:322-342` covers terms
only); here a hot phrase's f32[N] freq row is immutable for an index and
pool-cacheable exactly like a term's.
"""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import dense as dense_mod


@pytest.fixture()
def arr():
    rng = np.random.default_rng(11)
    vocab = ["red", "fox", "jumps", "dog", "the", "lazy"] + [
        f"w{i}" for i in range(40)
    ]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(6, 30)))
        for _ in range(400)
    ]
    corpus += ["red fox jumps the lazy dog red fox", "red the fox red fox"]
    return SearchArray.index(corpus)


def _sigs(dev):
    return [k for k in dev.tf_slot if isinstance(k, tuple)]


def test_promotion_parity_exact(arr):
    qs = [["red", "fox"], ["red", "fox", "jumps"], "dog", ["the", "fox"]]
    runs = [arr.score_batch(qs) for _ in range(3)]  # count, promote, hit
    assert len(_sigs(arr.dev)) >= 2, "phrases were not promoted"
    for r in runs[1:]:
        np.testing.assert_allclose(runs[0], r, rtol=1e-6, atol=1e-6)
    # single-query path agrees and also serves from the cache
    for i, q in enumerate(qs):
        np.testing.assert_allclose(np.asarray(arr.score(q)), runs[0][i],
                                   rtol=1e-6, atol=1e-6)


def test_promotion_parity_slop_and_mults(arr):
    qs = [["red", "jumps"], ["red", "fox", "red"]]  # incl multiplicity 2
    runs = [arr.score_batch(qs, slop=2) for _ in range(3)]
    for r in runs[1:]:
        np.testing.assert_allclose(runs[0], r, rtol=1e-6, atol=1e-6)
    assert ((("red",), 2) not in arr.dev.tf_slot)  # sig keys carry tids
    # exact (slop=0) and slop=2 signatures are distinct cache entries
    e = arr.score_batch(qs)
    e2 = arr.score_batch(qs)
    np.testing.assert_allclose(e, e2, rtol=1e-6, atol=1e-6)
    assert not np.allclose(runs[0], e), "slop and exact should differ here"


def test_topk_parity_through_cache(arr):
    qs = [["red", "fox"], ["the", "fox"], "dog"]
    arr.score_batch(qs)
    arr.score_batch(qs)  # promoted
    dense = arr.score_batch(qs)
    scores, idx = arr.score_batch(qs, top_k=5)
    for i in range(len(qs)):
        order = np.argsort(dense[i])[::-1][:5]
        np.testing.assert_allclose(np.sort(scores[i])[::-1],
                                   np.sort(dense[i][order])[::-1],
                                   rtol=1e-6, atol=1e-6)


def test_eviction_and_repromotion(arr, monkeypatch):
    # shrink the tf pool so phrase rows churn; parity must survive
    monkeypatch.setattr(dense_mod, "TF_POOL_MAX_SLOTS", 4)
    arr.dev.tf_pool = None
    arr.dev.tf_slot.clear()
    arr.dev.tf_free = []
    arr.dev.phrase_hits.clear()
    phrases = [["red", "fox"], ["the", "fox"], ["red", "jumps"],
               ["lazy", "dog"], ["fox", "the"]]
    base = arr.score_batch(phrases)
    for _ in range(4):
        got = arr.score_batch(phrases)
        np.testing.assert_allclose(base, got, rtol=1e-6, atol=1e-6)
    assert len(_sigs(arr.dev)) <= 2  # budget = capacity // 2


def test_cached_rows_subset_scoring(arr):
    # rows= subset path gathers cached phrase rows too (edismax phases)
    qs = [["red", "fox"], ["the", "fox"]]
    arr.score_batch(qs)
    arr.score_batch(qs)
    full = arr.score_batch(qs)
    rows = np.asarray([0, 3, 7, 100, 399], dtype=np.int64)
    from searcharray_tpu.search.batch import score_batch_fused

    tids = [[arr.term_dict.get_term_id(t) for t in q] for q in qs]
    sub = score_batch_fused(arr.dev, tids, rows=rows)
    np.testing.assert_allclose(sub, full[:, rows], rtol=1e-6, atol=1e-6)
