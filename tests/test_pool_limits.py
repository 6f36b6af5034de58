"""Dense-pool capacity edge cases (round-2 advisor findings).

At huge-corpus scales the plane pool holds only ~8-10 slots, so a phrase
with more unique terms than the pool must fall back to the sparse
sort-merge chain instead of raising; and pools must allocate lazily per
kind so a term-only workload never pays the plane pool's HBM."""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import dense as dense_mod


@pytest.fixture()
def small_pool_docs(monkeypatch):
    monkeypatch.setattr(dense_mod, "PLANE_POOL_MAX_SLOTS", 4)
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(30)]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(8, 40)))
        for _ in range(300)
    ]
    corpus.append(" ".join(f"t{i}" for i in range(12)) * 2)
    return SearchArray.index(corpus)


def test_long_phrase_overflows_pool_single_query(small_pool_docs):
    arr = small_pool_docs
    assert dense_mod.plane_capacity(arr.dev) == 4
    phrase = [f"t{i}" for i in range(8)]  # 8 unique > capacity-1
    got = arr.score(phrase)  # must not raise "dense pool exhausted"
    assert got.shape == (len(arr),)
    # parity with the sparse engine run explicitly
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
        expect = arr.score(phrase)
    finally:
        mp.undo()
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_long_phrase_overflows_pool_batch(small_pool_docs):
    arr = small_pool_docs
    queries = [
        [f"t{i}" for i in range(8)],   # overflows -> sparse group
        ["t0", "t1"],                  # fits -> dense group
        "t5",
    ]
    got = arr.score_batch(queries)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(got[i], np.asarray(arr.score(q)),
                                   rtol=1e-6, atol=1e-6, err_msg=str(q))


def test_long_slop_phrase_overflows_pool(small_pool_docs):
    arr = small_pool_docs
    phrase = [f"t{i}" for i in range(6)]
    got = arr.score(phrase, slop=2)  # dense span path must decline
    assert got.shape == (len(arr),)
    assert np.all(np.isfinite(got))


def test_pools_allocate_lazily():
    rng = np.random.default_rng(3)
    corpus = [" ".join(rng.choice([f"x{i}" for i in range(20)], size=12))
              for _ in range(200)]
    arr = SearchArray.index(corpus, autowarm=False)
    assert arr.dev.plane_pool is None and arr.dev.tf_pool is None
    arr.score_batch(["x0", "x1"])  # term-only: only the tf pool
    assert arr.dev.tf_pool is not None
    assert arr.dev.plane_pool is None
    arr2 = SearchArray.index(corpus, autowarm=False)
    arr2.score_batch([["x0", "x1"]])  # phrase-only: only the plane pool
    assert arr2.dev.plane_pool is not None
    assert arr2.dev.tf_pool is None


def test_block_false_with_custom_similarity_raises():
    corpus = ["a b c", "b c d", "c d e"]
    arr = SearchArray.index(corpus)

    def custom(tfs, dfs, doc_lens, avg_dl, num_docs):
        return tfs.sum(axis=0) if tfs.ndim > 1 else tfs

    with pytest.raises(ValueError, match="block=False requires"):
        arr.score_batch(["a"], similarity=custom, top_k=2, block=False)
