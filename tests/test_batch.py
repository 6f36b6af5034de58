"""Batched (grouped one-program) scoring parity vs the single-query path."""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import dense as dense_mod
from searcharray_tpu.search.similarity import (
    bm25_legacy_similarity,
    classic_similarity,
    default_bm25,
)


@pytest.fixture(params=["dense", "sparse"], autouse=True)
def engine(request, monkeypatch):
    """Run every batch test against both the dense block-layout engine and
    the bucketed sort-merge fallback (forced by zeroing the plane limit)."""
    if request.param == "sparse":
        monkeypatch.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
    return request.param


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(11)
    vocab = ["the", "of", "what", "is", "star", "trek", "cat"] + [
        f"w{i}" for i in range(400)
    ]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 60), p=probs))
        for _ in range(800)
    ]
    corpus.append("the the the of of")  # same-term phrase material
    corpus.append("")
    return SearchArray.index(corpus)


MIXED = [
    "the",                       # frequent term
    "w399",                      # rare term
    "nosuchterm",                # vocab miss -> zeros
    ["what", "is"],              # frequent bigram
    ["star", "trek"],            # rare bigram
    ["the", "of"],               # stopword bigram
    ["what", "is", "the"],       # trigram (merged chain)
    ["the", "the"],              # same-term bigram
    ["what", "is", "the", "of"],  # 4-gram
    ["the", "nosuchterm"],       # phrase w/ missing term -> zeros
    ["w399"],                    # 1-element list (normalises to term)
]


def test_batch_dense_matches_sequential(docs):
    batched = docs.score_batch(MIXED)
    assert batched.shape == (len(MIXED), len(docs))
    for i, q in enumerate(MIXED):
        single = docs.score(q)
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6,
                                   err_msg=str(q))


def test_batch_topk_matches_dense(docs):
    k = 7
    scores, idx = docs.score_batch(MIXED, top_k=k)
    assert scores.shape == (len(MIXED), k)
    assert idx.shape == (len(MIXED), k)
    dense = docs.score_batch(MIXED)
    for i, q in enumerate(MIXED):
        np.testing.assert_allclose(
            scores[i], np.sort(dense[i])[::-1][:k], rtol=1e-6, atol=1e-6,
            err_msg=str(q))
        np.testing.assert_allclose(dense[i][idx[i]], scores[i], rtol=1e-6,
                                   atol=1e-6, err_msg=str(q))


@pytest.mark.parametrize("sim", [bm25_legacy_similarity(),
                                 classic_similarity()],
                         ids=["legacy", "classic"])
def test_batch_other_similarities(docs, sim):
    queries = ["the", ["what", "is"], ["star", "trek"]]
    batched = docs.score_batch(queries, similarity=sim)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(batched[i], docs.score(q, similarity=sim),
                                   rtol=1e-6, atol=1e-6, err_msg=str(q))


def test_batch_subset_view(docs):
    sub = docs[1::3]
    queries = ["the", ["what", "is"], "nosuchterm"]
    batched = sub.score_batch(queries)
    assert batched.shape == (len(queries), len(sub))
    for i, q in enumerate(queries):
        np.testing.assert_allclose(batched[i], sub.score(q), rtol=1e-6,
                                   atol=1e-6, err_msg=str(q))
    # top_k on a subset ranks within the subset
    scores, idx = sub.score_batch(queries, top_k=5)
    dense = np.stack([sub.score(q) for q in queries])
    for i in range(len(queries)):
        np.testing.assert_allclose(scores[i], np.sort(dense[i])[::-1][:5],
                                   rtol=1e-6, atol=1e-6)


def test_batch_slop_falls_back(docs):
    queries = [["what", "is"], ["star", "trek"]]
    batched = docs.score_batch(queries, slop=1)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(batched[i], docs.score(q, slop=1),
                                   rtol=1e-6, atol=1e-6, err_msg=str(q))


def test_batch_empty_and_missing_rows(docs):
    scores, idx = docs.score_batch(["nosuchterm", ["the", "nosuchterm"]],
                                   top_k=4)
    assert np.all(scores == 0.0)
    np.testing.assert_array_equal(idx, np.tile(np.arange(4), (2, 1)))


def test_dense_engine_matches_sparse_engine(docs, engine, monkeypatch):
    """The dense block-layout chain and the sort-merge chain must agree
    bit-for-bit on phrase scores (same float32 op order in similarity)."""
    if engine == "sparse":
        pytest.skip("comparison runs once, from the dense side")
    queries = MIXED
    dense_scores = docs.score_batch(queries)
    with monkeypatch.context() as m:
        m.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
        sparse_scores = docs.score_batch(queries)
    np.testing.assert_allclose(dense_scores, sparse_scores, rtol=1e-6,
                               atol=1e-6)


def test_warm_prefills_pools_and_scores_match(docs, engine):
    """warm() must prefill the dense pools for hot terms without changing
    scores (the df/tf warm analog, reference middle_out.py:337-342)."""
    baseline = docs.score_batch(MIXED)
    docs.warm()
    if engine == "dense":
        assert len(docs.dev.tf_slot) > 0
        assert len(docs.dev.plane_slot) > 0
        # the most frequent term must be resident
        tid = docs.dev.vocab.get_term_id("the")
        assert tid in docs.dev.tf_slot and tid in docs.dev.plane_slot
    after = docs.score_batch(MIXED)
    np.testing.assert_allclose(after, baseline, rtol=1e-6, atol=1e-6)


def test_pool_eviction_waves(engine, monkeypatch):
    """More unique terms per batch than the pools hold: specs must split
    into capacity-bounded waves (fill + super per wave) so no fill evicts
    slots a pending program reads.  Parity vs the single-query path."""
    if engine == "sparse":
        pytest.skip("exercises the dense pools only")
    monkeypatch.setattr(dense_mod, "PLANE_POOL_MAX_SLOTS", 8)
    monkeypatch.setattr(dense_mod, "TF_POOL_MAX_SLOTS", 4)
    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(40)]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(6, 30)))
        for _ in range(300)
    ]
    arr = SearchArray.index(corpus)
    queries = [[f"t{2*i}", f"t{2*i+1}"] for i in range(15)]  # 30 uniq planes
    queries += [f"t{i}" for i in range(12)]                  # 12 uniq tfs
    got = arr.score_batch(queries)
    assert arr.dev.plane_pool.shape[0] == 8
    assert arr.dev.tf_pool.shape[0] == 4
    for i, q in enumerate(queries):
        np.testing.assert_allclose(got[i], np.asarray(arr.score(q)),
                                   rtol=1e-6, atol=1e-6, err_msg=str(q))
    # top-k path under the same pressure
    scores, idx = arr.score_batch(queries, top_k=3)
    np.testing.assert_allclose(
        scores, np.sort(got, axis=1)[:, ::-1][:, :3], rtol=1e-6, atol=1e-6)


def test_sparse_chunk_word_cap(engine, monkeypatch):
    """Sparse-fallback groups must split when sliced posting words exceed
    the per-program cap (at 8.8M docs a stopword bucket is multi-million
    words; an unbounded Qp OOMs the chip)."""
    if engine == "dense":
        pytest.skip("exercises the sparse fallback only")
    from searcharray_tpu.search import batch as batch_mod
    monkeypatch.setattr(batch_mod, "_SPARSE_CHUNK_WORDS", 64)
    rng = np.random.default_rng(9)
    vocab = [f"s{i}" for i in range(30)]
    corpus = [" ".join(rng.choice(vocab, size=20)) for _ in range(200)]
    arr = SearchArray.index(corpus)
    queries = [f"s{i}" for i in range(10)] + [["s0", "s1"], ["s2", "s3"]]
    got = arr.score_batch(queries)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(got[i], np.asarray(arr.score(q)),
                                   rtol=1e-6, atol=1e-6, err_msg=str(q))


def test_topk_exact_two_stage():
    """topk_exact must match lax.top_k exactly, including smallest-index
    tie-breaking, across the one-stage/two-stage boundary."""
    import jax
    from searcharray_tpu.ops.kernels import topk_exact

    rng = np.random.default_rng(3)
    for n, k, block in [(100, 5, 16), (1000, 5, 16), (1003, 7, 16),
                        (5000, 3, 64), (4096, 10, 64),
                        # fewer blocks than k: must fall back one-stage
                        (70000, 10, 8192),
                        # block-max path at the production block size
                        (120000, 10, 8192)]:
        # heavy ties: values drawn from a tiny set
        x = rng.choice(np.float32([0.0, 1.0, 2.0, 3.0]), size=(3, n))
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = topk_exact(x, k, block=block)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref),
                                      err_msg=f"n={n}")
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref),
                                      err_msg=f"n={n}")


def test_batch_slop_grouped(docs, engine):
    """Slop batches run grouped span kernels; parity vs single-query."""
    queries = [["what", "is"], ["star", "trek"], ["the", "of"],
               ["what", "is", "the"], ["the", "the"],
               ["what", "nosuchterm"], "the"]
    for slop in (1, 3):
        batched = docs.score_batch(queries, slop=slop)
        for i, q in enumerate(queries):
            np.testing.assert_allclose(
                batched[i], docs.score(q, slop=slop), rtol=1e-6, atol=1e-6,
                err_msg=f"{q} slop={slop}")
        scores, idx = docs.score_batch(queries, top_k=5, slop=slop)
        np.testing.assert_allclose(
            scores, np.sort(batched, axis=1)[:, ::-1][:, :5], rtol=1e-6,
            atol=1e-6)
        for i in range(len(queries)):
            np.testing.assert_allclose(batched[i][idx[i]], scores[i],
                                       rtol=1e-6, atol=1e-6)


def test_batch_slop_wide_window_fallback(docs, engine):
    """Windows wider than one block (w > 18) use the per-query fallback
    inside the batch driver — results must still match."""
    queries = [["what", "is"], ["star", "trek"]]
    batched = docs.score_batch(queries, slop=25)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(batched[i], docs.score(q, slop=25),
                                   rtol=1e-6, atol=1e-6, err_msg=str(q))


def test_mixed_slop_batch(docs):
    """Per-query slop: one batch mixes exact and slop queries and must
    match per-query score() calls; identical tids with different slops
    must NOT dedup onto each other."""
    queries = ["foo", ["foo", "bar"], ["foo", "bar"], ["bar", "foo"],
               ["foo", "bar"]]
    slops = [0, 0, 2, 1, 2]
    got = docs.score_batch(queries, slop=slops)
    for i, (q, s) in enumerate(zip(queries, slops)):
        np.testing.assert_allclose(
            got[i], np.asarray(docs.score(q, slop=s)), rtol=1e-6,
            atol=1e-6, err_msg=f"{q} slop={s}")
    # same query+slop rows must be bit-identical (dedup fan-out)
    np.testing.assert_array_equal(got[2], got[4])
    scores, idx = docs.score_batch(queries, slop=slops, top_k=4)
    np.testing.assert_allclose(
        scores, np.sort(got, axis=1)[:, ::-1][:, :4], rtol=1e-6, atol=1e-6)
    # wrong length must raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        docs.score_batch(queries, slop=[0, 2])


def test_mixed_slop_batch_wide_window_fallback(docs):
    """A wide-window slop query (per-query span fallback) rides the same
    mixed batch as grouped exact/slop queries."""
    queries = [["foo", "bar"], ["foo", "bar"], ["foo", "bar", "foo", "bar"]]
    slops = [0, 25, 30]  # w > LSB_BITS forces the fallback kernel
    got = docs.score_batch(queries, slop=slops)
    for i, (q, s) in enumerate(zip(queries, slops)):
        np.testing.assert_allclose(
            got[i], np.asarray(docs.score(q, slop=s)), rtol=1e-6,
            atol=1e-6, err_msg=f"{q} slop={s}")
    scores, idx = docs.score_batch(queries, slop=slops, top_k=3)
    np.testing.assert_allclose(
        scores, np.sort(got, axis=1)[:, ::-1][:, :3], rtol=1e-6, atol=1e-6)


def test_mixed_slop_batch_on_sliced_view(docs):
    sl = docs[::2]
    queries = [["foo", "bar"], ["foo", "bar"], "foo"]
    slops = [0, 2, 0]
    got = sl.score_batch(queries, slop=slops)
    for i, (q, s) in enumerate(zip(queries, slops)):
        np.testing.assert_allclose(
            got[i], np.asarray(sl.score(q, slop=s)), rtol=1e-6, atol=1e-6,
            err_msg=f"{q} slop={s}")
