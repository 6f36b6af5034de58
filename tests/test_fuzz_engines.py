"""Seeded randomized differential test across the engine routings.

Random corpora and random mixed batches (terms / phrases / slop
phrases, repeated terms, vocabulary misses, per-query slop) must score
identically through the batch driver under every routing configuration:
dense pools (default on these sizes), forced candidate-subset routing,
and the sparse sort-merge fallback.  The per-query ``score()`` facade is
the oracle — it is itself pinned to the reference's scenario tables
(tests/test_phrase.py, tests/test_slop.py) and Lucene goldens
(tests/test_similarity.py).
"""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import batch as batch_mod
from searcharray_tpu.search import candidates as cand_mod
from searcharray_tpu.search import dense as dense_mod


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(1234)
    vocab = [f"t{i}" for i in range(120)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    docs = [" ".join(rng.choice(vocab, size=rng.integers(1, 40), p=probs))
            for _ in range(1200)]
    docs += ["", "t0 t0 t0 t0", "t1 t2 t1 t2 t1 t2"]
    return docs


def random_queries(rng, n):
    out = []
    slops = []
    for _ in range(n):
        L = int(rng.integers(1, 5))
        toks = [f"t{int(rng.integers(0, 130))}"  # ids >= 120 miss vocab
                for _ in range(L)]
        if L >= 2 and rng.random() < 0.3:
            toks[rng.integers(1, L)] = toks[0]  # repeated term
        out.append(toks[0] if L == 1 and rng.random() < 0.5 else toks)
        slops.append(int(rng.integers(0, 4)) if L > 1 else 0)
    return out, slops


@pytest.mark.parametrize("routing", ["dense", "candidates", "sparse"])
def test_fuzz_mixed_batches(corpus, routing, monkeypatch):
    if routing == "candidates":
        monkeypatch.setattr(cand_mod, "CAND_MIN_DOCS", 0)
        monkeypatch.setattr(cand_mod, "CAND_TERM_MIN_DOCS", 0)
        monkeypatch.setattr(cand_mod, "CAND_MAX_FRAC", 0)
    elif routing == "sparse":
        monkeypatch.setattr(dense_mod, "DENSE_TERM_BYTES_LIMIT", 0)
    batch_mod._group_cache.clear()

    docs = SearchArray.index(corpus)
    rng = np.random.default_rng(77)
    for trial in range(2):
        queries, slops = random_queries(rng, 14)
        got = docs.score_batch(queries, slop=slops)
        for i, (q, s) in enumerate(zip(queries, slops)):
            np.testing.assert_allclose(
                got[i], np.asarray(docs.score(q, slop=s)), rtol=1e-5,
                atol=1e-6, err_msg=f"trial {trial} q={q} slop={s}")
        scores, idx = docs.score_batch(queries, slop=slops, top_k=5)
        np.testing.assert_allclose(
            scores, np.sort(got, axis=1)[:, ::-1][:, :5], rtol=1e-5,
            atol=1e-6, err_msg=f"trial {trial} topk")


def test_fuzz_sharded_driver(corpus):
    """Same seeded mixed batches through the sharded (virtual 8-device
    mesh) driver: must equal the single-chip facade bit-for-bit-ish."""
    from searcharray_tpu.parallel.sharded import default_mesh

    single = SearchArray.index(corpus)
    meshed = SearchArray.index(corpus, mesh=default_mesh())
    rng = np.random.default_rng(99)
    for trial in range(2):
        queries, slops = random_queries(rng, 12)
        got = np.asarray(meshed.score_batch(queries, slop=slops))
        for i, (q, s) in enumerate(zip(queries, slops)):
            np.testing.assert_allclose(
                got[i], np.asarray(single.score(q, slop=s)), rtol=1e-5,
                atol=1e-6, err_msg=f"trial {trial} q={q} slop={s}")
        scores, idx = meshed.score_batch(queries, slop=slops, top_k=5)
        np.testing.assert_allclose(
            np.asarray(scores), np.sort(got, axis=1)[:, ::-1][:, :5],
            rtol=1e-5, atol=1e-6, err_msg=f"trial {trial} topk")


def test_fuzz_posn_windows(corpus):
    """Windowed term scoring vs a host oracle built from positions():
    tf(doc) = count of positions inside [min_posn, max_posn]."""
    from searcharray_tpu.search.similarity import bm25_similarity

    docs = SearchArray.index(corpus)
    rng = np.random.default_rng(5)
    for _ in range(6):
        tok = f"t{int(rng.integers(0, 60))}"
        lo = int(rng.integers(0, 3)) * 18
        hi = lo + int(rng.integers(1, 4)) * 18 - 1
        got = np.asarray(docs.score(tok, min_posn=lo, max_posn=hi))
        posns = docs.positions(tok)
        tfs = np.asarray(
            [np.sum((p >= lo) & (p <= hi)) for p in posns], np.float32)
        sim = bm25_similarity()
        want = sim(tfs, np.asarray([docs.docfreq(tok)]),
                   docs.doclengths(), docs.avg_doc_length,
                   docs.corpus_size)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5,
                                   atol=1e-6,
                                   err_msg=f"{tok} [{lo},{hi}]")
