"""Candidate-subset engine (search/candidates.py) parity vs the
full-corpus dense/sparse engines.

The candidate path turns on only at huge corpora; tests force it by
patching CAND_MIN_DOCS and exercise both mini (searchsorted) and pool
(plane gather) term sources by patching MINI_MAX_WORDS."""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import batch as batch_mod
from searcharray_tpu.search import candidates as cand_mod


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(21)
    vocab = ["hot1", "hot2", "hot3"] + [f"r{i}" for i in range(300)]
    # hot terms near-uniform, long rare tail
    probs = np.concatenate([[0.25, 0.2, 0.15],
                            np.full(300, 0.4 / 300)])
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(6, 50), p=probs))
        for _ in range(4000)
    ]
    corpus.append("r0 hot1 r0 hot1 r0")      # same-term + phrase material
    corpus.append("r1 r2 r3 r1 r2 r3")
    corpus.append("")
    return SearchArray.index(corpus)


QUERIES = [
    "r0",                      # rare term -> cterm
    "r17",
    ["r0", "hot1"],            # rare+hot phrase -> cphrase (mixed srcs)
    ["hot1", "r0"],
    ["r1", "r2", "r3"],        # all-rare trigram
    ["r0", "r0"],              # same-term rare bigram
    ["r1", "r2", "r3", "r1"],  # 4-gram with repeat
    "nosuchterm",
    ["r0", "nosuchterm"],
]


@pytest.fixture(params=["mini", "mixed", "searchsorted"])
def forced(request, monkeypatch):
    """Force the candidate path on; 'mixed' additionally forces hot terms
    onto the pool source (as stopwords are at real scale); 'searchsorted'
    forces the small-bucket alignment (imap is the default on these tiny
    corpora).  FRAC=0 lifts the selectivity gate (the 4096-row
    candidate-buffer floor exceeds these tiny test corpora)."""
    monkeypatch.setattr(cand_mod, "CAND_MIN_DOCS", 0)
    monkeypatch.setattr(cand_mod, "CAND_TERM_MIN_DOCS", 0)
    monkeypatch.setattr(cand_mod, "CAND_MAX_FRAC", 0)
    if request.param == "mixed":
        monkeypatch.setattr(cand_mod, "MINI_MAX_WORDS", 2048)
    if request.param == "searchsorted":
        monkeypatch.setattr(cand_mod, "ALIGN_IMAP_FRAC", 1)
    # group programs cache by gkey, which doesn't encode the alignment
    # choice — drop them so each param actually traces its own path
    batch_mod._group_cache.clear()
    return request.param


def _expected(docs, queries):
    return np.stack([np.asarray(docs.score(q)) for q in queries])


def test_candidate_routing_engaged(docs, forced):
    tids = docs._resolve_tids(["r0"])
    groups, _, _ = batch_mod._classify(docs.dev, [tids], "bm25",
                                       allow_candidates=True)
    assert list(groups)[0][0] == "cterm"
    ptids = docs._resolve_tids(["r0", "hot1"])
    groups, _, _ = batch_mod._classify(docs.dev, [ptids], "bm25",
                                       allow_candidates=True)
    gkey = list(groups)[0]
    assert gkey[0] == "cphrase"
    if forced == "mixed":
        assert "pool" in gkey[4]  # hot1 must use the pooled plane
    # slop routing: candidate span group at scale, dspan without
    groups, _, _ = batch_mod._classify(docs.dev, [ptids], "bm25",
                                       allow_candidates=True, slop=2)
    assert list(groups)[0][0] == "cspan"
    # a fresh (never-repeated) slop phrase routes dspan; repeated ones
    # promote into the phrase-tf cache (test_phrase_tf_cache.py)
    docs.dev.phrase_hits.clear()
    for k in [k for k in docs.dev.tf_slot if isinstance(k, tuple)]:
        docs.dev.tf_free.append(docs.dev.tf_slot.pop(k))
    groups, _, _ = batch_mod._classify(docs.dev, [ptids], "bm25",
                                       allow_candidates=False, slop=2)
    assert list(groups)[0][0] == "dspan"


def test_candidate_dense_parity(docs, forced):
    got = docs.score_batch(QUERIES)
    exp = _expected(docs, QUERIES)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_candidate_topk_parity(docs, forced):
    k = 5
    scores, idx = docs.score_batch(QUERIES, top_k=k)
    exp = _expected(docs, QUERIES)
    for i, q in enumerate(QUERIES):
        np.testing.assert_allclose(
            scores[i], np.sort(exp[i])[::-1][:k], rtol=1e-6, atol=1e-6,
            err_msg=str(q))
        # picked docs must carry exactly the reported score (zero-tail
        # fillers are guaranteed zero-score docs)
        np.testing.assert_allclose(exp[i][idx[i]], scores[i], rtol=1e-6,
                                   atol=1e-6, err_msg=str(q))


def test_candidate_as_device_parity(docs, forced):
    import jax.numpy as jnp

    out = docs.score_batch_device(QUERIES[:5])
    assert isinstance(out, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(out), _expected(docs, QUERIES[:5]),
                               rtol=1e-6, atol=1e-6)


def test_dedup_fans_out(docs, forced):
    queries = ["r0", ["r0", "hot1"], "r0", ["r0", "hot1"], "r17", "r0"]
    got = docs.score_batch(queries)
    exp = _expected(docs, queries)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)
    scores, idx = docs.score_batch(queries, top_k=4)
    np.testing.assert_allclose(scores[0], scores[2], rtol=0, atol=0)
    np.testing.assert_array_equal(idx[0], idx[2])
    np.testing.assert_allclose(
        scores, np.sort(exp, axis=1)[:, ::-1][:, :4], rtol=1e-6, atol=1e-6)


def test_eligibility_gates(docs):
    dev = docs.dev
    rare = dev.vocab.get_term_id("r0")
    hot = dev.vocab.get_term_id("hot1")
    # corpus below CAND_MIN_DOCS: never eligible
    assert not cand_mod.eligible_term(dev, rare, None)
    # forced on: selective terms eligible, stopword-sized not
    import pytest as _pytest

    # candidate buffers grow with posting size (class = bucket)
    assert cand_mod.kc_bucket(dev, rare) < cand_mod.kc_bucket(dev, hot)
    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(cand_mod, "CAND_MIN_DOCS", 0)
        mp.setattr(cand_mod, "CAND_TERM_MIN_DOCS", 0)
        # selectivity gate: a hot term's buffer exceeds corpus/FRAC
        assert not cand_mod.eligible_term(dev, hot, None)
        mp.setattr(cand_mod, "CAND_MAX_FRAC", 0)
        assert cand_mod.eligible_term(dev, rare, None)
        # top_k larger than the candidate buffer: not eligible
        assert not cand_mod.eligible_term(
            dev, rare, cand_mod.kc_bucket(dev, rare) + 1)
    finally:
        mp.undo()


def test_class_keys_converge(docs, forced):
    """A live rare-term tail must not mint unbounded candidate classes:
    group keys quantize to (pool pattern, max mini bucket, Kc ladder), so
    varied same-shaped queries collapse onto few keys (each key is a
    compiled program — at 8.8M shapes, minutes of XLA per extra key)."""
    rng = np.random.default_rng(7)
    keys = set()
    for trial in range(12):
        picks = rng.choice(300, size=4, replace=False)
        qs = [[f"r{picks[0]}", f"r{picks[1]}"],
              [f"r{picks[2]}", "hot1", f"r{picks[3]}"]]
        tids = [docs._resolve_tids(q) for q in qs]
        groups, _, _ = batch_mod._classify(docs.dev, tids, "bm25",
                                           allow_candidates=True)
        keys |= {k for k in groups if k[0] in ("cphrase", "cterm")}
    # 12 varied trials x 2 shapes: bounded by (rarest position x split x
    # Kc bucket) combos, nowhere near one-key-per-trial growth
    assert len(keys) <= 10, sorted(keys)


def test_candidate_slop_parity(docs, forced):
    queries = [["r0", "hot1"], ["r1", "r2", "r3"], ["r0", "r0"],
               ["r1", "r2", "r3", "r1"], "r17", ["r0", "nosuchterm"]]
    for slop in (1, 4):
        got = docs.score_batch(queries, slop=slop)
        for i, q in enumerate(queries):
            np.testing.assert_allclose(
                got[i], np.asarray(docs.score(q, slop=slop)), rtol=1e-6,
                atol=1e-6, err_msg=f"{q} slop={slop}")
        scores, idx = docs.score_batch(queries, top_k=4, slop=slop)
        np.testing.assert_allclose(
            scores, np.sort(got, axis=1)[:, ::-1][:, :4], rtol=1e-6,
            atol=1e-6)
