"""Programs-per-batch pinning for the huge-corpus serving path.

On the tunneled TPU each program costs ~6-9 ms of host enqueue no matter
how small its compute, so the per-batch dispatch count IS the serving
budget at 8.8M docs (round-3 VERDICT item 2: ~25 programs x ~9 ms ate the
whole 224 ms batch).  These tests force the huge-corpus routing on a tiny
CPU corpus (candidate engine on, batch super-fuse off, exactly the 8.8M
configuration) and pin that:

* same-class candidate chunks run as ONE stacked program
  (batch._run_class_stack: lax.map over the chunk axis), not one each;
* slop group keys are anchor-position invariant (batch._canon_slop), so a
  live tail can't mint a program per anchor permutation;
* results stay bit-identical to the full-corpus engine.
"""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.search import batch as batch_mod
from searcharray_tpu.search import candidates as cand_mod


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(7)
    # every rare term appears in exactly 12 docs -> one expand bucket for
    # the whole tail, so all cterm queries share one class
    n_docs, n_rare = 3000, 96
    rows = [["hot1", "hot2"] + list(rng.choice(
        ["hot1", "hot2", "hot3"], size=6)) for _ in range(n_docs)]
    for r in range(n_rare):
        for d in rng.choice(n_docs, size=12, replace=False):
            rows[d].append(f"r{r}")
    return SearchArray.index([" ".join(r) for r in rows])


@pytest.fixture
def huge_corpus_mode(monkeypatch):
    """The 8.8M routing configuration on a tiny corpus."""
    monkeypatch.setattr(cand_mod, "CAND_MIN_DOCS", 0)
    monkeypatch.setattr(cand_mod, "CAND_TERM_MIN_DOCS", 0)
    monkeypatch.setattr(cand_mod, "CAND_MAX_FRAC", 0)
    monkeypatch.setattr(batch_mod, "_SUPER_FUSE_MAX_DOCS", 0)


def _run_counted(docs, queries, slop=0):
    batch_mod.DISPATCHES[0] = 0
    out = docs.score_batch(queries, top_k=5, slop=slop)
    return out, batch_mod.DISPATCHES[0]


def _expected_topk(docs, queries, slop=0, k=5):
    slops = [slop] * len(queries) if np.isscalar(slop) else slop
    dense = np.stack([
        np.asarray(docs.score(q, slop=s)) for q, s in zip(queries, slops)])
    return np.sort(dense, axis=1)[:, ::-1][:, :k]


def test_same_class_cterm_chunks_run_as_one_program(docs, huge_corpus_mode):
    queries = [f"r{i}" for i in range(96)]
    tids = [docs._resolve_tids([q]) for q in queries]
    groups, _, _ = batch_mod._classify(docs.dev, tids, "bm25", top_k=5,
                                       allow_candidates=True)
    assert all(g[0] == "cterm" for g in groups)
    n_classes = len(groups)
    # the point of the test: at least one class must exceed its chunk
    # width, or stacking isn't exercised
    widths = {g: cand_mod.class_qp(docs.dev, g[2]) for g in groups}
    assert any(len(rows) > widths[g] for g, rows in groups.items())

    (scores, idx), n_prog = _run_counted(docs, queries)
    assert n_prog == n_classes, (
        f"{n_prog} programs for {n_classes} cterm classes — same-class "
        "chunks must stack into one dispatch")
    np.testing.assert_allclose(scores, _expected_topk(docs, queries),
                               rtol=1e-5, atol=1e-6)


def test_same_class_cphrase_and_cspan_chunks_stack(docs, huge_corpus_mode):
    # 40 all-rare bigrams: one bucket pair -> one cphrase class, chunk
    # width class_qp // T, so several chunks stack into one program
    phrases = [[f"r{2 * i}", f"r{2 * i + 1}"] for i in range(40)]
    tids = [docs._resolve_tids(q) for q in phrases]
    groups, _, _ = batch_mod._classify(docs.dev, tids, "bm25", top_k=5,
                                       allow_candidates=True)
    assert all(g[0] == "cphrase" for g in groups)
    (scores, idx), n_prog = _run_counted(docs, phrases)
    assert n_prog == len(groups)
    np.testing.assert_allclose(scores, _expected_topk(docs, phrases),
                               rtol=1e-5, atol=1e-6)

    sgroups, _, _ = batch_mod._classify(docs.dev, tids, "bm25", top_k=5,
                                        allow_candidates=True,
                                        slop=[2] * len(phrases))
    assert all(g[0] == "cspan" for g in sgroups)
    (scores, idx), n_prog = _run_counted(docs, phrases, slop=2)
    assert n_prog == len(sgroups)
    np.testing.assert_allclose(scores,
                               _expected_topk(docs, phrases, slop=2),
                               rtol=1e-5, atol=1e-6)


def test_slop_group_keys_are_anchor_position_invariant(docs,
                                                       huge_corpus_mode):
    """[rare, hot, hot'] and [hot, rare, hot'] must classify into ONE
    cspan class: _canon_slop moves the anchor (rarest) term to index 0,
    so where it sat in the query can't mint a fresh program."""
    variants = [["r0", "hot1", "hot2"],
                ["hot1", "r1", "hot2"],
                ["hot1", "hot2", "r2"]]
    tids = [docs._resolve_tids(q) for q in variants]
    groups, _, _ = batch_mod._classify(docs.dev, tids, "bm25", top_k=5,
                                       allow_candidates=True,
                                       slop=[1, 1, 1])
    assert len(groups) == 1, (
        f"anchor position minted {len(groups)} cspan classes: "
        f"{list(groups)}")
    gkey = next(iter(groups))
    assert gkey[0] == "cspan" and gkey[2] == 0 and gkey[-1] == 0

    # parity: canonical reordering must not change scores
    out = docs.score_batch(variants, slop=1)
    for i, q in enumerate(variants):
        np.testing.assert_allclose(
            out[i], np.asarray(docs.score(q, slop=1)), rtol=1e-5,
            atol=1e-6, err_msg=str(q))


def test_dense_slop_keys_are_anchor_position_invariant(docs):
    """Same invariance for the full-plane dspan route (no candidate
    forcing: the corpus is below CAND_MIN_DOCS here)."""
    variants = [["r10", "hot1", "hot2"], ["hot1", "r11", "hot2"]]
    tids = [docs._resolve_tids(q) for q in variants]
    groups, _, fb = batch_mod._classify(docs.dev, tids, "bm25",
                                        slop=[1, 1])
    assert not fb
    keys = set(groups)
    assert len(keys) == 1, f"expected one dspan class, got {list(groups)}"
    gkey = next(iter(keys))
    assert gkey[0] == "dspan" and gkey[2] == 0


def test_warm_single_query_topk_is_two_dispatches(docs, huge_corpus_mode):
    """A warm single-query topk() must cost at most 2 programs (round-4
    VERDICT ask #2): the scoring program itself plus at most one pool
    touch — the remaining latency is the tunnel's sync round trip, which
    no dispatch-count work can remove."""
    for q in ["hot1", "r3", ["hot1", "hot2"], ["r5", "hot1"]]:
        docs.topk(q, 5)      # warm: fills + promotions + compiles
        docs.topk(q, 5)      # second pass: phrase-tf promotions settle
        batch_mod.DISPATCHES[0] = 0
        sc, ix = docs.topk(q, 5)
        n = batch_mod.DISPATCHES[0]
        assert n <= 2, (q, n)
        want = _expected_topk(docs, [q])[0]
        np.testing.assert_allclose(sc, want, rtol=1e-6, atol=1e-6)
