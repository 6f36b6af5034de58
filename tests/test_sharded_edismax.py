"""Sharded edismax parity: the full query DSL on an 8-device mesh must
reproduce single-chip scores exactly.

VERDICT round-1 item 4: multi-chip must be the framework, not a parallel
universe API — SearchArray.index(..., mesh=...) attaches a doc-sharded
index and edismax/score_batch execute SPMD transparently.
"""
import numpy as np
import pandas as pd
import pytest

from searcharray_tpu import SearchArray, edismax
from searcharray_tpu.index.builder import std_tokenizer
from searcharray_tpu.parallel.sharded import default_mesh


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(5)
    vocab = ["the", "of", "what", "is", "star", "trek"] + [
        f"w{i}" for i in range(300)
    ]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 50), p=probs))
        for _ in range(640)
    ]
    titles = [c[:40] for c in corpus]
    mesh = default_mesh()
    sharded = pd.DataFrame({
        "body": SearchArray.index(corpus, mesh=mesh, autowarm=False),
        "title": SearchArray.index(titles, mesh=mesh, autowarm=False),
    })
    single = pd.DataFrame({
        "body": SearchArray.index(corpus, autowarm=False),
        "title": SearchArray.index(titles, autowarm=False),
    })
    return sharded, single


CASES = [
    dict(q="what is the", qf=["body^2", "title"], mm="1", tie=0.3),
    dict(q="what is the star", qf=["body", "title^3"], mm="2",
         pf=["body"], pf2=["body", "title"], pf3=["body"]),
    dict(q="star trek", qf=["body"], q_op="AND", pf=["body"]),
    dict(q="the of what", qf=["body^1.5"], mm="1", pf=["body"], ps=1,
         pf2=["body"], ps2=2),
    dict(q="w3 w7", qf=["body", "title"], mm="1", tie=0.7),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[c["q"].replace(" ", "-") for c in CASES])
def test_sharded_edismax_matches_single_chip(frames, case):
    sharded, single = frames
    case = dict(case)
    q = case.pop("q")
    s_scores, s_explain = edismax(sharded, q=q, **case)
    d_scores, d_explain = edismax(single, q=q, **case)
    assert s_explain == d_explain
    np.testing.assert_allclose(s_scores, d_scores, rtol=1e-6, atol=1e-7,
                               err_msg=q)
    assert d_scores.max() > 0


def test_sharded_field_centric(frames):
    """Different per-field tokenizers trigger the field-centric path."""
    sharded, single = frames
    mesh = default_mesh()
    corpus = ["foo-bar baz", "foo bar", "baz qux"] * 40
    fs = pd.DataFrame({
        "ws": SearchArray.index(corpus, mesh=mesh, autowarm=False),
        "std": SearchArray.index(corpus, tokenizer=std_tokenizer, mesh=mesh,
                                 autowarm=False),
    })
    f1 = pd.DataFrame({
        "ws": SearchArray.index(corpus, autowarm=False),
        "std": SearchArray.index(corpus, tokenizer=std_tokenizer,
                                 autowarm=False),
    })
    s, es = edismax(fs, q="foo-bar baz", qf=["ws", "std^2"], mm="1")
    d, ed = edismax(f1, q="foo-bar baz", qf=["ws", "std^2"], mm="1")
    assert es == ed
    np.testing.assert_allclose(s, d, rtol=1e-6, atol=1e-7)


def test_sharded_score_batch_topk(frames):
    sharded, single = frames
    queries = ["the", ["what", "is"], ["star", "trek"], "nosuchterm"]
    ss, si = sharded["body"].array.score_batch(queries, top_k=5)
    ds, di = single["body"].array.score_batch(queries, top_k=5)
    np.testing.assert_allclose(ss, ds, rtol=1e-6, atol=1e-7)
    # indices may tie-break differently across shardings; scores at the
    # returned indices must match
    dense = single["body"].array.score_batch(queries)
    for i in range(len(queries)):
        np.testing.assert_allclose(dense[i][si[i]], ss[i], rtol=1e-6,
                                   atol=1e-7)


def test_sharded_edismax_phase_pruning_engaged(frames):
    """With the subset threshold forced, sharded edismax phrase phases
    run on the main query's matched rows through the mesh rows engine
    (no full-corpus phrase scoring) and stay in exact parity."""
    from searcharray_tpu import solr as solr_mod
    from searcharray_tpu.parallel import sharded as sharded_mod

    sharded, single = frames
    case = dict(q="what is the star", qf=["body", "title^3"], mm="2",
                pf=["body"], pf2=["body", "title"], pf3=["body"])
    q = case.pop("q")
    d_scores, d_explain = edismax(single, q=q, **case)
    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(solr_mod, "PHASE_SUBSET_MIN_DOCS", 0)
        mp.setattr(solr_mod, "PHASE_SUBSET_MAX_FRAC", 0)
        before = sharded_mod.CAND_PROGRAMS[0]
        s_scores, s_explain = edismax(sharded, q=q, **case)
        n_rows_programs = sharded_mod.CAND_PROGRAMS[0] - before
    finally:
        mp.undo()
    assert n_rows_programs > 0, "sharded rows= phase pruning not engaged"
    assert s_explain == d_explain
    np.testing.assert_allclose(s_scores, d_scores, rtol=1e-6, atol=1e-7)
