"""Graded-relevance harness: MRR@10 against an independent oracle.

BASELINE.json's north star is MRR@10 parity on MSMARCO; real MSMARCO is
egress-blocked in this environment (BASELINE.md), so this harness checks
ranking *correctness* on a synthetic corpus with checked-in construction:

* qrels are derived by brute force (tokenize-and-membership, the
  reference's ``naive_find_term`` idea, `/root/reference/test/
  test_utils.py:54-57`): a doc is relevant to a query iff it literally
  contains the term / consecutive phrase;
* an independent pure-numpy Lucene-BM25 oracle (written against the
  formula, sharing no code with the engine) produces the reference
  ranking;
* the engine's MRR@10 must match the oracle's exactly and clear an
  absolute floor — "the ranking didn't change" becomes "the ranking is
  right".
"""
import math

import numpy as np
import pytest

from searcharray_tpu import SearchArray


def _naive_phrase_count(tokens, phrase):
    n = len(phrase)
    return sum(1 for i in range(len(tokens) - n + 1)
               if tokens[i: i + n] == phrase)


class NumpyBM25Oracle:
    """Independent Lucene-9 BM25 (k1=1.2, b=0.75) over tokenized docs."""

    def __init__(self, corpus):
        self.docs = [d.split() for d in corpus]
        self.N = len(corpus)
        self.doc_lens = np.array([len(d) for d in self.docs], dtype=np.float64)
        self.avg_dl = self.doc_lens.mean() if self.N else 0.0

    def score(self, query):
        terms = [query] if isinstance(query, str) else query
        if isinstance(query, str):
            tfs = np.array([d.count(query) for d in self.docs], np.float64)
            df = int((tfs > 0).sum())
            idf = math.log(1 + (self.N - df + 0.5) / (df + 0.5))
        else:
            tfs = np.array(
                [_naive_phrase_count(d, terms) for d in self.docs],
                np.float64)
            idf = 0.0
            for t in terms:
                df = sum(1 for d in self.docs if t in d)
                idf += math.log(1 + (self.N - df + 0.5) / (df + 0.5))
        denom = tfs + 1.2 * (1 - 0.75 + 0.75 * self.doc_lens / self.avg_dl)
        with np.errstate(invalid="ignore"):
            part = np.where(tfs > 0, tfs / denom, 0.0)
        return part * idf

    def relevant(self, query):
        if isinstance(query, str):
            return {i for i, d in enumerate(self.docs) if query in d}
        return {i for i, d in enumerate(self.docs)
                if _naive_phrase_count(d, list(query)) > 0}


def mrr_at_k(rankings, qrels, k=10):
    total = 0.0
    for ranked, rel in zip(rankings, qrels):
        rr = 0.0
        for pos, doc in enumerate(ranked[:k]):
            if doc in rel:
                rr = 1.0 / (pos + 1)
                break
        total += rr
    return total / len(rankings)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(99)
    vocab = ["apollo", "luna", "mars", "rover", "gale", "crater",
             "mission", "launch", "orbit", "sample"] + [
        f"v{i}" for i in range(200)]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(8, 60), p=probs))
        for _ in range(1500)
    ]
    # planted high-relevance docs for the query set
    docs[100] = "the apollo mission launch apollo mission " + docs[100]
    docs[200] = "mars rover gale crater sample " + docs[200]
    docs[300] = "luna orbit luna orbit luna orbit"
    return docs


QUERY_SET = [
    "apollo", "rover", "crater", "v17",
    ["apollo", "mission"], ["mars", "rover"], ["gale", "crater"],
    ["luna", "orbit"], ["apollo", "mission", "launch"],
]


def test_mrr_at_10_matches_oracle(corpus):
    arr = SearchArray.index(corpus)
    oracle = NumpyBM25Oracle(corpus)

    qrels = [oracle.relevant(q) for q in QUERY_SET]
    assert all(len(r) > 0 for r in qrels), "every query must have qrels"

    scores, idx = arr.score_batch(QUERY_SET, top_k=10)
    engine_rank = [list(idx[i]) for i in range(len(QUERY_SET))]

    oracle_rank = []
    for q in QUERY_SET:
        s = oracle.score(q)
        oracle_rank.append(list(np.argsort(-s, kind="stable")[:10]))

    m_engine = mrr_at_k(engine_rank, qrels)
    m_oracle = mrr_at_k(oracle_rank, qrels)
    # BM25 puts a relevant doc at rank 1 for every query by construction
    assert m_oracle == pytest.approx(1.0)
    assert m_engine == pytest.approx(m_oracle)

    # score-level agreement with the independent oracle (float32 vs
    # float64 drift only)
    for i, q in enumerate(QUERY_SET):
        s = oracle.score(q)
        np.testing.assert_allclose(scores[i],
                                   np.sort(s)[::-1][:10].astype(np.float32),
                                   rtol=2e-4, atol=1e-5, err_msg=str(q))


def test_mrr_with_candidate_engine(corpus, monkeypatch):
    """The candidate-subset engine must not change retrieval quality."""
    from searcharray_tpu.search import candidates as cand_mod

    monkeypatch.setattr(cand_mod, "CAND_MIN_DOCS", 0)
    monkeypatch.setattr(cand_mod, "CAND_TERM_MIN_DOCS", 0)
    monkeypatch.setattr(cand_mod, "CAND_MAX_FRAC", 0)
    arr = SearchArray.index(corpus)
    oracle = NumpyBM25Oracle(corpus)
    qrels = [oracle.relevant(q) for q in QUERY_SET]
    _scores, idx = arr.score_batch(QUERY_SET, top_k=10)
    m = mrr_at_k([list(r) for r in idx], qrels)
    assert m == pytest.approx(1.0)
