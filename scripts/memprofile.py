"""Host-memory profile of an index build (the reference's
``make memory_profile`` / memray analog; memray is not in this image, so
this uses tracemalloc + RUSAGE, which need no extra deps).

Reports: peak tracemalloc during build, RSS before/after, the index's own
nbytes accounting, and the top allocation sites.  One JSON line on
stdout; human detail on stderr.

Usage: python scripts/memprofile.py [--docs N]
"""
import argparse
import json
import os
import resource
import sys
import time
import tracemalloc

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(30_000)])
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.07
    probs /= probs.sum()
    lens = rng.integers(20, 90, size=args.docs)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    words = vocab[rng.choice(len(vocab), size=int(bounds[-1]), p=probs)]
    corpus = [" ".join(words[bounds[d]: bounds[d + 1]])
              for d in range(args.docs)]
    del words

    from searcharray_tpu import SearchArray

    rss0 = rss_mb()
    tracemalloc.start(10)
    t0 = time.perf_counter()
    docs = SearchArray.index(corpus, autowarm=False)
    build_s = time.perf_counter() - t0
    current, peak = tracemalloc.get_traced_memory()
    snap = tracemalloc.take_snapshot()
    tracemalloc.stop()

    log(f"build: {build_s:.1f}s  docs={args.docs}")
    log("top allocation sites during build:")
    for stat in snap.statistics("lineno")[:8]:
        log(f"  {stat.size / 1e6:9.1f} MB  {stat.traceback[0]}")
    log(docs.memory_report()[:1200])

    print(json.dumps({
        "docs": args.docs,
        "build_s": round(build_s, 2),
        "tracemalloc_peak_mb": round(peak / 1e6, 1),
        "tracemalloc_current_mb": round(current / 1e6, 1),
        "rss_before_mb": round(rss0, 1),
        "rss_peak_mb": round(rss_mb(), 1),
        "index_nbytes_mb": round(docs.nbytes / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
