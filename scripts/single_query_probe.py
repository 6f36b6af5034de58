"""Count device programs per WARM single-query topk() — VERDICT round-4
ask #2: a warm single query should cost <= 2 dispatches (1 scoring
program + the packed-topk transfer).

Runs the bench query mix on a small CPU corpus twice (warm), then counts
DISPATCHES for a third pass, under both the default routing and the
huge-corpus (8.8M) routing.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searcharray_tpu import SearchArray  # noqa: E402
from searcharray_tpu.search import batch as batch_mod  # noqa: E402
from searcharray_tpu.search import candidates as cand_mod  # noqa: E402

import bench  # noqa: E402


def run(docs, label):
    mixed = list(bench.TERM_QUERIES) + list(bench.PHRASE_QUERIES)
    for _ in range(3):
        for q in mixed:
            docs.topk(q, 10)
    counts = {}
    for q in mixed:
        batch_mod.DISPATCHES[0] = 0
        docs.topk(q, 10)
        counts[str(q)] = batch_mod.DISPATCHES[0]
    print(f"[{label}] warm topk() programs per query:")
    for q, c in counts.items():
        print(f"  {c}  {q}")
    print(f"[{label}] max={max(counts.values())} "
          f"mean={np.mean(list(counts.values())):.2f}")


def main():
    corpus = bench.build_corpus(30_000)
    docs = SearchArray.index(corpus, autowarm=False)
    run(docs, "default routing")

    cand_mod.CAND_MIN_DOCS = 0
    cand_mod.CAND_TERM_MIN_DOCS = 0
    cand_mod.CAND_MAX_FRAC = 1.0
    batch_mod._SUPER_FUSE_MAX_DOCS = 0
    docs2 = SearchArray.index(corpus, autowarm=False)
    run(docs2, "8.8M routing")


if __name__ == "__main__":
    main()
