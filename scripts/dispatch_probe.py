"""Count programs-per-batch for the bench's 144-query serving batch under
the huge-corpus (8.8M) routing, on a tiny CPU corpus.

The per-batch dispatch count IS the serving budget on the tunneled TPU
(~6-9 ms host enqueue per program regardless of compute), so this probe is
the fast structural proxy for the 8.8M pipelined qps: steady-state
programs/batch x enqueue cost ~= batch wall time.

Usage: python scripts/dispatch_probe.py [n_batches]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    corpus = bench.build_corpus(30_000)
    docs = SearchArray.index(corpus, autowarm=False)

    # the 8.8M routing configuration (same as tests/test_dispatch_count.py)
    cand_mod.CAND_MIN_DOCS = 0
    cand_mod.CAND_TERM_MIN_DOCS = 0
    cand_mod.CAND_MAX_FRAC = 1.0  # tiny corpus: keep candidate routing on
    batch_mod._SUPER_FUSE_MAX_DOCS = 0

    def serving_mixed(r):
        return (bench.serving_queries(r) + bench.slop_queries(r),
                [0] * 120 + [2] * 24)

    # warm passes: compiles + phrase-tf promotion (2nd visit re-keys)
    for _ in range(2):
        for r in list(range(n_batches)) + [1000 + x for x in range(n_batches)]:
            b, s = serving_mixed(r)
            docs.score_batch(b, top_k=10, slop=s)

    counts = []
    for r in range(n_batches):
        batch_mod.DISPATCHES[0] = 0
        b, s = serving_mixed(1000 + r)
        docs.score_batch(b, top_k=10, slop=s)
        counts.append(batch_mod.DISPATCHES[0])
    print("steady-state programs/batch:", counts)
    print("mean {:.1f}  min {}  max {}".format(
        np.mean(counts), min(counts), max(counts)))

    # breakdown for one batch
    batch_mod.DISPATCHES[0] = 0
    b, s = serving_mixed(1000 + n_batches)
    tids = [docs._resolve_tids([q] if isinstance(q, str) else q) for q in b]
    groups, zero_rows, fb_rows = batch_mod._classify(
        docs.dev, tids, "bm25", top_k=10, allow_candidates=True, slop=s)
    from collections import Counter
    kinds = Counter(g[0] for g in groups)
    print("group classes:", dict(kinds), " distinct gkeys:", len(groups),
          " fallback rows:", len(fb_rows))
    docs.score_batch(b, top_k=10, slop=s)
    print("fresh-variant batch programs:", batch_mod.DISPATCHES[0])


if __name__ == "__main__":
    main()
