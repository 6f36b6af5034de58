"""Profile the pipelined serving loop: python driver cost vs tunnel
enqueue cost per 144-query batch.

Loads a saved bench store (build one with `python bench.py --docs 1m
--save .bench_cache`), warms the serving program set, then cProfiles N
pipelined batches and prints the top host-side costs plus programs/batch.

Usage: python scripts/profile_serving.py [1m|8.8m|100k] [n_batches]
"""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "1m"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    docs, _ = bench.get_index(scale, bench.SCALES[scale], None,
                              ".bench_cache")
    from searcharray_tpu.search import batch as batch_mod

    def serving_mixed(r):
        return (bench.serving_queries(r) + bench.slop_queries(r),
                [0] * 120 + [2] * 24)

    print("warming...", file=sys.stderr, flush=True)
    for _ in range(2):
        for w in list(range(reps)) + [1000 + r for r in range(reps)]:
            b, s = serving_mixed(w)
            docs.score_batch(b, top_k=10, slop=s)

    # measured pass: pipelined submit-then-collect, counting programs
    batch_mod.DISPATCHES[0] = 0
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    handles = []
    for r in range(reps):
        b, s = serving_mixed(1000 + r)
        handles.append(docs.score_batch(b, top_k=10, slop=s, block=False))
    submit_s = time.perf_counter() - t0
    out = [h() for h in handles]
    prof.disable()
    total_s = time.perf_counter() - t0
    del out
    n_prog = batch_mod.DISPATCHES[0]

    qps = reps * 144 / total_s
    print(f"\n{reps} batches: submit {submit_s:.3f}s, total {total_s:.3f}s "
          f"-> {qps:.0f} qps; programs/batch {n_prog / reps:.1f} "
          f"({1000 * submit_s / max(1, n_prog):.2f} ms/program submit)")

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
