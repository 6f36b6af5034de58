import time, sys
import numpy as np
from bench import SCALES, get_index, serving_queries, slop_queries

def log(m): print(m, file=sys.stderr, flush=True)

docs, _ = get_index("8.8m", SCALES["8.8m"], ".bench_cache", ".bench_cache")

def serving_mixed(r):
    return (serving_queries(r) + slop_queries(r), [0]*120 + [2]*24)

# warm: 2 passes over cheap (1000+) and expensive (0+) sets
for p in range(2):
    for r in [0, 1, 2, 3, 1000, 1001, 1002, 1003]:
        b, s = serving_mixed(r)
        t0 = time.perf_counter()
        docs.score_batch(b, top_k=10, slop=s)
        log(f"warm pass{p} r={r}: {time.perf_counter()-t0:.2f}s")

from searcharray_tpu.search import batch as batch_mod
for r in [0, 1, 2, 3, 1000, 1001, 1002, 1003]:
    b, s = serving_mixed(r)
    batch_mod.DISPATCHES[0] = 0
    t0 = time.perf_counter()
    docs.score_batch(b, top_k=10, slop=s)
    dt = time.perf_counter()-t0
    log(f"timed r={r}: {dt*1000:.0f} ms  programs={batch_mod.DISPATCHES[0]}  ({144/dt:.0f} qps blocking)")
