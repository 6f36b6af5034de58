"""Dispatch census v2 for 8.8M serving: enqueue cost vs device compute.

Wraps the program launchers WITHOUT blocking (host_t = pure enqueue),
then times blocking and pipelined serving batches for ground truth wall.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SCALES, get_index, serving_queries, slop_queries


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    docs, _ = get_index("8.8m", SCALES["8.8m"], None, ".bench_cache")

    from searcharray_tpu.search import batch as B
    from searcharray_tpu.search import dense as D

    def serving_mixed(r):
        return (serving_queries(r) + slop_queries(r), [0] * 120 + [2] * 24)

    census = {}
    times = {}

    def wrap(mod, name):
        orig = getattr(mod, name)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            dt = time.perf_counter() - t0  # enqueue only: NO block here
            if name == "_run_super":
                specs = a[1]
                key = ("super", tuple(sorted({s["gkey"][0] for s in specs})),
                       len(specs))
            elif name == "_run_class_stack":
                key = ("stack", a[1][0]["gkey"][0], len(a[1]))
            else:
                key = (name,)
            census[key] = census.get(key, 0) + 1
            times[key] = times.get(key, 0.0) + dt
            return out

        setattr(mod, name, wrapped)

    wrap(B, "_run_super")
    wrap(B, "_run_class_stack")
    wrap(D, "ensure_batch")

    t0 = time.perf_counter()
    for p in range(2):
        for r in range(4):
            b, s = serving_mixed(r)
            docs.score_batch(b, top_k=10, slop=s)
        log(f"warm pass {p}: {time.perf_counter() - t0:.1f}s cumulative")

    census.clear()
    times.clear()
    # blocking: per-batch wall
    walls = []
    for r in range(4):
        b, s = serving_mixed(r)
        t0 = time.perf_counter()
        docs.score_batch(b, top_k=10, slop=s)
        walls.append(time.perf_counter() - t0)
    log(f"blocking batch walls: {[f'{w*1000:.0f}ms' for w in walls]} "
        f"-> {4 * 144 / sum(walls):.0f} qps")
    log("enqueue census (4 batches, no block):")
    for k in sorted(census, key=lambda k: -times[k]):
        log(f"  {k}: n={census[k]} enqueue_t={1000 * times[k]:.0f} ms")

    # pipelined
    census.clear()
    times.clear()
    t0 = time.perf_counter()
    hs = []
    for r in range(4):
        b, s = serving_mixed(r)
        hs.append(docs.score_batch(b, top_k=10, slop=s, block=False))
    t_enq = time.perf_counter() - t0
    [h() for h in hs]
    dt = time.perf_counter() - t0
    log(f"pipelined 4 batches: enqueue {t_enq:.2f}s, total {dt:.2f}s "
        f"-> {4 * 144 / dt:.0f} qps")

    # single-program steady-state: loop the hottest stack key 5x via
    # serving the same batch repeatedly, blocking only at the end
    t0 = time.perf_counter()
    hs = [docs.score_batch(*[serving_mixed(0)[0]], top_k=10,
                           slop=serving_mixed(0)[1], block=False)
          for _ in range(5)]
    [h() for h in hs]
    dt = time.perf_counter() - t0
    log(f"5x same batch pipelined: {dt:.2f}s -> {5 * 144 / dt:.0f} qps")


main()
