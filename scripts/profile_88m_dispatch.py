"""Dispatch census for 8.8M serving batches from the bench cache."""
import sys
import time

import numpy as np

import os
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

    # census: wrap _run_super / _run_class_stack / ensure_batch
    census = {}
    times = {}

    def wrap(mod, name):
        orig = getattr(mod, name)

        def wrapped(*a, **k):
            import jax
            t0 = time.perf_counter()
            out = orig(*a, **k)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
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
    dev = docs.dev
    log(f"plane pool: cap={D.plane_capacity(dev)} "
        f"row={D.plane_size(dev) * 4 / 1e6:.0f} MB; "
        f"tf pool: cap={D.tf_capacity(dev)} "
        f"row={dev.corpus_size * 4 / 1e6:.0f} MB")

    t0 = time.perf_counter()
    for p in range(2):
        for r in range(4):
            b, s = serving_mixed(r)
            docs.score_batch(b, top_k=10, slop=s)
        log(f"pass {p}: {time.perf_counter() - t0:.1f}s cumulative")

    census.clear()
    times.clear()
    B.DISPATCHES[0] = 0
    t0 = time.perf_counter()
    for r in range(4):
        b, s = serving_mixed(r)
        docs.score_batch(b, top_k=10, slop=s)
    dt = time.perf_counter() - t0
    log(f"4 warm blocking batches: {dt:.2f}s -> {4 * 144 / dt:.0f} qps, "
        f"{B.DISPATCHES[0]} fill dispatches")
    for k in sorted(census, key=lambda k: -times[k]):
        log(f"  {k}: n={census[k]} host_t={1000 * times[k]:.0f} ms")

    # pipelined wave
    t0 = time.perf_counter()
    hs = []
    for r in range(4):
        b, s = serving_mixed(r)
        hs.append(docs.score_batch(b, top_k=10, slop=s, block=False))
    [h() for h in hs]
    dt = time.perf_counter() - t0
    log(f"pipelined 4 warm batches: {dt:.2f}s -> {4 * 144 / dt:.0f} qps")


main()
