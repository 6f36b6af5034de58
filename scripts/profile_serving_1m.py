"""Profile 1M serving batches from the saved bench cache."""
import cProfile
import io
import pstats
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SCALES, get_index, serving_queries, slop_queries


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_log_compiles", True)
    docs, _ = get_index("1m", SCALES["1m"], None, ".bench_cache")

    def serving_mixed(r):
        return (serving_queries(r) + slop_queries(r), [0] * 120 + [2] * 24)

    # warm the exact sets we will time
    t0 = time.perf_counter()
    for r in range(8):
        b, s = serving_mixed(r)
        docs.score_batch(b, top_k=10, slop=s)
    log(f"warm 8 batches: {time.perf_counter() - t0:.1f}s")

    # instrument: time ensure_batch (incl. a hard block) vs the rest
    import jax
    from searcharray_tpu.search import dense as D
    orig_ensure = D.ensure_batch
    fill_s = [0.0]

    def timed_ensure(dev, plane_tids=(), tf_tids=(), pin_p=(), pin_t=()):
        t0 = time.perf_counter()
        orig_ensure(dev, plane_tids=plane_tids, tf_tids=tf_tids,
                    pin_p=pin_p, pin_t=pin_t)
        if dev.plane_pool is not None:
            jax.block_until_ready(dev.plane_pool)
        if dev.tf_pool is not None:
            jax.block_until_ready(dev.tf_pool)
        fill_s[0] += time.perf_counter() - t0

    D.ensure_batch = timed_ensure
    try:
        from searcharray_tpu.search import batch as B
        B.ensure_batch = timed_ensure
    except Exception:
        pass

    # blocking per-batch timing, warm
    for r in range(8):
        b, s = serving_mixed(r)
        fill_s[0] = 0.0
        t0 = time.perf_counter()
        docs.score_batch(b, top_k=10, slop=s)
        log(f"batch {r}: {1000 * (time.perf_counter() - t0):.1f} ms blocking"
            f"  (ensure_batch {1000 * fill_s[0]:.1f} ms)")

    # pipelined wave, warm
    t0 = time.perf_counter()
    hs = []
    for r in range(8):
        b, s = serving_mixed(r)
        hs.append(docs.score_batch(b, top_k=10, slop=s, block=False))
    [h() for h in hs]
    dt = time.perf_counter() - t0
    log(f"pipelined 8 warm batches: {dt:.2f}s -> {8 * 144 / dt:.0f} qps")

    # cProfile of the host side of one pipelined wave
    pr = cProfile.Profile()
    pr.enable()
    hs = []
    for r in range(8):
        b, s = serving_mixed(r)
        hs.append(docs.score_batch(b, top_k=10, slop=s, block=False))
    [h() for h in hs]
    pr.disable()
    buf = io.StringIO()
    pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(25)
    log(buf.getvalue())


main()
