"""Scan-amortized per-op kernel timings at 8.8M-doc shapes.

Dispatch-timed loops through the axon tunnel measure the ~28 ms sync
round trip, not the kernel (CLAUDE.md).  Every op here runs R times
inside ONE program via lax.scan (each iteration's operand derived from
the carry so XLA cannot hoist it), so per-op time = (wall - noop) / R.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, R=8):
    import jax

    out = fn(*args)  # compile
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    wall = time.perf_counter() - t0
    return wall / R


def scanned(body, R):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(*args):
        def step(acc, i):
            return acc + body(i, *args), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(R, dtype=jnp.int32))
        return acc
    return f


def main():
    import jax
    import jax.numpy as jnp

    R = 8
    N = 8_841_823
    S = 8
    NS = N * S
    rng = np.random.default_rng(0)
    results = {}

    # noop floor
    noop = jax.jit(lambda x: x + 1)
    z = jnp.zeros(8, jnp.float32)
    np.asarray(noop(z))
    t0 = time.perf_counter()
    np.asarray(noop(z))
    noop_s = time.perf_counter() - t0
    results["noop_roundtrip_ms"] = noop_s * 1e3

    # --- plane ops -----------------------------------------------------
    plane = jnp.asarray(rng.integers(0, 2**32, NS, dtype=np.uint32))
    plane2 = jnp.asarray(rng.integers(0, 2**32, NS, dtype=np.uint32))

    def popsum(i, a, b):
        x = jax.lax.population_count(a + i.astype(jnp.uint32))
        return x.sum().astype(jnp.float32)

    results["popcount_sum_283MB_ms"] = (
        timed(scanned(popsum, R), plane, plane2, R=R) - noop_s / R) / 1 * 1e3

    from searcharray_tpu.search.dense import _slot_sum

    def slotsum(i, a, b):
        f = jax.lax.population_count(a + i.astype(jnp.uint32)).astype(
            jnp.float32)
        return _slot_sum(f, S).sum()

    results["popcount_slotsum_283MB_ms"] = (
        timed(scanned(slotsum, R), plane, plane2, R=R) - noop_s / R) * 1e3

    # dspan-style window dilation (w=3) over full planes, T=2
    def dilate(i, a, b):
        aa = a + i.astype(jnp.uint32)
        d = aa | (aa << jnp.uint32(1)) | (aa >> jnp.uint32(1))
        d = d | (d << jnp.uint32(1)) | (d >> jnp.uint32(1))
        hit = d & b
        return jax.lax.population_count(hit).sum().astype(jnp.float32)

    results["dilate_w3_2x283MB_ms"] = (
        timed(scanned(dilate, R), plane, plane2, R=R) - noop_s / R) * 1e3

    # --- candidate-style ops at Kc = 1M --------------------------------
    for Kc in (262_144, 1_048_576, 4_194_304):
        rows_np = np.sort(rng.choice(N, Kc, replace=False)).astype(np.int32)
        rows = jnp.asarray(rows_np)
        flat_idx = (rows[:, None] * S
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)

        def gather_flat(i, p, fi):
            return jnp.take(p, fi + i, mode="clip").astype(
                jnp.uint32).sum().astype(jnp.float32)

        results[f"pool_gather_flat_Kc{Kc}_ms"] = (
            timed(scanned(gather_flat, R), plane, flat_idx, R=R)
            - noop_s / R) * 1e3

        p2d = plane.reshape(N, S)

        def gather_rows(i, p, r):
            return jnp.take(p, jnp.minimum(r + i, N - 1), axis=0).astype(
                jnp.uint32).sum().astype(jnp.float32)

        results[f"pool_gather_rows_Kc{Kc}_ms"] = (
            timed(scanned(gather_rows, R), p2d, rows, R=R)
            - noop_s / R) * 1e3

        def imap_build(i, r):
            m = jnp.full(N, jnp.int32(-1)).at[jnp.minimum(r + i, N - 1)].set(
                jnp.arange(Kc, dtype=jnp.int32), mode="drop")
            return m.sum().astype(jnp.float32)

        results[f"imap_build_Kc{Kc}_ms"] = (
            timed(scanned(imap_build, R), rows, R=R) - noop_s / R) * 1e3

        # mini scatter: bucket-sized payload scatter into a Kc*S plane
        B = Kc  # mini bucket ~ Kc
        sidx = jnp.asarray(
            np.sort(rng.integers(0, Kc * S, B)).astype(np.int32))
        pays = jnp.asarray(rng.integers(0, 2**32, B, dtype=np.uint32))

        def mini_scatter(i, si, pv):
            m = jnp.zeros(Kc * S, jnp.uint32).at[si + i].set(
                pv, mode="drop")
            return m.sum().astype(jnp.float32)

        results[f"mini_scatter_B{B}_ms"] = (
            timed(scanned(mini_scatter, R), sidx, pays, R=R)
            - noop_s / R) * 1e3

    # topk_exact over a [16, N] stack
    from searcharray_tpu.ops.kernels import topk_exact

    stack = jnp.asarray(rng.random((16, N), dtype=np.float32))

    def tk(i, s):
        v, _ = topk_exact(s + i.astype(jnp.float32), 10)
        return v.sum()

    results["topk16xN_ms"] = (
        timed(scanned(tk, 4), stack, R=4) - noop_s / 4) * 1e3

    # tf row gather [20, N] out of a pool-like [22, N]
    tfpool = jnp.asarray(rng.random((22, N), dtype=np.float32))
    slots = jnp.asarray((np.arange(20) % 22).astype(np.int32))

    def tfg(i, p, sl):
        g = jnp.take(p, jnp.minimum(sl + i % 2, 21), axis=0)
        return g.sum()

    results["tfgather_20xN_ms"] = (
        timed(scanned(tfg, 4), tfpool, slots, R=4) - noop_s / 4) * 1e3

    for k, v in sorted(results.items()):
        log(f"{k:34s} {v:10.3f}")
    import json

    print(json.dumps(results))


main()
