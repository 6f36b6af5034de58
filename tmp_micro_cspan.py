"""Ad-hoc: decompose the cspan cost at 8.8M shapes on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import SCALES, get_index


def log(m):
    print(m, file=sys.stderr, flush=True)


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(name, fn, *args, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    log(f"  {name}: first run {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {1000 * dt:.1f} ms")
    return out


def main():
    docs, _ = get_index("8.8m", SCALES["8.8m"], None, ".bench_cache")
    dev = docs.dev
    N = dev.corpus_size
    S = 1 << dev.blk_bits
    log(f"N={N} S={S} blk_bits={dev.blk_bits}")

    Qp, Kc, T = 16, 65536, 3
    key = jax.random.PRNGKey(0)
    rows = jnp.sort(jax.random.randint(key, (Qp, Kc), 0, N, jnp.int32), 1)

    # (b) pool gather: Kc*S slots from a big plane, x Qp
    plane = jnp.zeros(N * S, jnp.uint32)

    def pool_gather(plane, rows):
        def one(r):
            flat = (jnp.clip(r, 0, N - 1)[:, None] * jnp.int32(S)
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
            return jnp.take(plane, flat, mode="clip").sum()
        return jax.vmap(one)(rows)

    timeit("pool gather [16 x Kc*S] x1 term", jax.jit(pool_gather), plane,
           rows)

    # (d) span kernel on minis
    from searcharray_tpu.search.dense import span_counts_dense_planes

    minis = [jnp.ones((Qp, Kc * S), jnp.uint32) for _ in range(T)]

    def span(m0, m1, m2):
        def one(a, b, c):
            return span_counts_dense_planes([a, b, c], 0, 2, Kc, S,
                                            mults=(1, 1, 1))
        return jax.vmap(one)(m0, m1, m2)

    timeit("span kernel [16, 3, Kc*S] w=2", jax.jit(span), *minis)

    # (e) full-width slice of the rarest term at a big bucket
    from searcharray_tpu.search.candidates import _slice_keys
    B = 65536
    ds = {"N": N, "blk_bits": dev.blk_bits}

    def slice_big(hdrs, pays_):
        def one(off):
            k, b, p, v = _slice_keys(ds, hdrs, pays_, off, jnp.int32(B), B)
            return k.sum() + p.sum()
        return jax.vmap(one)(jnp.zeros(Qp, jnp.int32))

    timeit("slice_keys [16 x 64k]", jax.jit(slice_big), dev.hdrs, dev.pays)

    # (a) vmapped imap build: [Qp, N] full + scatter  (suspected slow)
    def build_imap(rows):
        def one(r):
            return jnp.full(N, jnp.int32(-1)).at[r].set(
                jnp.arange(Kc, dtype=jnp.int32), mode="drop",
                indices_are_sorted=True)
        return jax.vmap(one)(rows)

    imap = timeit("imap build [16, 8.8M]", jax.jit(build_imap), rows, n=1)

    # (c) mini scatter: bucket-width updates into [Kc*S]
    keys_i = jnp.sort(jax.random.randint(key, (Qp, B), 0, N, jnp.int32), 1)
    pays = jnp.ones((Qp, B), jnp.uint32)

    def mini_scatter(imap, keys_i, pays):
        def one(im, k, p):
            ci = jnp.take(im, k)
            hit = ci >= 0
            sidx = jnp.where(hit, jnp.clip(ci, 0, Kc - 1) * S, Kc * S)
            return jnp.zeros(Kc * S, jnp.uint32).at[sidx].set(
                p, mode="drop").sum()
        return jax.vmap(one)(imap, keys_i, pays)

    timeit("imap gather+mini scatter [16 x 64k]", jax.jit(mini_scatter),
           imap, keys_i, pays)


main()
