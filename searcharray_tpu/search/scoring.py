"""Single-term stats and fused BM25 scoring kernels.

Replaces the reference call stack `termfreqs -> popcount64_reduce ->
as_dense -> bm25_score` (`postings.py:607-636`, `popcount.pyx:271`,
`scatter_assign.h:6`, `bm25.pyx:28`) with ONE fused XLA computation per
query: gather slice -> payload popcount -> segment scatter-add into the
dense corpus vector -> similarity.  One dispatch per query matters: on a
tunneled TPU a device round-trip costs ~30 ms, so everything between the
posting buffer and the final score vector lives in a single jit.

Docfreqs are precomputed host-side at build (builder.compute_doc_freqs), so
idf needs no device sync.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS


# ---------------------------------------------------------------------------
# similarity fusion
# ---------------------------------------------------------------------------
def apply_similarity_device(kind, tfs, doc_lens, idf, avgdl, k1, b):
    """Similarity math on device arrays; `kind` is a static string."""
    import jax.numpy as jnp

    k1f = np.float32(k1)
    bf = np.float32(b)
    if kind == "none":
        return tfs
    norm = k1f * ((np.float32(1.0) - bf) + bf * (doc_lens / avgdl))
    if kind == "bm25":
        return (tfs / (tfs + norm)) * idf
    if kind == "bm25_legacy":
        return idf * ((tfs * (k1f + np.float32(1.0))) / (tfs + norm))
    if kind == "bm25_impact":
        return tfs / (tfs + norm)
    if kind == "classic":
        # idf passed in is the classic idf; norm unused
        return idf * jnp.sqrt(tfs) / jnp.sqrt(doc_lens)
    raise ValueError(f"unknown similarity kind {kind}")


def host_idf(kind, dfs, num_docs, avgdl) -> np.float32:
    """Query-level idf scalar, float64 accumulate then float32 narrow
    (parity: similarity.py:19-21 + bm25.pyx C-float cast)."""
    dfs64 = np.asarray(dfs, dtype=np.float64)
    if kind in ("bm25", "bm25_legacy"):
        return np.float32(np.sum(np.log1p((num_docs - dfs64 + 0.5) / (dfs64 + 0.5))))
    if kind == "classic":
        sum_dfs = np.sum(dfs64, axis=0)
        return np.float32(np.log((num_docs + 1) / (sum_dfs + 1)) + 1.0)
    return np.float32(0.0)


# ---------------------------------------------------------------------------
# term stats
# ---------------------------------------------------------------------------
def _term_scores_impl(hdrs, pays, off, n, min_blk, max_blk, doc_lens, idf,
                      avgdl, *, bucket, num_docs, kind, k1, b, blk_bits):
    import jax
    import jax.numpy as jnp

    h, p = K.take_term_planes(hdrs, pays, off, n, min_blk, max_blk,
                              bucket=bucket, blk_bits=blk_bits)
    keys = (h >> jnp.int32(blk_bits)).astype(jnp.int32)
    pops = jax.lax.population_count(p).astype(jnp.float32)
    # PAD rows have payload 0 -> contribute nothing; out-of-range keys drop.
    tfs = jnp.zeros(num_docs, dtype=jnp.float32).at[keys].add(pops, mode="drop")
    return apply_similarity_device(kind, tfs, doc_lens, idf, avgdl, k1, b)


_kernel_cache: dict = {}


def _get_fused(dev: DeviceIndex, bucket: int, kind: str, k1: float, b: float):
    import jax

    key = ("term", dev.corpus_size, dev.blk_bits, bucket, kind, k1, b)
    fn = _kernel_cache.get(key)
    if fn is None:
        fn = jax.jit(
            partial(
                _term_scores_impl,
                bucket=bucket,
                num_docs=dev.corpus_size,
                kind=kind,
                k1=k1,
                b=b,
                blk_bits=dev.blk_bits,
            )
        )
        _kernel_cache[key] = fn
    return fn


def _window_blocks(min_posn, max_posn) -> Tuple[int, int]:
    """Validate and convert a position window to block bounds.

    Parity with the reference's multiple-of-18 contract
    (`roaringish.py:267-282`).
    """
    if min_posn is None and max_posn is None:
        return 0, (1 << 18) - 1
    if min_posn is not None and min_posn % LSB_BITS != 0:
        raise ValueError(f"min_posn must be a multiple of {LSB_BITS}")
    if max_posn is not None and max_posn % LSB_BITS != LSB_BITS - 1:
        raise ValueError(f"max_posn must be a multiple of {LSB_BITS} - 1")
    lo = 0 if min_posn is None else min_posn // LSB_BITS
    hi = (1 << 18) - 1 if max_posn is None else max_posn // LSB_BITS
    return lo, hi


# Pallas fused scorer policy: "auto" uses it on TPU for large posting lists
# (the blocked compare-reduce beats XLA's scatter-add there: measured 3.7 ms
# vs 6.5 ms for a 293k-word term on v5e); small terms and windowed queries
# stay on the XLA path.  "always"/"never" for tests.
PALLAS_MODE = "auto"
_PALLAS_MIN_WORDS = 32768
_PALLAS_DOC_BLOCK = 1024


def _use_pallas(n: int, windowed: bool) -> bool:
    import jax

    if windowed or PALLAS_MODE == "never":
        return False
    if PALLAS_MODE == "always":
        return True
    return jax.default_backend() == "tpu" and n >= _PALLAS_MIN_WORDS


def _pallas_term_fn(dev: DeviceIndex, bucket: int, kind: str, k1: float,
                    b: float, interpret: bool = False, maxw=None):
    import jax

    from searcharray_tpu.ops.pallas.score import block_bounds, score_term_pallas

    doc_block = _PALLAS_DOC_BLOCK
    if maxw is None:
        blocks_per_doc = -(-int(max(1.0, dev._max_doc_len)) // LSB_BITS)
        maxw = min(bucket, doc_block * (blocks_per_doc + 1))
    key = ("pallas_term", dev.corpus_size, dev.blk_bits, bucket, kind, k1, b,
           doc_block, maxw, interpret)
    fn = _kernel_cache.get(key)
    if fn is None:

        def impl(hdrs, pays, off, n, doc_lens, idf, avgdl):
            h, p = K.take_term_planes(hdrs, pays, off, n, bucket=bucket,
                                      blk_bits=dev.blk_bits)
            bounds = block_bounds(h, dev.blk_bits, dev.corpus_size, doc_block)
            return score_term_pallas(
                h, p, doc_lens, bounds, idf, avgdl,
                num_docs=dev.corpus_size, blk_bits=dev.blk_bits, kind=kind,
                k1=k1, b=b, doc_block=doc_block, max_words_per_block=maxw,
                interpret=interpret,
            )

        fn = jax.jit(impl)
        _kernel_cache[key] = fn
    return fn


def docfreq(index: DeviceIndex, term_id: int) -> int:
    """Number of documents containing the term (host table lookup)."""
    return int(index.doc_freqs[term_id])


def termfreqs_dense(index: DeviceIndex, term_id: int,
                    min_posn: Optional[int] = None,
                    max_posn: Optional[int] = None):
    """Dense float32 term freqs over the whole corpus (device, 1 dispatch)."""
    return score_term_dense(index, term_id, kind="none",
                            min_posn=min_posn, max_posn=max_posn)


def score_term_dense(index: DeviceIndex, term_id: int, kind: str = "bm25",
                     k1: float = 1.2, b: float = 0.75,
                     min_posn: Optional[int] = None,
                     max_posn: Optional[int] = None,
                     idf: Optional[float] = None):
    """Fused tf+similarity for one term — a single device dispatch."""
    off, n, bucket = index.term_span(term_id)
    min_blk, max_blk = _window_blocks(min_posn, max_posn)
    if idf is None:
        idf = host_idf(kind, [docfreq(index, term_id)], index.corpus_size,
                       index.avg_doc_length)
    windowed = min_posn is not None or max_posn is not None
    avgdl = np.float32(max(index.avg_doc_length, 1e-38))
    if kind != "none" and not windowed:
        # hot-term fast path: pooled dense tf vector (dense.ensure_tfs)
        # makes repeat scoring one gather + elementwise similarity dispatch
        from searcharray_tpu.search import dense as dense_mod

        if dense_mod.dense_eligible(index):
            dense_mod.ensure_tfs(index, [term_id])
            slot = np.int32(index.tf_slot[term_id])
            key = ("simtf", index.corpus_size, kind, k1, b)
            fn = _kernel_cache.get(key)
            if fn is None:
                import jax

                def f(tfpool, slot_, doc_lens, idf_, avgdl_):
                    return apply_similarity_device(
                        kind, tfpool[slot_], doc_lens, idf_, avgdl_, k1, b)

                fn = jax.jit(f)
                _kernel_cache[key] = fn
            return fn(index.tf_pool, slot, index.doc_lens, np.float32(idf),
                      avgdl)
        tf = index.tf_cache.get(term_id)
        if tf is None:
            # term_tf recurses into this function with kind="none" (which
            # skips this block), then caches the tf vector
            tf = dense_mod.term_tf(index, term_id)
        else:
            index.tf_cache.move_to_end(term_id)
        fn = _kernel_cache.get(("simtf0", index.corpus_size, kind, k1, b))
        if fn is None:
            import jax

            fn = jax.jit(partial(apply_similarity_device, kind, k1=k1, b=b))
            _kernel_cache[("simtf0", index.corpus_size, kind, k1, b)] = fn
        return fn(tf, index.doc_lens, np.float32(idf), avgdl)
    if kind in ("none", "bm25", "bm25_legacy", "bm25_impact") and _use_pallas(
        n, windowed
    ):
        # tight per-term tile bound, rounded up to a tile so compile
        # variants stay bounded
        from searcharray_tpu.ops.pallas.score import WORD_TILE

        maxw = int(index._block_word_max[term_id])
        maxw = -(-max(1, maxw) // WORD_TILE) * WORD_TILE
        fn = _pallas_term_fn(index, bucket, kind, k1, b, maxw=maxw)
        return fn(index.hdrs, index.pays, off, n, index.doc_lens,
                  np.float32(idf), avgdl)
    fn = _get_fused(index, bucket, kind, k1, b)
    return fn(index.hdrs, index.pays, off, n, min_blk, max_blk,
              index.doc_lens, np.float32(idf), avgdl)
