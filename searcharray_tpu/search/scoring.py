"""Single-term stats and BM25 scoring kernels.

Replaces the reference call stack `termfreqs -> popcount64_reduce ->
as_dense -> bm25_score` (`postings.py:607-636`, `popcount.pyx:271`,
`scatter_assign.h:6`, `bm25.pyx:28`) with one fused XLA computation per
term: gather slice -> payload popcount -> segment scatter-add into the
dense corpus vector -> (optionally) BM25.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS, MAX_POSN


def _jit(fn, **kw):
    import jax

    return jax.jit(fn, **kw)


def _term_stats_impl(data, off, n, min_blk, max_blk, *, bucket, num_docs):
    import jax.numpy as jnp

    words, valid = K.take_term_slice(data, off, n, min_blk, max_blk, bucket=bucket)
    keys = K.word_keys(words)
    keys = jnp.where(valid, keys, 0)
    pops = K.payload_popcount(words).astype(jnp.float32)
    pops = jnp.where(valid, pops, 0.0)
    tfs = jnp.zeros(num_docs, dtype=jnp.float32).at[keys].add(pops)
    # docfreq counts distinct keys among *original* (unwindowed) words.
    newdoc = K.segment_new_doc(keys, valid)
    df = jnp.sum(newdoc.astype(jnp.int32))
    return tfs, df


_term_stats_cache: dict = {}


def term_stats(
    index: DeviceIndex,
    term_id: int,
    min_posn: Optional[int] = None,
    max_posn: Optional[int] = None,
):
    """Dense float32 term freqs over the whole corpus + docfreq (device)."""
    off, n, bucket = index.term_span(term_id)
    min_blk, max_blk = _window_blocks(min_posn, max_posn)
    key = (bucket, index.corpus_size, id(type(index)))
    fn = _term_stats_cache.get(key)
    if fn is None:
        fn = _jit(
            partial(_term_stats_impl, bucket=bucket, num_docs=index.corpus_size)
        )
        _term_stats_cache[key] = fn
    return fn(index.data, off, n, min_blk, max_blk)


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


def docfreq(index: DeviceIndex, term_id: int) -> int:
    """Number of documents containing the term (host int, cached)."""
    cached = index._df_cache.get(term_id)
    if cached is not None:
        return cached
    _, df = term_stats(index, term_id)
    df = int(df)
    index._df_cache[term_id] = df
    return df


def termfreqs_dense(
    index: DeviceIndex,
    term_id: int,
    min_posn: Optional[int] = None,
    max_posn: Optional[int] = None,
):
    tfs, df = term_stats(index, term_id, min_posn, max_posn)
    if min_posn is None and max_posn is None and term_id not in index._df_cache:
        index._df_cache[term_id] = int(df)
    return tfs
