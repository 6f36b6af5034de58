"""Pallas TPU kernel: fused term scoring (tf + BM25) without scatters.

The XLA path builds the dense tf vector with a scatter-add (~10 ns/element
on v5e).  This kernel inverts the loop: the grid walks *output* doc blocks;
each program reads only the posting words whose doc ids fall in its block
(a contiguous range, because postings are doc-sorted — per-block ranges
arrive via scalar prefetch and select the input tiles through the
BlockSpec index map) and reduces them with a vectorised compare-and-sum:

    tf[d] = sum over words w in block-range of
            popcount(pay[w]) * (doc(w) == d)

a one-hot (D x T) mask contraction on the VPU — no scatter, no gather.
BM25 applies in-register before the block is written once to HBM.

Reference path replaced: popcount64_reduce + as_dense + bm25_score
(`popcount.pyx:271`, `roaringish_ops.pyx:84`, `bm25.pyx:28`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WORD_TILE = 1024  # 1-D int32 XLA tiling on v5e is T(1024); block shapes must match


def _kernel(tile_bounds_ref, bounds_ref, hdr_ref, pay_ref, dl_ref,
            param_ref, out_ref, *, doc_block, n_word_tiles, blk_bits, kind):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    t = pl.program_id(1)
    wt = jnp.int32(WORD_TILE)
    w_lo = bounds_ref[g]
    w_hi = bounds_ref[g + 1]
    d0 = g * jnp.int32(doc_block)

    # absolute word index of each lane in this tile (all int32: Mosaic has
    # no 64-bit ints, and x64 weak-type promotion must not leak in)
    base = (tile_bounds_ref[g] + t) * wt
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, WORD_TILE), 1) + base
    in_range = (idx >= w_lo) & (idx < w_hi)

    docs = (hdr_ref[:] >> jnp.int32(blk_bits)).reshape(1, WORD_TILE)
    # Mosaic can't cast u32->f32 directly; hop through i32.
    pops = jax.lax.population_count(pay_ref[:]).astype(jnp.int32).astype(
        jnp.float32
    )
    pops = pops.reshape(1, WORD_TILE)
    row_docs = d0 + jax.lax.broadcasted_iota(jnp.int32, (doc_block, 1), 0)
    onehot = (docs == row_docs) & in_range
    partial_tf = jnp.sum(jnp.where(onehot, pops, 0.0), axis=1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = partial_tf

    @pl.when(t > 0)
    def _():
        out_ref[:] = out_ref[:] + partial_tf

    if kind != "none":

        @pl.when(t == n_word_tiles - 1)
        def _():
            idf = param_ref[0]
            avgdl = param_ref[1]
            k1 = param_ref[2]
            b = param_ref[3]
            tf = out_ref[:]
            norm = k1 * ((1.0 - b) + b * (dl_ref[:] / avgdl))
            sat = tf / (tf + norm)
            if kind == "bm25":
                out_ref[:] = sat * idf
            elif kind == "bm25_impact":
                out_ref[:] = sat
            elif kind == "bm25_legacy":
                out_ref[:] = idf * (tf * (k1 + 1.0)) / (tf + norm)
            else:
                raise ValueError(kind)


def score_term_pallas(hdrs, pays, doc_lens, bounds, idf, avgdl,
                      *, num_docs, blk_bits, kind="bm25",
                      k1=1.2, b=0.75, doc_block=512,
                      max_words_per_block, interpret=False):
    """Score one term over the corpus from its sanitized plane slice.

    ``bounds``: int32[G+1] word-range starts per doc block within the slice
    (via searchsorted over the slice's doc keys; monotone).  The slice is
    padded internally so dynamic tile selection never reads out of range.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = -(-num_docs // doc_block)
    n_word_tiles = max(1, -(-(max_words_per_block + WORD_TILE) // WORD_TILE))

    pad_words = n_word_tiles * WORD_TILE + WORD_TILE
    from searcharray_tpu.ops.kernels import PAD_HDR32

    hdrs = jnp.pad(hdrs, (0, pad_words), constant_values=PAD_HDR32)
    pays = jnp.pad(pays, (0, pad_words), constant_values=0)

    params = jnp.asarray([idf, avgdl, k1, b], dtype=jnp.float32)
    dl_pad = G * doc_block - num_docs
    dl = jnp.pad(doc_lens, (0, dl_pad), constant_values=1.0)

    # tile-aligned block starts precomputed on host side of the kernel so
    # the scalar index maps stay pure int32 (Mosaic has no int64)
    tile_bounds = (bounds // np.int32(WORD_TILE)).astype(jnp.int32)

    # NOTE: index maps must return int32 — under jax_enable_x64 a bare
    # python-int constant becomes i64, which Mosaic cannot legalize.
    def _words_map(g, t, tb, bounds):
        return (tb[g] + t,)

    def _docs_map(g, t, tb, bounds):
        return (g,)

    def _params_map(g, t, tb, bounds):
        return (jnp.int32(0),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, n_word_tiles),
        in_specs=[
            pl.BlockSpec((WORD_TILE,), _words_map),
            pl.BlockSpec((WORD_TILE,), _words_map),
            pl.BlockSpec((doc_block,), _docs_map),
            pl.BlockSpec((4,), _params_map, memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((doc_block,), _docs_map),
    )
    out = pl.pallas_call(
        partial(
            _kernel,
            doc_block=doc_block,
            n_word_tiles=n_word_tiles,
            blk_bits=blk_bits,
            kind=kind,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * doc_block,), jnp.float32),
        interpret=interpret,
    )(tile_bounds, bounds, hdrs, pays, dl, params)
    return out[:num_docs]


def block_bounds(hdr_slice, blk_bits: int, num_docs: int, doc_block: int):
    """Word-range starts per doc block (int32[G+1]), via searchsorted."""
    G = -(-num_docs // doc_block)
    docs = (hdr_slice >> jnp.int32(blk_bits)).astype(jnp.int32)
    starts = jnp.arange(G + 1, dtype=jnp.int32) * doc_block
    return jnp.searchsorted(docs, starts).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Sorted segment-sum: dense per-doc sums from (sorted headers, f32 values).
# Same block-reduce structure as the scorer; replaces XLA scatter-add for
# the phrase chain's per-step doc counts (~10 ns/elem -> ~1 ns/elem).
# ---------------------------------------------------------------------------
def _segsum_kernel(tile_bounds_ref, bounds_ref, doc_ref, val_ref, out_ref,
                   *, doc_block, n_word_tiles):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    t = pl.program_id(1)
    wt = jnp.int32(WORD_TILE)
    w_lo = bounds_ref[g]
    w_hi = bounds_ref[g + 1]
    d0 = g * jnp.int32(doc_block)

    base = (tile_bounds_ref[g] + t) * wt
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, WORD_TILE), 1) + base
    in_range = (idx >= w_lo) & (idx < w_hi)

    docs = doc_ref[:].reshape(1, WORD_TILE)
    vals = val_ref[:].reshape(1, WORD_TILE)
    row_docs = d0 + jax.lax.broadcasted_iota(jnp.int32, (doc_block, 1), 0)
    onehot = (docs == row_docs) & in_range
    partial_sum = jnp.sum(jnp.where(onehot, vals, 0.0), axis=1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = partial_sum

    @pl.when(t > 0)
    def _():
        out_ref[:] = out_ref[:] + partial_sum


def segment_sum_pallas(sorted_docs, values, *, num_docs,
                       max_words_per_block, doc_block=1024, interpret=False):
    """Dense float32[num_docs] sums of ``values`` grouped by ``sorted_docs``.

    ``sorted_docs`` must be non-decreasing int32 (out-of-range ids for
    padding sort above num_docs and are dropped)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = -(-num_docs // doc_block)
    n_word_tiles = max(1, -(-(max_words_per_block + WORD_TILE) // WORD_TILE))
    starts = jnp.arange(G + 1, dtype=jnp.int32) * doc_block
    bounds = jnp.searchsorted(sorted_docs, starts).astype(jnp.int32)
    tile_bounds = (bounds // np.int32(WORD_TILE)).astype(jnp.int32)

    pad = n_word_tiles * WORD_TILE + WORD_TILE
    docs_p = jnp.pad(sorted_docs, (0, pad), constant_values=np.int32(2**30))
    vals_p = jnp.pad(values, (0, pad), constant_values=0.0)

    def _words_map(g, t, tb, bounds):
        return (tb[g] + t,)

    def _out_map(g, t, tb, bounds):
        return (g,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, n_word_tiles),
        in_specs=[
            pl.BlockSpec((WORD_TILE,), _words_map),
            pl.BlockSpec((WORD_TILE,), _words_map),
        ],
        out_specs=pl.BlockSpec((doc_block,), _out_map),
    )
    out = pl.pallas_call(
        partial(_segsum_kernel, doc_block=doc_block,
                n_word_tiles=n_word_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * doc_block,), jnp.float32),
        interpret=interpret,
    )(tile_bounds, bounds, docs_p, vals_p)
    return out[:num_docs]
