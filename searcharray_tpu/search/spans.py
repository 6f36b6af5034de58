"""Slop-N phrase matching as a windowed bitmap kernel.

The reference implements slop search as a sequential 512-slot span automaton
(`/root/reference/searcharray/roaringish/spans.pyx:189-330`) — inherently
serial, per-doc control flow.  The TPU formulation is a fixed-shape sliding
window test:

  A doc position ``p`` of the *rarest* query term is **covered** if some
  window ``[s, s+w]`` with ``s <= p <= s+w`` and ``w = n + slop - 1``
  contains at least ``m_t`` occurrences of every distinct query term ``t``
  (``m_t`` = multiplicity of ``t`` in the query, ``n`` = query length).
  The doc's slop frequency is its number of covered anchor positions.

This enforces the automaton's *intended* span-width bound (span width
< n + slop, `spans.pyx:131,216`) and preserves the metamorphic invariants
the reference tests assert (`test_phrase_matches.py:206-221`): slop counts
are >= exact phrase counts (each exact occurrence covers a distinct anchor
position) and are monotone non-decreasing in slop (the window set only
grows).

Known divergence (deliberate): the shipped automaton leaks position bits
into spans on *cancelled* updates (`spans.pyx:263` runs before the
cancellation at `spans.pyx:267-270`), which completes width-0 spans via the
``num_posns == num_terms`` clause (`spans.pyx:125-128`).  The observable
effect is that reference slop search matches any document containing all
query terms at **any** distance (verified empirically: ``foo@0 bar@50``
matches at slop=1).  The reference marks slop "experimental … inaccurate"
(`postings.py:694`).  This implementation applies the width bound soundly
instead, i.e. strictly fewer false positives, Lucene-SpanNear-like.

Per anchor word, each term's neighbourhood (blocks b-C .. b+C) is gathered
by header alignment, expanded to a bit raster, and window counts come from
prefix sums — all static shapes, all vector ops.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS
from searcharray_tpu.search.scoring import (
    _window_blocks,
    apply_similarity_device,
    host_idf,
)

_BLK_FIELD = (1 << 18) - 1  # block bits within the 46-bit header


def _span_impl(hdrs, pays, offs, ns, doc_lens, idf, avgdl, min_blk, max_blk,
               *, buckets, anchor_i, mults, w, C, num_docs, windowed,
               kind, k1, b, blk_bits, segsum_wpb=None):
    import jax.numpy as jnp

    mb = (min_blk, max_blk) if windowed else (None, None)
    planes = [
        K.take_term_planes(hdrs, pays, offs[i], ns[i], *mb,
                           bucket=buckets[i], blk_bits=blk_bits)
        for i in range(len(buckets))
    ]
    a_hdr, a_pay = planes[anchor_i]
    T = len(planes)
    A = a_hdr.shape[0]
    lanes_n = 2 * C + 1
    B = lanes_n * LSB_BITS
    blk_field = (1 << blk_bits) - 1

    a_valid = a_hdr != jnp.int32(K.PAD_HDR32)
    a_blk = a_hdr & jnp.int32(blk_field)

    deltas = jnp.arange(-C, C + 1, dtype=jnp.int32)
    blk_ok = (
        (a_blk[:, None] + deltas[None, :] >= 0)
        & (a_blk[:, None] + deltas[None, :] <= blk_field)
    )
    targets = a_hdr[:, None] + deltas[None, :]

    lane_list = []
    for t_hdr, t_pay in planes:
        sz = t_hdr.shape[0]
        i = jnp.searchsorted(t_hdr, targets.reshape(-1)).reshape(A, lanes_n)
        i_c = jnp.clip(i, 0, sz - 1)
        hit = (t_hdr[i_c] == targets) & blk_ok
        lane_list.append(jnp.where(hit, t_pay[i_c], jnp.uint32(0)))
    lanes = jnp.stack(lane_list, axis=1)  # [A, T, lanes_n]

    bitpos = jnp.arange(LSB_BITS, dtype=jnp.uint32)
    bits = ((lanes[..., :, None] >> bitpos) & 1).astype(jnp.int32)
    bits = bits.reshape(A, T, B)
    prefix = jnp.concatenate(
        [jnp.zeros((A, T, 1), jnp.int32), jnp.cumsum(bits, axis=-1)], axis=-1
    )  # [A, T, B+1]

    S0 = LSB_BITS * C - w
    L = w + LSB_BITS
    starts = S0 + jnp.arange(L)
    cnt = prefix[..., starts + w + 1] - prefix[..., starts]  # [A, T, L]
    m = jnp.asarray(mults, dtype=jnp.int32)
    ok = jnp.all(cnt >= m[None, :, None], axis=1)  # [A, L]
    okc = jnp.concatenate(
        [jnp.zeros((A, 1), jnp.int32), jnp.cumsum(ok.astype(jnp.int32), axis=-1)],
        axis=-1,
    )  # [A, L+1]

    b0 = jnp.arange(LSB_BITS)
    any_win = (okc[:, b0 + w + 1] - okc[:, b0]) > 0  # [A, 18]
    a_bits = ((a_pay[:, None] >> bitpos) & 1) == 1
    covered = a_bits & any_win & a_valid[:, None]

    counts = jnp.where(a_valid, jnp.sum(covered, axis=1).astype(jnp.float32),
                       0.0)
    keys = (a_hdr >> jnp.int32(blk_bits)).astype(jnp.int32)
    if segsum_wpb is not None:
        from searcharray_tpu.ops.pallas.score import segment_sum_pallas

        freqs = segment_sum_pallas(keys, counts, num_docs=num_docs,
                                   max_words_per_block=min(A, segsum_wpb))
    else:
        freqs = jnp.zeros(num_docs, dtype=jnp.float32).at[keys].add(
            counts, mode="drop"
        )
    return apply_similarity_device(kind, freqs, doc_lens, idf, avgdl, k1, b)


_span_cache: dict = {}


def span_freqs_dense(
    index: DeviceIndex,
    term_ids: List[int],
    slop: int,
    min_posn: Optional[int] = None,
    max_posn: Optional[int] = None,
    kind: str = "none", k1: float = 1.2, b: float = 0.75,
    idf: Optional[float] = None,
):
    """Dense per-doc slop-phrase frequencies or scores (one dispatch)."""
    import jax

    if len(term_ids) < 2:
        raise ValueError("Must have at least two terms")
    min_blk, max_blk = _window_blocks(min_posn, max_posn)
    windowed = min_posn is not None or max_posn is not None

    n = len(term_ids)
    w = n + slop - 1
    C = -(-w // LSB_BITS)  # ceil

    uniq: List[int] = []
    mults: List[int] = []
    for t in term_ids:
        if t in uniq:
            mults[uniq.index(t)] += 1
        else:
            uniq.append(t)
            mults.append(1)

    spans = [index.term_span(t) for t in uniq]
    if min(s[1] for s in spans) == 0:
        import jax.numpy as jnp

        return jnp.zeros(index.corpus_size, dtype=jnp.float32)

    anchor_i = int(np.argmin([s[1] for s in spans]))
    buckets = tuple(s[2] for s in spans)
    if idf is None:
        idf = host_idf(kind, [index.doc_freqs[t] for t in term_ids],
                       index.corpus_size, index.avg_doc_length)

    # dense block-layout path: elementwise dilations, no searchsorted
    # neighbourhoods (the measured-slow dependent-gather pattern); needs
    # a window within one slot shift and term multiplicity <= 2 (the
    # pair-dilation trick covers repeated terms like stopword slop)
    if (not windowed and w <= LSB_BITS and all(m <= 2 for m in mults)):
        from searcharray_tpu.search import dense as dense_mod

        if (dense_mod.dense_eligible(index)
                and dense_mod.phrase_fits_pool(index, uniq)):
            return dense_mod.score_span_dense(index, uniq, anchor_i, w,
                                              kind, k1, b, idf,
                                              mults=tuple(mults))

    from searcharray_tpu.search.phrase import _segsum_wpb

    segsum_wpb = _segsum_wpb(index)

    key = ("span", index.corpus_size, index.blk_bits, w, C, tuple(mults),
           buckets, anchor_i, windowed, kind, k1, b, segsum_wpb)
    fn = _span_cache.get(key)
    if fn is None:
        fn = jax.jit(
            partial(
                _span_impl,
                buckets=buckets,
                anchor_i=anchor_i,
                mults=tuple(mults),
                w=w,
                C=C,
                num_docs=index.corpus_size,
                windowed=windowed,
                kind=kind,
                k1=k1,
                b=b,
                blk_bits=index.blk_bits,
                segsum_wpb=segsum_wpb,
            )
        )
        _span_cache[key] = fn
    offs = tuple(np.int64(s[0]) for s in spans)
    ns = tuple(np.int64(s[1]) for s in spans)
    return fn(index.hdrs, index.pays, offs, ns, index.doc_lens,
              np.float32(idf), np.float32(max(index.avg_doc_length, 1e-38)),
              min_blk, max_blk)
