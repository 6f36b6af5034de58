"""Exact phrase matching: statically-shaped bigram chain over posting words.

Reference semantics (`/root/reference/searcharray/phrase/bigram_freqs.py`,
`middle_out.py:96-168`): chain bigram matches left-to-right / right-to-left /
middle-out split at the rarest term, carrying a *continuation* array of
match-end positions, and take the per-doc running min of bigram counts.

TPU redesign: the reference materialises dynamically-sized intersections via
galloping search.  Here every step is fixed-shape:

* a continuation word exists for every RHS word (its payload is simply 0
  when nothing matched there), so the chain's arrays keep the static bucket
  shape of each term's posting slice;
* header alignment is a vectorised ``searchsorted`` (both sides sorted);
* per-doc counts are scattered into a dense ``float32[num_docs]`` vector and
  combined with elementwise ``min`` — replacing sparse id intersection
  (`middle_out.py:73-93`);
* the whole query — every term's slice, the full chain, the min, and the
  similarity — compiles into ONE dispatch (round-trips dominate on
  tunneled TPUs).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import KEY_SHIFT, LSB_BITS, LSB_MASK, PAD_WORD
from searcharray_tpu.search.scoring import (
    _window_blocks,
    apply_similarity_device,
    host_idf,
)

_TOP_BIT = 1 << (LSB_BITS - 1)  # bit 17, "last position in block"


def _pay32(words):
    import jax.numpy as jnp

    return (words & jnp.uint64(int(LSB_MASK))).astype(jnp.uint32)


def _align(sorted_hdr, query_hdr, size):
    """For each query header, index of the equal element in sorted_hdr (or miss)."""
    import jax.numpy as jnp

    i = jnp.searchsorted(sorted_hdr, query_hdr)
    i_c = jnp.clip(i, 0, size - 1)
    hit = sorted_hdr[i_c] == query_hdr
    return i_c, hit


def jax_popcount(x):
    import jax

    return jax.lax.population_count(x).astype(jax.numpy.int32)


def _same_term_counts(pay):
    """Per-word adjusted same-term bigram count (bigram_freqs.py:48-101)."""
    import jax.numpy as jnp

    lsb = jnp.uint32(int(LSB_MASK))
    overlap = pay & ((pay << 1) & lsb)
    adj = jax_popcount(overlap)
    consec = jax_popcount(overlap & (overlap << 1) & lsb)
    adjusted = adj - (-(consec // jnp.int32(-2)))  # == adj - ceil(consec/2)
    return adjusted.astype(jnp.float32), overlap


def _bigram_step(lhs, rhs, cont_side, num_docs):
    """One bigram step on sanitized posting/continuation words.

    Returns (dense per-doc counts f32[num_docs], continuation shaped like
    ``rhs`` when cont_side=="rhs", like ``lhs`` when "lhs").
    """
    import jax.numpy as jnp

    pad = jnp.uint64(int(PAD_WORD))
    lhs_hdr = lhs >> jnp.uint64(LSB_BITS)
    rhs_hdr = rhs >> jnp.uint64(LSB_BITS)

    # Same-term detection (bigram_freqs.py:139): identical posting contents.
    if lhs.shape == rhs.shape:
        same = jnp.all(lhs == rhs)
    else:
        same = jnp.asarray(False)

    if cont_side == "rhs":
        base, base_hdr = rhs, rhs_hdr
        other, other_hdr = lhs, lhs_hdr
        adj_probe = base_hdr - jnp.uint64(1)
    else:
        base, base_hdr = lhs, lhs_hdr
        other, other_hdr = rhs, rhs_hdr
        adj_probe = base_hdr + jnp.uint64(1)

    base_valid = base != pad
    base_pay = _pay32(base)
    other_sz = other.shape[0]

    i, hit = _align(other_hdr, base_hdr, other_sz)
    o_pay = jnp.where(hit & base_valid, _pay32(other[i]), jnp.uint32(0))
    j, adj_hit = _align(other_hdr, adj_probe, other_sz)
    o_adj_pay = _pay32(other[j])

    if cont_side == "rhs":
        overlap = o_pay & (base_pay >> 1)
        adj = (
            adj_hit & base_valid
            & (((o_adj_pay >> np.uint32(LSB_BITS - 1)) & 1) == 1)
            & ((base_pay & 1) == 1)
        )
        cont_bits_norm = (overlap << 1) & jnp.uint32(int(LSB_MASK))
    else:
        overlap = base_pay & (o_pay >> 1)
        adj = (
            adj_hit & base_valid
            & (((base_pay >> np.uint32(LSB_BITS - 1)) & 1) == 1)
            & ((o_adj_pay & 1) == 1)
        )
        cont_bits_norm = overlap  # match-begin bits stay in place

    inner_counts = jax_popcount(overlap).astype(jnp.float32)

    # Same-term variant (reference _inner_bigram_same_term).
    st_counts, st_overlap = _same_term_counts(base_pay)
    if cont_side == "rhs":
        st_cont_bits = st_overlap
    else:
        st_cont_bits = base_pay & (base_pay >> 1)

    counts = jnp.where(same, st_counts, inner_counts) + adj.astype(jnp.float32)
    cont_bits = jnp.where(same, st_cont_bits, cont_bits_norm)
    adj_bit = jnp.where(
        adj,
        jnp.uint32(1 if cont_side == "rhs" else _TOP_BIT),
        jnp.uint32(0),
    )

    cont = (base & ~jnp.uint64(int(LSB_MASK))) | (cont_bits | adj_bit).astype(
        jnp.uint64
    )
    cont = jnp.where(base_valid, cont, pad)

    keys = jnp.where(
        base_valid, (base >> jnp.uint64(KEY_SHIFT)).astype(jnp.int32), 0
    )
    counts = jnp.where(base_valid, counts, 0.0)
    dense = jnp.zeros(num_docs, dtype=jnp.float32).at[keys].add(counts)
    return dense, cont


def _chain(words: List, direction: str, num_docs: int):
    import jax.numpy as jnp

    acc = None
    if direction == "l2r":
        carry = words[0]
        for nxt in words[1:]:
            dense, carry = _bigram_step(carry, nxt, "rhs", num_docs)
            acc = dense if acc is None else jnp.minimum(acc, dense)
    else:
        carry = words[-1]
        for prv in reversed(words[:-1]):
            dense, carry = _bigram_step(prv, carry, "lhs", num_docs)
            acc = dense if acc is None else jnp.minimum(acc, dense)
    return acc


def _phrase_impl(data, offs, ns, doc_lens, idf, avgdl, min_blk, max_blk,
                 *, buckets, split, num_docs, windowed, kind, k1, b):
    """Whole phrase query — slices, chain(s), min, similarity — one jit."""
    import jax.numpy as jnp

    mb = (min_blk, max_blk) if windowed else (None, None)
    words = [
        K.take_term_slice(data, offs[i], ns[i], *mb, bucket=buckets[i])[0]
        for i in range(len(buckets))
    ]
    # Direction planning, parity with compute_phrase_freqs
    # (middle_out.py:154-168).
    n = len(words)
    if split <= 1:
        freqs = _chain(words, "l2r", num_docs)
    elif split >= n - 2:
        freqs = _chain(words, "r2l", num_docs)
    else:
        left = _chain(words[:split], "l2r", num_docs)
        right = _chain(words[split:], "r2l", num_docs)
        freqs = jnp.minimum(left, right)
    return apply_similarity_device(kind, freqs, doc_lens, idf, avgdl, k1, b)


_phrase_cache: dict = {}


def phrase_freqs_dense(index: DeviceIndex, term_ids: List[int],
                       min_posn: Optional[int] = None,
                       max_posn: Optional[int] = None,
                       kind: str = "none", k1: float = 1.2, b: float = 0.75,
                       idf: Optional[float] = None):
    """Dense per-doc exact phrase frequencies or scores (one dispatch)."""
    import jax.numpy as jnp

    if len(term_ids) < 2:
        raise ValueError("Must have at least two terms")
    min_blk, max_blk = _window_blocks(min_posn, max_posn)
    windowed = min_posn is not None or max_posn is not None

    spans = [index.term_span(t) for t in term_ids]
    lengths = [s[1] for s in spans]
    if min(lengths) == 0:
        return jnp.zeros(index.corpus_size, dtype=jnp.float32)
    buckets = tuple(s[2] for s in spans)
    split = int(np.argmin(lengths))
    if idf is None:
        idf = host_idf(kind, [index.doc_freqs[t] for t in term_ids],
                       index.corpus_size, index.avg_doc_length)

    key = ("phrase", index.corpus_size, buckets,
           split if 1 < split < len(term_ids) - 2
           else ("l2r" if split <= 1 else "r2l"), windowed, kind, k1, b)
    fn = _phrase_cache.get(key)
    if fn is None:
        import jax

        fn = jax.jit(
            partial(
                _phrase_impl,
                buckets=buckets,
                split=split,
                num_docs=index.corpus_size,
                windowed=windowed,
                kind=kind,
                k1=k1,
                b=b,
            )
        )
        _phrase_cache[key] = fn
    offs = tuple(np.int64(s[0]) for s in spans)
    ns = tuple(np.int64(s[1]) for s in spans)
    return fn(index.data, offs, ns, index.doc_lens, np.float32(idf),
              np.float32(max(index.avg_doc_length, 1e-38)), min_blk, max_blk)
