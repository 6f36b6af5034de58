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
  (`middle_out.py:73-93`).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import KEY_SHIFT, LSB_BITS, LSB_MASK, PAD_WORD
from searcharray_tpu.search.scoring import _window_blocks

_LSB32 = np.uint32(int(LSB_MASK))
_TOP_BIT = 1 << (LSB_BITS - 1)  # bit 17, "last position in block"


def _hdrs(words):
    import jax.numpy as jnp

    return words >> jnp.uint64(LSB_BITS)


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


def _same_term_counts(pay):
    """Per-word adjusted same-term bigram count (bigram_freqs.py:48-101).

    A run of k consecutive occurrences of the same term yields
    ceil(k-1 adjacent pairs minus overlaps) — implemented exactly as the
    reference: adjacents - ceil(consecutive_ones / 2).
    """
    import jax.numpy as jnp

    overlap = pay & ((pay << 1) & jnp.uint32(int(LSB_MASK)))
    adj = jax_popcount(overlap)
    consec = jax_popcount(overlap & (overlap << 1) & jnp.uint32(int(LSB_MASK)))
    adjusted = adj - (-(consec // jnp.int32(-2)))  # == adj - ceil(consec/2)
    return adjusted.astype(jnp.float32), overlap


def jax_popcount(x):
    import jax

    return jax.lax.population_count(x).astype(jax.numpy.int32)


def _bigram_step_impl(lhs, rhs, *, cont_side, num_docs):
    """One bigram step.  Inputs are sanitized posting/continuation words.

    Returns (dense per-doc counts f32[num_docs], continuation words shaped
    like ``rhs`` when cont_side=="rhs", like ``lhs`` when "lhs").
    """
    import jax.numpy as jnp

    pad = jnp.uint64(int(PAD_WORD))
    lhs_hdr = _hdrs(lhs)
    rhs_hdr = _hdrs(rhs)
    lhs_valid = lhs != pad
    rhs_valid = rhs != pad
    lhs_pay = _pay32(lhs)
    rhs_pay = _pay32(rhs)

    # Same-term detection (bigram_freqs.py:139): identical posting contents.
    # Distinct static shapes can never be the identical array.
    if lhs.shape == rhs.shape:
        same = jnp.all(lhs == rhs)
    else:
        same = jnp.asarray(False)

    if cont_side == "rhs":
        base, base_hdr, base_valid, base_pay = rhs, rhs_hdr, rhs_valid, rhs_pay
        other, other_hdr, other_sz = lhs, lhs_hdr, lhs.shape[0]
        # inner: other word with identical header
        i, hit = _align(other_hdr, base_hdr, other_sz)
        o_pay = jnp.where(hit & base_valid, _pay32(other[i]), jnp.uint32(0))
        overlap = o_pay & (base_pay >> 1)
        # adjacent: other word one block earlier, its top bit meets our bit 0
        j, adj_hit = _align(other_hdr, base_hdr - jnp.uint64(1), other_sz)
        adj = (
            adj_hit
            & base_valid
            & (((_pay32(other[j]) >> np.uint32(LSB_BITS - 1)) & 1) == 1)
            & ((base_pay & 1) == 1)
        )
        inner_counts = jax_popcount(overlap).astype(jnp.float32)
        cont_bits_norm = ((overlap << 1) & jnp.uint32(int(LSB_MASK)))
    else:
        base, base_hdr, base_valid, base_pay = lhs, lhs_hdr, lhs_valid, lhs_pay
        other, other_hdr, other_sz = rhs, rhs_hdr, rhs.shape[0]
        i, hit = _align(other_hdr, base_hdr, other_sz)
        o_pay = jnp.where(hit & base_valid, _pay32(other[i]), jnp.uint32(0))
        overlap = base_pay & (o_pay >> 1)
        # adjacent: rhs word one block later, our top bit meets its bit 0
        j, adj_hit = _align(other_hdr, base_hdr + jnp.uint64(1), other_sz)
        adj = (
            adj_hit
            & base_valid
            & (((base_pay >> np.uint32(LSB_BITS - 1)) & 1) == 1)
            & ((_pay32(other[j]) & 1) == 1)
        )
        inner_counts = jax_popcount(overlap).astype(jnp.float32)
        cont_bits_norm = overlap  # match-begin bits stay in place

    # Same-term variant (lhs == rhs identically): reference
    # `_inner_bigram_same_term` (bigram_freqs.py:65-101).
    st_counts, st_overlap = _same_term_counts(base_pay)
    if cont_side == "rhs":
        st_cont_bits = st_overlap  # match-end bits, already in place
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
    cont = jnp.where(base_valid, cont, jnp.uint64(int(PAD_WORD)))

    keys = jnp.where(
        base_valid, (base >> jnp.uint64(KEY_SHIFT)).astype(jnp.int32), 0
    )
    counts = jnp.where(base_valid, counts, 0.0)
    dense = jnp.zeros(num_docs, dtype=jnp.float32).at[keys].add(counts)
    return dense, cont


_step_cache: dict = {}
_slice_cache: dict = {}


def _get_step(cont_side: str, num_docs: int):
    import jax

    key = (cont_side, num_docs)
    fn = _step_cache.get(key)
    if fn is None:
        fn = jax.jit(partial(_bigram_step_impl, cont_side=cont_side, num_docs=num_docs))
        _step_cache[key] = fn
    return fn


def _get_slice(bucket: int):
    import jax

    fn = _slice_cache.get(bucket)
    if fn is None:
        fn = jax.jit(partial(K.take_term_slice, bucket=bucket))
        _slice_cache[bucket] = fn
    return fn


def _term_words(index: DeviceIndex, term_id: int, min_blk, max_blk):
    off, n, bucket = index.term_span(term_id)
    words, _ = _get_slice(bucket)(index.data, off, n, min_blk, max_blk)
    return words, n


def phrase_freqs_dense(
    index: DeviceIndex,
    term_ids: List[int],
    min_posn: Optional[int] = None,
    max_posn: Optional[int] = None,
):
    """Dense per-doc exact phrase frequencies (device float32[num_docs])."""
    import jax.numpy as jnp

    if len(term_ids) < 2:
        raise ValueError("Must have at least two terms")
    min_blk, max_blk = _window_blocks(min_posn, max_posn)
    windowed = min_posn is not None or max_posn is not None
    mb = (min_blk, max_blk) if windowed else (None, None)

    slices = [_term_words(index, t, *mb) for t in term_ids]
    lengths = [n for _, n in slices]
    words = [w for w, _ in slices]

    if min(lengths) == 0:
        return jnp.zeros(index.corpus_size, dtype=jnp.float32)

    # Direction planning, parity with compute_phrase_freqs
    # (middle_out.py:154-168).
    s = int(np.argmin(lengths))
    n = len(term_ids)
    if s <= 1:
        return _chain(words, "l2r", index.corpus_size)
    if s >= n - 2:
        return _chain(words, "r2l", index.corpus_size)
    left = _chain(words[:s], "l2r", index.corpus_size)
    right = _chain(words[s:], "r2l", index.corpus_size)
    return jnp.minimum(left, right)


def _chain(words: List, direction: str, num_docs: int):
    import jax.numpy as jnp

    acc = None
    if direction == "l2r":
        carry = words[0]
        for nxt in words[1:]:
            step = _get_step("rhs", num_docs)
            dense, carry = step(carry, nxt)
            acc = dense if acc is None else jnp.minimum(acc, dense)
    else:
        carry = words[-1]
        for prv in reversed(words[:-1]):
            step = _get_step("lhs", num_docs)
            dense, carry = step(prv, carry)
            acc = dense if acc is None else jnp.minimum(acc, dense)
    return acc
