"""Shared device-side (JAX) helpers for posting-plane kernels.

All kernels obey XLA static-shape rules: posting slices are padded to
power-of-two buckets, tails are rewritten to a sentinel header (max value,
empty payload) so sortedness is preserved and padding is inert in every
popcount / alignment / scatter op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from searcharray_tpu.ops.encoding import LSB_BITS, LSB_MASK, MSB_SHIFT

MIN_BUCKET = 8

# Sentinel header for padding in the 32-bit plane layout: larger than any
# real compressed header (doc << blk_bits | blk), sorts last, payload 0.
PAD_HDR32 = (1 << 31) - 16


def bucket_of(n: int) -> int:
    """Padded size for a posting slice of length n.

    Quarter-power-of-two steps (1, 1.25, 1.5, 1.75 times 2^k): at most 25%
    padding instead of 2x, which directly shrinks the per-step sorts in the
    phrase chain; still a small closed set of shapes for the compile cache.
    """
    if n <= MIN_BUCKET:
        return MIN_BUCKET
    p = MIN_BUCKET
    while p < n:
        p <<= 1
    half = p >> 1
    for frac in (5, 6, 7):
        cand = (half * frac) >> 2
        if n <= cand:
            return cand
    return p


def expand_bucket_of(n: int) -> int:
    """Coarse power-of-4 padding for dense-expansion slices (search/dense).

    Expansion cost is one scatter (cheap even 4x padded), but every
    distinct bucket is a fresh XLA compile — 30s+ on a tunneled TPU — so
    long-tail serving must see only a handful of shapes per corpus.
    DeviceIndex pads its planes to this bound so clamped dynamic slices
    can never misalign.
    """
    b = 4096
    while b < n:
        b <<= 2
    return b


def compress_planes(words: np.ndarray, blk_bits: int):
    """uint64 posting words -> (hdr32 int32, pay32 uint32) planes.

    hdr32 = doc_key << blk_bits | block.  Device kernels are pure 32-bit:
    no emulated 64-bit compares, and headers stay sortable as one i32 key.
    Requires doc_key < 2**(31 - blk_bits) - 16 (shard more if not).
    """
    from searcharray_tpu.index import native as native_mod

    res = native_mod.compress_planes(words, blk_bits)
    if res is not None:
        hdr32, pay, max_hdr = res
        if max_hdr >= PAD_HDR32 - 16:
            raise ValueError(
                "corpus too large for 32-bit posting headers at this "
                "document length; shard the doc axis "
                "(parallel.ShardedIndex)"
            )
        return hdr32, pay
    keys = (words >> np.uint64(64 - 28)).astype(np.int64)
    blks = ((words >> np.uint64(MSB_SHIFT)) & np.uint64((1 << 18) - 1)).astype(
        np.int64
    )
    hdr = (keys << blk_bits) | blks
    if len(hdr) and int(hdr.max()) >= PAD_HDR32 - 16:
        raise ValueError(
            "corpus too large for 32-bit posting headers at this document "
            "length; shard the doc axis (parallel.ShardedIndex)"
        )
    pay = (words & np.uint64(int(LSB_MASK))).astype(np.uint32)
    return hdr.astype(np.int32), pay


def blk_bits_for(max_doc_len: int) -> int:
    """Static block-field width: enough for every block plus one spare slot
    so hdr+1 adjacency probes never roll into the next document."""
    max_blk = max(0, (max(1, int(max_doc_len)) - 1) // LSB_BITS)
    bits = 1
    while (1 << bits) < max_blk + 2:
        bits += 1
    return bits


def topk_exact(x, k: int, block: int = 8192):
    """Exact top-k over the last axis via block-max selection.

    ``lax.top_k`` over a multi-million-element row is a single sequential
    sort (~24 ms at 8.8M on v5e), and per-block ``lax.top_k`` (a full sort
    of every block) still costs ~3.6 ms per 8.8M row.  One streaming MAX
    per block is ~12x cheaper: every true top-k element lives in a block
    whose max ranks among the top-k block maxes (a block with max above
    the k-th score holds an above-k element, so at most k-1 such blocks
    exist; ``lax.top_k`` over the maxes breaks ties toward earlier blocks,
    which covers the earliest occurrences of the k-th value).  Gathering
    those k blocks (k*block elements) and one small ``lax.top_k`` finishes
    exactly; sorting the selected block ids ascending first keeps the
    candidate order equal to global index order, preserving
    smallest-index tie-breaking.  Falls back to one-stage on small rows.

    block=8192 measured best on v5e at 8.8M docs: 0.34 ms/row vs 3.6 ms
    for per-block-sort and 24 ms for one-stage (scripts/profile_ops_88m.py
    + the block sweep in the round-5 log)."""
    n = x.shape[-1]
    pad = -n % block
    g = (n + pad) // block
    if n <= 4 * block or k >= block or g < k:
        return jax.lax.top_k(x, k)
    if pad:
        fill = jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)
        x = jnp.concatenate([x, fill], axis=-1)
    blocks = x.reshape(x.shape[:-1] + (g, block))
    bmax = blocks.max(axis=-1)                              # [..., g]
    _, bsel = jax.lax.top_k(bmax, k)                        # [..., k]
    bsel = jnp.sort(bsel.astype(jnp.int32), axis=-1)        # index order
    cand = jnp.take_along_axis(blocks, bsel[..., None], axis=-2)
    flat_v = cand.reshape(cand.shape[:-2] + (k * block,))
    v, ci = jax.lax.top_k(flat_v, k)
    ci = ci.astype(jnp.int32)
    blk_of = jnp.take_along_axis(bsel, ci // block, axis=-1)
    idx = blk_of * jnp.int32(block) + ci % jnp.int32(block)
    return v, idx


# NOTE on candidate mini-plane gathers (measured on v5e at 8.8M docs,
# scripts/profile_ops_88m.py + round-5 probes): the flat ascending take
# of Kc*S indices costs ~24 ns/element (204 ms at Kc=1M).  Both "faster"
# alternatives fail in production: reshape(N, S) inside a program
# materializes a 16x lane-padded copy (4.5 GB -> OOM beside the pools),
# and lax.gather with slice_sizes=(S,) is 10x SLOWER than the flat take.
# The framework therefore routes pool-pattern queries with large Kc to
# the dense engine instead (search/candidates.py:CAND_POOL_MAX_KC).


def take_term_planes(hdrs, pays, off, n, min_blk=None, max_blk=None,
                     *, bucket, blk_bits):
    """Slice bucket-sized (hdr32, pay32) planes with PAD-sanitized tail and
    optional position-block windowing (the reference's payload_slice,
    `roaringish_ops.pyx:46`, `roaringish.py:245-282`)."""
    h = jax.lax.dynamic_slice(hdrs, (off,), (bucket,))
    p = jax.lax.dynamic_slice(pays, (off,), (bucket,))
    valid = jnp.arange(bucket, dtype=jnp.int32) < n
    h = jnp.where(valid, h, jnp.int32(PAD_HDR32))
    p = jnp.where(valid, p, jnp.uint32(0))
    if min_blk is not None:
        blk = h & jnp.int32((1 << blk_bits) - 1)
        in_win = (blk >= min_blk) & (blk <= max_blk)
        p = jnp.where(in_win, p, jnp.uint32(0))
    return h, p
