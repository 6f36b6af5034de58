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


def topk_exact(x, k: int, block: int = 1024):
    """Exact top-k over the last axis, two-stage.

    ``lax.top_k`` over a multi-million-element row is a single sequential
    sort (~24 ms at 8.8M on v5e); taking per-block top-k first ([G, block]
    rows sort in parallel) then reducing the [G*k] survivors is exact —
    every global winner is in its block's top-k — and preserves
    smallest-index tie-breaking, since flat candidate order equals index
    order.  Falls back to one-stage when the row is small."""
    n = x.shape[-1]
    if n <= 4 * block or k >= block:
        return jax.lax.top_k(x, k)
    pad = -n % block
    if pad:
        fill = jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)
        x = jnp.concatenate([x, fill], axis=-1)
    g = (n + pad) // block
    blocks = x.reshape(x.shape[:-1] + (g, block))
    v1, i1 = jax.lax.top_k(blocks, k)                       # [..., g, k]
    base = (jnp.arange(g, dtype=jnp.int32) * block)[:, None]
    flat_v = v1.reshape(v1.shape[:-2] + (g * k,))
    flat_i = (i1.astype(jnp.int32) + base).reshape(flat_v.shape)
    v2, sel = jax.lax.top_k(flat_v, k)
    idx = jnp.take_along_axis(flat_i, sel, axis=-1)
    return v2, idx


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
