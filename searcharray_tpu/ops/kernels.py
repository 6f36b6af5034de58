"""Shared device-side (JAX) helpers for posting-word kernels.

All kernels obey XLA static-shape rules: posting slices are padded to
power-of-two buckets, tails are rewritten to ``PAD_WORD`` (max header, empty
payload) so sortedness is preserved and padding is inert in every
popcount / alignment / scatter op.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from searcharray_tpu.ops.encoding import (
    KEY_SHIFT,
    LSB_BITS,
    LSB_MASK,
    MSB_SHIFT,
    PAD_WORD,
)

_LSB_MASK64 = jnp.uint64(int(LSB_MASK))
_PAD = jnp.uint64(int(PAD_WORD))

MIN_BUCKET = 8

# Sentinel header for padding in the 32-bit plane layout: larger than any
# real compressed header (doc << blk_bits | blk), sorts last, payload 0.
PAD_HDR32 = (1 << 31) - 16


def compress_planes(words: np.ndarray, blk_bits: int):
    """uint64 posting words -> (hdr32 int32, pay32 uint32) planes.

    hdr32 = doc_key << blk_bits | block.  Device kernels are pure 32-bit:
    no emulated 64-bit compares, and headers stay sortable as one i32 key.
    Requires doc_key < 2**(31 - blk_bits) - 16 (shard more if not).
    """
    keys = (words >> np.uint64(64 - 28)).astype(np.int64)
    blks = ((words >> np.uint64(MSB_SHIFT)) & np.uint64((1 << 18) - 1)).astype(
        np.int64
    )
    hdr = (keys << blk_bits) | blks
    if len(hdr) and int(hdr.max()) >= PAD_HDR32:
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


def take_term_planes(hdrs, pays, off, n, min_blk=None, max_blk=None,
                     *, bucket, blk_bits):
    """Slice bucket-sized (hdr32, pay32) planes with PAD-sanitized tail and
    optional position-block windowing."""
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


def bucket_of(n: int) -> int:
    """Power-of-two padded size for a posting slice of length n."""
    b = MIN_BUCKET
    while b < n:
        b <<= 1
    return b


def take_term_slice(data, off, n, min_blk=None, max_blk=None, *, bucket):
    """Slice `bucket` words at `off`, sanitising the invalid tail to PAD.

    Optionally zero the payload of words whose position block is outside
    [min_blk, max_blk] (the reference's payload_slice windowing,
    `roaringish_ops.pyx:46`, `roaringish.py:245-282`).
    """
    words = jax.lax.dynamic_slice(data, (off,), (bucket,))
    valid = jnp.arange(bucket, dtype=jnp.int32) < n
    words = jnp.where(valid, words, _PAD)
    if min_blk is not None:
        blk = (words >> jnp.uint64(MSB_SHIFT)) & jnp.uint64((1 << 18) - 1)
        in_win = (blk >= jnp.uint64(min_blk)) & (blk <= jnp.uint64(max_blk))
        words = jnp.where(valid & ~in_win, words & ~_LSB_MASK64, words)
    return words, valid


def payload_popcount(words):
    """Popcount of the 18-bit payload; computed in uint32 (payload fits lo32)."""
    lo = (words & _LSB_MASK64).astype(jnp.uint32)
    return jax.lax.population_count(lo)


def word_keys(words):
    """Doc key of each word as int32."""
    return (words >> jnp.uint64(KEY_SHIFT)).astype(jnp.int32)


def word_headers(words):
    """46-bit (key | block) header, still uint64, low-aligned."""
    return words >> jnp.uint64(LSB_BITS)


def segment_new_doc(keys, valid):
    """Boolean: word starts a new doc run (for docfreq)."""
    prev = jnp.concatenate([keys[:1] - 1, keys[:-1]])
    return valid & (keys != prev)


@lru_cache(maxsize=None)
def _pow2_table(max_exp: int):
    return tuple(1 << i for i in range(max_exp))
