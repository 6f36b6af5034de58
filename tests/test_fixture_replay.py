"""Replay the reference's saved real posting lists through phrase alignment.

The reference keeps regression fixtures of real (skewed) roaringish posting
pairs and replays them through its gallop intersect
(`/root/reference/test/test_snp_ops.py:323-349`).  Here each pair runs
through the sort-merge bigram alignment (`search/phrase._merge_step`) and
the merged-space chain, checked against an independent numpy oracle over
the decoded (doc, position) sets.  Only the suffixes whose rhs file is
present in the checkout are replayable (185/45907/90596 ship lhs+mask only).
"""
import os

import numpy as np
import pytest

from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS
from searcharray_tpu.search.phrase import _chain_planes, _merged_chain

FIXTURE_DIR = "/root/reference/fixtures"
SUFFIXES = [128, 24179, 27685, 44358]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not present")


def _decode(words):
    """uint64 roaringish words -> {doc: set(posn)}."""
    keys = (words >> np.uint64(36)).astype(np.int64)
    blks = ((words >> np.uint64(18)) & np.uint64(0x3FFFF)).astype(np.int64)
    pays = (words & np.uint64(0x3FFFF)).astype(np.int64)
    by_doc: dict = {}
    for k, blk, pay in zip(keys, blks, pays):
        s = by_doc.setdefault(int(k), set())
        base = int(blk) * LSB_BITS
        p = int(pay)
        while p:
            low = p & -p
            s.add(base + low.bit_length() - 1)
            p ^= low
    return by_doc


def _planes(words, blk_bits):
    """Bucket-padded (hdr32, pay32) planes for one fixture array."""
    keys = (words >> np.uint64(36)).astype(np.int64)
    blks = ((words >> np.uint64(18)) & np.uint64(0x3FFFF)).astype(np.int64)
    hdr = ((keys << blk_bits) | blks).astype(np.int32)
    pay = (words & np.uint64(0x3FFFF)).astype(np.uint32)
    bucket = K.bucket_of(len(words))
    h = np.full(bucket, K.PAD_HDR32, dtype=np.int32)
    p = np.zeros(bucket, dtype=np.uint32)
    h[: len(hdr)] = hdr
    p[: len(pay)] = pay
    return h, p


def _load(suffix):
    lhs = np.load(f"{FIXTURE_DIR}/lhs_{suffix}.npy")
    rhs = np.load(f"{FIXTURE_DIR}/rhs_{suffix}.npy")
    max_blk = int(max(
        ((lhs >> np.uint64(18)) & np.uint64(0x3FFFF)).max(),
        ((rhs >> np.uint64(18)) & np.uint64(0x3FFFF)).max(),
    ))
    blk_bits = K.blk_bits_for((max_blk + 1) * LSB_BITS)
    num_docs = int(max(lhs.max() >> np.uint64(36),
                       rhs.max() >> np.uint64(36))) + 1
    assert (num_docs << blk_bits) < K.PAD_HDR32 - 16
    return lhs, rhs, blk_bits, num_docs


def _oracle_bigram(lhs_docs, rhs_docs, num_docs):
    out = np.zeros(num_docs, dtype=np.float32)
    for d, lposns in lhs_docs.items():
        rposns = rhs_docs.get(d)
        if rposns:
            out[d] = sum(1 for p in lposns if p + 1 in rposns)
    return out


@pytest.mark.parametrize("suffix", SUFFIXES)
def test_bigram_alignment_matches_position_oracle(suffix):
    lhs, rhs, blk_bits, num_docs = _load(suffix)
    oracle = _oracle_bigram(_decode(lhs), _decode(rhs), num_docs)

    planes = [_planes(lhs, blk_bits), _planes(rhs, blk_bits)]
    import jax

    for direction in ("l2r", "r2l"):
        dense = jax.jit(
            lambda pl0, pl1, d=direction: _chain_planes(
                [pl0, pl1], [0, 1], d, num_docs, blk_bits)[0]
        )(planes[0], planes[1])
        np.testing.assert_array_equal(
            np.asarray(dense), oracle,
            err_msg=f"suffix={suffix} direction={direction}")


@pytest.mark.parametrize("suffix", [128, 27685])
def test_merged_chain_matches_position_oracle(suffix):
    """Trigram (lhs rhs lhs) through the one-sort merged-space chain."""
    lhs, rhs, blk_bits, num_docs = _load(suffix)
    lhs_docs, rhs_docs = _decode(lhs), _decode(rhs)

    step0 = _oracle_bigram(lhs_docs, rhs_docs, num_docs)
    step1 = np.zeros(num_docs, dtype=np.float32)
    for d, lposns in lhs_docs.items():
        rposns = rhs_docs.get(d)
        if rposns:
            step1[d] = sum(
                1 for p in lposns if p + 1 in rposns and p + 2 in lposns)
    oracle = np.minimum(step0, step1)

    planes = [_planes(lhs, blk_bits), _planes(rhs, blk_bits),
              _planes(lhs, blk_bits)]
    import jax

    def run(pl0, pl1, pl2):
        import jax.numpy as jnp

        denses = _merged_chain([pl0, pl1, pl2], [0, 1, 0], "l2r",
                               num_docs, blk_bits, None)
        return jnp.minimum(denses[0], denses[1])

    dense = jax.jit(run)(*planes)
    np.testing.assert_array_equal(np.asarray(dense), oracle,
                                  err_msg=f"suffix={suffix}")
