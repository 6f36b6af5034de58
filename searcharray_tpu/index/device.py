"""Device-resident index: HBM postings planes + scoring metadata.

The CSR posting store is uploaded once as two parallel 32-bit planes —
``hdr32`` (doc << blk_bits | block, int32) and ``pay32`` (18-bit position
bitmap, uint32).  Same bytes/word as the uint64 wire format, but every
device op is native 32-bit (u64 is emulated on TPU) and headers sort/compare
as a single i32 key.  Term lookup stays on host (vocab dict ->
offset/length); kernels slice the planes with ``lax.dynamic_slice`` at
power-of-two bucket sizes so every query compiles against a small,
reusable set of shapes.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from searcharray_tpu.index.builder import BuiltIndex
from searcharray_tpu.index.vocab import Vocabulary
from searcharray_tpu.ops.kernels import (
    PAD_HDR32,
    blk_bits_for,
    bucket_of,
    compress_planes,
    expand_bucket_of,
)


def derive_attach_arrays(built: BuiltIndex) -> dict:
    """The big host-side arrays a DeviceIndex needs: tail-padded hdr32 /
    pay32 planes and the per-term block-word max.  Quadratic-free but
    multi-GB numpy passes — a v3 store (index/store.py) runs this once at
    save time so attach cost is upload, not derivation."""
    max_len = int(built.postings.lengths.max()) if built.postings.num_terms else 0
    max_bucket = max(bucket_of(max(1, max_len)),
                     expand_bucket_of(max(1, max_len)))
    max_doc_len = float(built.doc_lens.max()) if len(built.doc_lens) else 1
    blk_bits = blk_bits_for(int(max_doc_len))
    hdr, pay = compress_planes(built.postings.data, blk_bits)
    pad_h = np.full(max_bucket, PAD_HDR32, dtype=np.int32)
    pad_p = np.zeros(max_bucket, dtype=np.uint32)
    return {
        "hdr32": np.concatenate([hdr, pad_h]),
        "pay32": np.concatenate([pay, pad_p]),
        "block_word_max": DeviceIndex._per_term_block_max(built, 1024),
        "blk_bits": blk_bits,
        "doc_block": 1024,
        "max_bucket": max_bucket,
    }


class DeviceIndex:
    """Immutable device copy of a built index (one shard)."""

    def __init__(self, built: BuiltIndex):
        import jax.numpy as jnp

        self.postings = built.postings          # host CSR (numpy, uint64)
        self.doc_term = built.doc_term
        self.vocab: Vocabulary = built.vocab
        self.doc_lens_np = built.doc_lens
        self.avg_doc_length = built.avg_doc_length
        self.corpus_size = int(len(built.doc_lens))
        self.doc_freqs = built.doc_freqs  # host int64[V], precomputed

        max_len = int(built.postings.lengths.max()) if built.postings.num_terms else 0
        # tail padding covers the largest slice any kernel may take: the
        # quarter-pow2 query buckets AND the coarse pow-4 expansion buckets
        self.max_bucket = max(bucket_of(max(1, max_len)),
                              expand_bucket_of(max(1, max_len)))
        max_doc_len = float(built.doc_lens.max()) if len(built.doc_lens) else 1
        self._max_doc_len = max_doc_len
        self.blk_bits = blk_bits_for(int(max_doc_len))

        # v3 store fast path: padded planes and the per-term block max were
        # computed at save time (store.py) — attach is pure upload instead
        # of minutes of single-core numpy at 8.8M docs.
        der = self._usable_derived(built) or derive_attach_arrays(built)
        self.hdrs = jnp.asarray(der["hdr32"])
        self.pays = jnp.asarray(der["pay32"])
        self._block_word_max = np.asarray(der["block_word_max"])
        self.doc_lens = jnp.asarray(built.doc_lens, dtype=jnp.float32)
        # Device-resident dense pools (search/dense.py): plane_pool is
        # u32[C, N << blk_bits] (one expanded payload plane per slot),
        # tf_pool is f32[Ct, N].  Host keeps term -> slot maps in LRU
        # order; pool fills are single donated-buffer programs per batch.
        from collections import OrderedDict

        self.plane_pool = None
        self.plane_slot: "OrderedDict[int, int]" = OrderedDict()
        self.plane_free: list = []
        self.tf_pool = None
        self.tf_slot: "OrderedDict[int, int]" = OrderedDict()
        self.tf_free: list = []
        # dict-LRU tf fallback for pool-ineligible corpora (dense.term_tf)
        self.tf_cache: "OrderedDict[int, object]" = OrderedDict()
        # Phrase-tf cache bookkeeping (search/dense.py): a repeated
        # phrase's per-doc freq vector is materialized into the tf pool
        # (tf_slot keys may be (tids, slop) tuples, not just term ids).
        # phrase_hits counts encounters per signature; phrase_recipes
        # records how to (re)build a promoted signature's row.
        self.phrase_hits: dict = {}
        self.phrase_recipes: dict = {}

    def _usable_derived(self, built: BuiltIndex):
        """The store's precomputed attach arrays, or None if absent or
        stale (layout constants must match what this code would derive —
        a store written under older bucket/block policies falls back to
        the recompute path instead of corrupting the planes)."""
        der = built.derived
        if not der:
            return None
        W = len(built.postings.data)
        if (der.get("blk_bits") == self.blk_bits
                and der.get("doc_block") == 1024
                and der.get("max_bucket") == self.max_bucket
                and len(der["hdr32"]) == W + self.max_bucket
                and len(der["pay32"]) == W + self.max_bucket
                and len(der["block_word_max"]) == built.postings.num_terms):
            return der
        return None

    @staticmethod
    def _per_term_block_max(built: BuiltIndex, doc_block: int) -> np.ndarray:
        """Per term: max posting words falling in any doc_block-sized doc
        range — the tight tile bound for the Pallas block-reduce scorer.
        One vectorised pass (words are (term, doc)-sorted, so words of one
        term in one doc block form a contiguous run)."""
        from searcharray_tpu.ops import encoding as enc

        post = built.postings
        W = len(post.data)
        V = post.num_terms
        out = np.zeros(V, dtype=np.int64)
        if W == 0:
            return out

        from searcharray_tpu.index import native as native_mod

        nat = native_mod.block_max(post.data, post.offsets, post.lengths,
                                   doc_block)
        if nat is not None:
            return nat
        docs_blk = enc.keys_of(post.data).astype(np.int64) // doc_block
        tid = np.repeat(np.arange(V, dtype=np.int64), post.lengths)
        change = np.ones(W, dtype=bool)
        change[1:] = (tid[1:] != tid[:-1]) | (docs_blk[1:] != docs_blk[:-1])
        starts = np.flatnonzero(change)
        run_len = np.diff(np.concatenate([starts, [W]]))
        np.maximum.at(out, tid[starts], run_len)
        return out

    def term_span(self, term_id: int) -> Tuple[int, int, int]:
        """(offset, length, bucket) for a term's posting slice."""
        o = int(self.postings.offsets[term_id])
        n = int(self.postings.lengths[term_id])
        return o, n, bucket_of(max(1, n))

    def refresh(self, built: BuiltIndex) -> None:
        """Re-upload after a host-side mutation (setitem path)."""
        self.__init__(built)
