"""Device-resident index: HBM postings buffer + scoring metadata.

The CSR posting store is uploaded once as a single padded uint64 buffer;
term lookup stays on host (vocab dict -> offset/length), kernels slice the
buffer with ``lax.dynamic_slice`` at power-of-two bucket sizes so every
query compiles against a small, reusable set of shapes.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from searcharray_tpu.index.builder import BuiltIndex, DocTermMatrix, TermPostings
from searcharray_tpu.index.vocab import Vocabulary
from searcharray_tpu.ops.encoding import PAD_WORD
from searcharray_tpu.ops.kernels import bucket_of


class DeviceIndex:
    """Immutable device copy of a built index (one shard)."""

    def __init__(self, built: BuiltIndex):
        import jax.numpy as jnp

        self.postings = built.postings          # host CSR (numpy)
        self.doc_term = built.doc_term
        self.vocab: Vocabulary = built.vocab
        self.doc_lens_np = built.doc_lens
        self.avg_doc_length = built.avg_doc_length
        self.corpus_size = int(len(built.doc_lens))

        max_len = int(built.postings.lengths.max()) if built.postings.num_terms else 0
        self.max_bucket = bucket_of(max(1, max_len))
        pad = np.full(self.max_bucket, PAD_WORD, dtype=np.uint64)
        self.data = jnp.asarray(np.concatenate([built.postings.data, pad]))
        self.doc_lens = jnp.asarray(built.doc_lens, dtype=jnp.float32)
        self.doc_freqs = built.doc_freqs  # host int64[V], precomputed

    def term_span(self, term_id: int) -> Tuple[int, int, int]:
        """(offset, length, bucket) for a term's posting slice."""
        o = int(self.postings.offsets[term_id])
        n = int(self.postings.lengths[term_id])
        return o, n, bucket_of(max(1, n))

    def refresh(self, built: BuiltIndex) -> None:
        """Re-upload after a host-side mutation (setitem path)."""
        self.__init__(built)
