"""Doc-axis sharded index + batched multi-query scoring over a device mesh.

The reference is single-process (SURVEY §2d): its only scale paths are a
tokenizer thread pool and memmap spill.  Here the corpus is data-parallel
across chips:

* the posting buffer is split by doc-id range into S shards (keys re-based
  to shard-local), laid out as ``uint64[S, W_max]`` sharded on a ``docs``
  mesh axis — every shard's slice lives in its own chip's HBM;
* queries are broadcast (or sharded on a second ``queries`` axis);
* each chip scores its local docs; the only collective is a ``psum`` over
  the ``docs`` axis for global docfreqs (corpus stats N / avgdl are
  computed once at build).  Scores come back as a ``[Q, N]`` array sharded
  over both mesh axes.

This replaces the reference's latent ``key_partition`` hook
(`roaringish.py:227-243`) with a real SPMD execution path.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

from searcharray_tpu.index.builder import BuiltIndex
from searcharray_tpu.ops import encoding as enc
from searcharray_tpu.ops.kernels import bucket_of


def default_mesh(axis_docs: str = "docs", axis_queries: str = "queries",
                 devices=None):
    """Build a 2D (docs x queries) mesh over the available devices."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    # favor the doc axis; queries axis absorbs a factor of 2 when available
    q = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(devices.reshape(n // q, q), (axis_docs, axis_queries))


class ShardedIndex:
    """A BuiltIndex partitioned by doc range across a mesh's ``docs`` axis."""

    def __init__(self, mesh, data, offsets, lengths, doc_lens, shard_starts,
                 vocab, avg_doc_length: float, corpus_size: int,
                 max_shard_docs: int):
        self.mesh = mesh
        self.data = data              # uint64[S, W_max]   sharded (docs)
        self.offsets = offsets        # int64[S, V]        sharded (docs)
        self.lengths = lengths        # int64[S, V]        sharded (docs)
        self.doc_lens = doc_lens      # f32[S, N_shard]    sharded (docs)
        self.shard_starts = shard_starts  # int64[S] host: global doc base
        self.vocab = vocab
        self.avg_doc_length = avg_doc_length
        self.corpus_size = corpus_size
        self.max_shard_docs = max_shard_docs
        self.num_shards = int(shard_starts.shape[0])
        self._host_lengths = np.asarray(lengths)

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, built: BuiltIndex, mesh=None) -> "ShardedIndex":
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            mesh = default_mesh()
        S = mesh.shape["docs"]
        N = built.corpus_size
        V = len(built.vocab)
        shard_docs = -(-max(N, 1) // S)
        starts = np.arange(S, dtype=np.int64) * shard_docs

        post = built.postings
        word_keys = enc.keys_of(post.data).astype(np.int64)
        word_term = np.repeat(np.arange(V, dtype=np.int64), post.lengths)
        word_shard = np.minimum(word_keys // shard_docs, S - 1)

        shard_datas, shard_offs, shard_lens = [], [], []
        max_words = 1
        for s in range(S):
            mask = word_shard == s
            words = post.data[mask]
            # re-base doc keys to shard-local ids
            words = words - (np.uint64(starts[s]) << np.uint64(enc.KEY_SHIFT))
            lens = np.bincount(word_term[mask], minlength=V).astype(np.int64)
            offs = np.zeros(V, dtype=np.int64)
            offs[1:] = np.cumsum(lens)[:-1]
            shard_datas.append(words)
            shard_offs.append(offs)
            shard_lens.append(lens)
            max_words = max(max_words, len(words))

        max_bucket = bucket_of(int(max(1, max(l.max(initial=0) for l in shard_lens))))
        W = max_words + max_bucket
        data_np = np.full((S, W), enc.PAD_WORD, dtype=np.uint64)
        for s in range(S):
            data_np[s, : len(shard_datas[s])] = shard_datas[s]

        doc_lens_np = np.zeros((S, shard_docs), dtype=np.float32)
        for s in range(S):
            lo = starts[s]
            hi = min(N, lo + shard_docs)
            if hi > lo:
                doc_lens_np[s, : hi - lo] = built.doc_lens[lo:hi]

        shard = lambda spec: NamedSharding(mesh, spec)
        data = jax.device_put(data_np, shard(P("docs", None)))
        offsets = jax.device_put(np.stack(shard_offs), shard(P("docs", None)))
        lengths = jax.device_put(np.stack(shard_lens), shard(P("docs", None)))
        doc_lens = jax.device_put(doc_lens_np, shard(P("docs", None)))
        return cls(mesh, data, offsets, lengths, doc_lens, starts, built.vocab,
                   built.avg_doc_length, N, shard_docs)

    # ------------------------------------------------------------------
    def _max_bucket_for(self, term_ids: np.ndarray) -> int:
        valid = term_ids[term_ids >= 0]
        if valid.size == 0:
            return 8
        return bucket_of(int(self._host_lengths[:, valid].max(initial=1)))

    def score_queries(self, queries: Sequence[Sequence[str]],
                      k1: float = 1.2, b: float = 0.75):
        """BM25-score a batch of (OR-composed) term queries corpus-wide.

        Returns a device array [Q, N] sharded over (queries, docs).
        """
        Q = len(queries)
        T = max(len(q) for q in queries)
        tids = np.full((Q, T), -1, dtype=np.int64)
        for i, q in enumerate(queries):
            for j, tok in enumerate(q):
                if tok in self.vocab:
                    tids[i, j] = self.vocab.get_term_id(tok)
        bucket = self._max_bucket_for(tids)
        # pad Q to queries-axis multiple
        qaxis = self.mesh.shape["queries"]
        Qp = -(-Q // qaxis) * qaxis
        if Qp != Q:
            tids = np.concatenate(
                [tids, np.full((Qp - Q, T), -1, dtype=np.int64)]
            )
        out = _sharded_score(self, tids, bucket, float(k1), float(b))
        return out[:Q]


_score_cache: dict = {}


def _sharded_score(idx: ShardedIndex, tids_np: np.ndarray, bucket: int,
                   k1: float, b: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (id(idx), tids_np.shape, bucket, k1, b)
    fn = _score_cache.get(key)
    if fn is None:
        fn = _build_sharded_score(idx, tids_np.shape[1], bucket, k1, b)
        _score_cache[key] = fn
    tids = jax.device_put(
        tids_np, NamedSharding(idx.mesh, P("queries", None))
    )
    return fn(idx.data, idx.offsets, idx.lengths, idx.doc_lens, tids)


def _build_sharded_score(idx: ShardedIndex, T: int, bucket: int,
                         k1: float, b: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    N_shard = idx.max_shard_docs
    avgdl = np.float32(idx.avg_doc_length)
    num_docs = np.float32(idx.corpus_size)
    mesh = idx.mesh

    def term_tf_df(data_s, off, n, doc_lens_s):
        words = jax.lax.dynamic_slice(data_s, (off,), (bucket,))
        valid = jnp.arange(bucket, dtype=jnp.int32) < n
        words = jnp.where(valid, words, jnp.uint64(int(enc.PAD_WORD)))
        keys = jnp.where(
            valid, (words >> jnp.uint64(enc.KEY_SHIFT)).astype(jnp.int32), 0
        )
        pops = jax.lax.population_count(
            (words & jnp.uint64(int(enc.LSB_MASK))).astype(jnp.uint32)
        ).astype(jnp.float32)
        pops = jnp.where(valid, pops, 0.0)
        tf = jnp.zeros(N_shard, jnp.float32).at[keys].add(pops)
        prev = jnp.concatenate([keys[:1] - 1, keys[:-1]])
        df = jnp.sum((valid & (keys != prev)).astype(jnp.float32))
        return tf, df

    def local(data_s, off_s, len_s, doc_lens_s, tids_q):
        data_s = data_s[0]
        off_s, len_s, doc_lens_s = off_s[0], len_s[0], doc_lens_s[0]

        def one_query(tids):
            def one_term(tid):
                hit = tid >= 0
                tid_c = jnp.maximum(tid, 0)
                tf, df_local = term_tf_df(
                    data_s, off_s[tid_c], len_s[tid_c] * hit, doc_lens_s
                )
                df = jax.lax.psum(df_local, "docs")
                idf = jnp.log1p((num_docs - df + 0.5) / (df + 0.5)).astype(
                    jnp.float32
                )
                denom = tf + np.float32(k1) * (
                    np.float32(1 - b) + np.float32(b) * (doc_lens_s / avgdl)
                )
                return jnp.where(hit, (tf / denom) * idf, 0.0)

            return jnp.sum(jax.vmap(one_term)(tids), axis=0)

        return jax.vmap(one_query)(tids_q)[None]

    from jax.sharding import PartitionSpec as P

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("docs", None), P("docs", None), P("docs", None),
                  P("docs", None), P("queries", None)),
        out_specs=P("docs", "queries", None),
    )

    num_real_docs = idx.corpus_size

    @jax.jit
    def run(data, offsets, lengths, doc_lens, tids):
        out = mapped(data, offsets, lengths, doc_lens, tids)  # [S, Q, N_shard]
        out = jnp.moveaxis(out, 0, 1)                         # [Q, S, N_shard]
        return out.reshape(out.shape[0], -1)[:, :num_real_docs]

    return run
