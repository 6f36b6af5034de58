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

from typing import Sequence

import numpy as np

from searcharray_tpu.index.builder import BuiltIndex
from searcharray_tpu.ops import encoding as enc
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.kernels import (
    PAD_HDR32,
    blk_bits_for,
    bucket_of,
    compress_planes,
)


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

    def __init__(self, mesh, hdrs, pays, offsets, lengths, doc_lens,
                 shard_starts, vocab, avg_doc_length: float, corpus_size: int,
                 max_shard_docs: int, blk_bits: int, doc_freqs=None):
        self.mesh = mesh
        self.hdrs = hdrs              # int32[S, W_max]    sharded (docs)
        self.pays = pays              # uint32[S, W_max]   sharded (docs)
        self.blk_bits = blk_bits
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
        self.doc_freqs = doc_freqs
        # Per-shard plane pool (the sharded mirror of search/dense.py's
        # pool): uint32[S, C, NS_shard] sharded over the docs axis — each
        # chip holds its own C expanded term planes.  Slot assignment is
        # global (the same term occupies the same slot on every shard);
        # fills are one donated shard_map program per wave, and group
        # programs gather pool rows instead of scatter-expanding per
        # query.  Lazily allocated on first phrase/span batch.
        from collections import OrderedDict

        self.plane_pool = None
        self.plane_slot: "OrderedDict[int, int]" = OrderedDict()
        self.plane_free: list = []
        # Per-shard tf pool: f32[S, Ct, N_shard] — cached per-term tf
        # vectors, so repeat terms across batches score as one row
        # gather + similarity instead of re-running slice+scatter.
        self.tf_pool = None
        self.tf_slot: "OrderedDict[int, int]" = OrderedDict()
        self.tf_free: list = []

    # ------------------------------------------------------------------
    @staticmethod
    def partition(built: BuiltIndex, S: int) -> dict:
        """Host-side doc-range partition of a BuiltIndex into S shards.

        Returns the numpy shard arrays ({hdrs [S, W], pays [S, W],
        offsets/lengths [S, V], doc_lens [S, shard_docs]} + scalars) that
        ``build`` uploads — also what ``index/store.py:save_shards``
        persists so a serving process on a mesh cold-starts at upload
        speed instead of re-running this O(S*W) re-partition."""
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

        max_len = int(max(1, max(l.max(initial=0) for l in shard_lens)))
        # tail pad covers the largest slice any kernel takes: quarter-pow2
        # query buckets AND the coarse pow-4 pool-fill buckets
        from searcharray_tpu.ops.kernels import expand_bucket_of

        max_bucket = max(bucket_of(max_len), expand_bucket_of(max_len))
        W = max_words + max_bucket
        max_doc_len = float(built.doc_lens.max()) if len(built.doc_lens) else 1
        blk_bits = blk_bits_for(int(max_doc_len))
        hdrs_np = np.full((S, W), PAD_HDR32, dtype=np.int32)
        pays_np = np.zeros((S, W), dtype=np.uint32)
        for s in range(S):
            h, p = compress_planes(shard_datas[s], blk_bits)
            hdrs_np[s, : len(h)] = h
            pays_np[s, : len(p)] = p

        doc_lens_np = np.zeros((S, shard_docs), dtype=np.float32)
        for s in range(S):
            lo = starts[s]
            hi = min(N, lo + shard_docs)
            if hi > lo:
                doc_lens_np[s, : hi - lo] = built.doc_lens[lo:hi]
        return {
            "hdrs": hdrs_np, "pays": pays_np,
            "offsets": np.stack(shard_offs), "lengths": np.stack(shard_lens),
            "doc_lens": doc_lens_np, "shard_starts": starts,
            "shard_docs": shard_docs, "blk_bits": blk_bits,
            "num_docs": N,
        }

    @classmethod
    def _from_parts(cls, parts: dict, mesh, vocab, avg_doc_length: float,
                    doc_freqs) -> "ShardedIndex":
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = lambda spec: NamedSharding(mesh, spec)
        put = lambda a: jax.device_put(np.asarray(a), shard(P("docs", None)))
        return cls(mesh, put(parts["hdrs"]), put(parts["pays"]),
                   put(parts["offsets"]), put(parts["lengths"]),
                   put(parts["doc_lens"]), np.asarray(parts["shard_starts"]),
                   vocab, avg_doc_length, int(parts["num_docs"]),
                   int(parts["shard_docs"]), int(parts["blk_bits"]),
                   doc_freqs)

    @classmethod
    def build(cls, built: BuiltIndex, mesh=None) -> "ShardedIndex":
        if mesh is None:
            mesh = default_mesh()
        parts = cls.partition(built, mesh.shape["docs"])
        return cls._from_parts(parts, mesh, built.vocab,
                               built.avg_doc_length, built.doc_freqs)

    @classmethod
    def load(cls, directory: str, mesh=None) -> "ShardedIndex":
        """Mesh fast attach: memmap the per-shard arrays persisted by
        ``index/store.py:save_shards`` and upload them straight onto the
        mesh — no host re-partition (the cold-start analog of the v3
        single-chip attach).  The saved shard count must match the mesh's
        ``docs`` axis; vocab/doc_freqs load from the same v3 store."""
        from searcharray_tpu.index.store import load_index, load_shards

        if mesh is None:
            mesh = default_mesh()
        parts = load_shards(directory, mesh.shape["docs"])
        built = load_index(directory)
        return cls._from_parts(parts, mesh, built.vocab,
                               built.avg_doc_length, built.doc_freqs)

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

    def topk_queries(self, queries: Sequence[Sequence[str]], k: int = 10,
                     k1: float = 1.2, b: float = 0.75):
        """Distributed ranked retrieval: per-query global top-k.

        Returns host (scores[Q, k], global doc indices[Q, k]).
        """
        k = min(k, self.corpus_size)
        dense = self.score_queries(queries, k1=k1, b=b)  # [Q, N] sharded
        scores, idx = self.topk_fn(dense.shape, k)(dense)
        return (np.asarray(scores, dtype=np.float32),
                np.asarray(idx, dtype=np.int64))

    def topk_fn(self, shape, k: int):
        """Compiled distributed top-k over a docs-sharded [Q, N] array.

        Naive ``lax.top_k`` under GSPMD all-gathers the FULL doc axis
        first (verified on the compiled HLO — round-1 assumed otherwise).
        This version reduces each shard to its local top-k under
        shard_map, so only the [Q, S*k] candidate matrix crosses chips
        for the final combine (tests/test_sharded.py pins the HLO).
        """
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        key = ("topk", shape, k)
        fn = _score_cache.get(key)
        if fn is not None:
            return fn

        N_shard = self.max_shard_docs
        kl = min(k, N_shard)

        def local(d):
            # d: [Qb, 1(docs axis), N_shard] after shard_map splits
            s, i = jax.lax.top_k(d[:, 0, :], kl)
            base = jax.lax.axis_index("docs").astype(jnp.int32) * N_shard
            return s[:, None, :], (i.astype(jnp.int32) + base)[:, None, :]

        mapped = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=P("queries", "docs"),
            out_specs=(P("queries", "docs", None),
                       P("queries", "docs", None)),
        )

        num_real = self.corpus_size
        full = self.num_shards * N_shard
        qaxis = self.mesh.shape["queries"]

        @jax.jit
        def run(dense):
            # pad the doc axis back to S*N_shard and reshape to
            # [Q, S, N_shard] so the doc shards map to a mesh axis;
            # candidates are [Q, S, kl] -> [Q, S*kl] (small).  The query
            # axis pads to a queries-mesh-axis multiple (shard_map needs
            # even division) and slices back after the combine.
            Q = dense.shape[0]
            Qp = -(-Q // qaxis) * qaxis
            if full != num_real or Qp != Q:
                dense = jnp.pad(dense,
                                ((0, Qp - Q), (0, full - num_real)),
                                constant_values=-jnp.inf)
            d3 = dense.reshape(Qp, self.num_shards, N_shard)
            cs, ci = mapped(d3)
            cs = cs.reshape(Qp, -1)
            ci = ci.reshape(Qp, -1)
            s, j = jax.lax.top_k(cs, k)
            return s[:Q], jnp.take_along_axis(ci, j, axis=1)[:Q]

        _score_cache[key] = run
        return run


    def score_batch_device(self, queries_tids, kind: str = "bm25",
                           k1: float = 1.2, b: float = 0.75,
                           slop=0, rows=None):
        """Mixed term/phrase batch -> f32[Q, N] device array (sharded).

        The sharded counterpart of batch.score_batch_fused(as_device=True),
        running the SAME dense block-layout engine per shard: queries are
        deduped and grouped by structure (all terms in one shard_map
        program; phrases by (length, plan, pattern, bucket) — each group
        one shard_map program with a vmapped query axis and the in-program
        dense chain).  Dispatch count therefore matches the single-chip
        driver's group count instead of the query count.  edismax composes
        on top of this transparently (solr.py), so the full query DSL runs
        on a mesh.  ``slop`` is an int for the whole batch or a per-query
        sequence (mixed exact/slop batches).

        With ``rows`` (a sorted global doc-id subset; requires slop=0)
        scores come back as f32[Q, len(rows)] and per-shard compute is
        proportional to the subset: each shard receives its LOCAL slice
        of the row table, aligns every query term's postings to it
        (candidates.minis_for_rows) and scores only those rows — the
        sharded analog of the single-chip rows= path and the reference's
        phrase-phase cost contract (solr.py:328-338).
        """
        import jax.numpy as jnp

        from searcharray_tpu.search.phrase import _plan
        from searcharray_tpu.search.scoring import host_idf

        slops = ([int(slop)] * len(queries_tids) if np.isscalar(slop)
                 else [int(s) for s in slop])
        if rows is not None:
            if any(s != 0 for s in slops):
                raise ValueError("rows= requires slop=0")
            return self._score_rows_batch(queries_tids, rows, kind, k1, b)
        # dedup identical (query, slop) pairs (serving batches repeat
        # hot queries)
        keymap: dict = {}
        uniq: list = []
        uniq_slops: list = []
        expand: list = []
        for tids, sl in zip(queries_tids, slops):
            kq = None if tids is None else (tuple(tids), sl)
            uid = keymap.get(kq)
            if uid is None:
                uid = len(uniq)
                keymap[kq] = uid
                uniq.append(tids)
                uniq_slops.append(sl)
            expand.append(uid)
        queries_tids = uniq
        slops = uniq_slops

        from searcharray_tpu.ops.encoding import LSB_BITS
        from searcharray_tpu.search import candidates as C

        Q = len(queries_tids)
        N = self.corpus_size
        out = jnp.zeros((Q, N), jnp.float32)
        term_rows: list = []
        groups: dict = {}
        for qi, tids in enumerate(queries_tids):
            if tids is None or len(tids) == 0 or any(t < 0 for t in tids):
                continue
            dfs = [int(self.doc_freqs[t]) for t in tids]
            idf = host_idf(kind, dfs, N, self.avg_doc_length)
            if len(tids) == 1:
                kc = self._cand_term_kc(tids[0])
                if kc is not None:
                    groups.setdefault(("cterm", kc, kc), []).append(
                        (qi, list(tids), idf))
                    continue
                term_rows.append((qi, tids[0], idf))
                continue
            lengths = [int(self._host_lengths[:, t].sum()) for t in tids]
            if min(lengths) == 0:
                continue
            sl = slops[qi]
            if sl > 0:
                uniq: list = []
                mults: list = []
                for t in tids:
                    if t in uniq:
                        mults[uniq.index(t)] += 1
                    else:
                        uniq.append(t)
                        mults.append(1)
                w = len(tids) + sl - 1
                if not (w <= LSB_BITS and max(mults) <= 2):
                    # wide/high-multiplicity windows: per-query span kernel
                    out = out.at[qi].set(self._span_tids(
                        tids, sl, kind=kind, k1=k1, b=b, idf=float(idf)))
                    continue
                # candidate route: anchor-canonical order (the counted
                # term first — it is also the rows source, mirroring the
                # single-chip cspan class keys in search/batch.py)
                from searcharray_tpu.search.batch import _canon_slop

                u_lens = [int(self._host_lengths[:, t].sum()) for t in uniq]
                uniq_c, mults_c, _ = _canon_slop(
                    uniq, mults, [(0, n) for n in u_lens])
                spec = self._cand_phrase_spec(uniq_c, rarest_i=0)
                if spec is not None:
                    _ri, Kc, srcs = spec
                    gkey = ("cspan", len(uniq_c), 0, w, tuple(mults_c),
                            srcs, Kc, Kc, 0)
                    groups.setdefault(gkey, []).append((qi, uniq_c, idf))
                    continue
                anchor_i = int(np.argmin(u_lens))
                bucket = bucket_of(int(max(
                    self._host_lengths[:, t].max(initial=1) for t in uniq)))
                gkey = ("span", len(uniq), anchor_i, w, tuple(mults), bucket)
                groups.setdefault(gkey, []).append((qi, uniq, idf))
                continue
            spec = self._cand_phrase_spec(tids)
            if spec is not None:
                rarest_i, Kc, srcs = spec
                plan_key = tuple(
                    (d, tuple(idxs))
                    for d, idxs in _plan(len(tids), rarest_i))
                pattern = tuple(tids.index(t) for t in tids)
                gkey = ("cphrase", len(tids), plan_key, pattern, srcs, Kc,
                        Kc, rarest_i)
                groups.setdefault(gkey, []).append((qi, list(tids), idf))
                continue
            split = int(np.argmin(lengths))
            plan_key = tuple(
                (d, tuple(idxs)) for d, idxs in _plan(len(tids), split))
            pattern = tuple(tids.index(t) for t in tids)
            bucket = bucket_of(int(max(
                self._host_lengths[:, t].max(initial=1) for t in tids)))
            gkey = ("phrase", len(tids), plan_key, pattern, bucket)
            groups.setdefault(gkey, []).append((qi, tids, idf))
        for gkey, rows in groups.items():
            T = gkey[1]
            if gkey[0] in ("cterm", "cphrase", "cspan"):
                width = self._cand_width(gkey)
                for c0 in range(0, len(rows), width):
                    chunk = rows[c0: c0 + width]
                    Qp = self._qp_pad(C.qp_pad(len(chunk), width))
                    scores = self._cand_group(gkey, chunk, Qp, kind, k1, b)
                    qidx = np.asarray([qi for qi, _, _ in chunk], np.int64)
                    out = out.at[jnp.asarray(qidx)].set(scores)
                continue
            # cap the group's in-program dense planes ([Qg, T, NS_shard])
            S_blk = 1 << self.blk_bits
            max_chunk = max(1, (1 << 27) // max(
                1, T * self.max_shard_docs * S_blk))
            for c0 in range(0, len(rows), max_chunk):
                chunk = rows[c0: c0 + max_chunk]
                scores = self._phrase_group(gkey, chunk, kind, k1, b)
                qidx = np.asarray([qi for qi, _, _ in chunk], np.int64)
                out = out.at[jnp.asarray(qidx)].set(scores)
        if term_rows:
            tids_np = np.asarray([t for _, t, _ in term_rows], np.int64)
            idfs_np = np.asarray([i for _, _, i in term_rows], np.float32)
            scores = self._score_terms(tids_np, idfs_np, kind, k1, b)
            qidx = np.asarray([qi for qi, _, _ in term_rows], np.int64)
            out = out.at[jnp.asarray(qidx)].set(scores)
        if len(expand) != Q:
            out = jnp.take(out, jnp.asarray(np.asarray(expand, np.int64)),
                           axis=0)
        return out

    def _span_tids(self, tids, slop: int, kind: str = "none",
                   k1: float = 1.2, b: float = 0.75, idf=None):
        """Per-query sharded slop scoring by term ids (the wide-window /
        high-multiplicity fallback of the grouped driver)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        uniq: list = []
        mults: list = []
        for t in tids:
            if t in uniq:
                mults[uniq.index(t)] += 1
            else:
                uniq.append(t)
                mults.append(1)
        buckets = tuple(
            bucket_of(int(self._host_lengths[:, t].max(initial=1)))
            for t in uniq
        )
        lengths = [int(self._host_lengths[:, t].sum()) for t in uniq]
        anchor_i = int(np.argmin(lengths))
        if idf is None:
            if kind == "none":
                idf = 0.0
            else:
                from searcharray_tpu.search.scoring import host_idf

                idf = float(host_idf(
                    kind, [int(self.doc_freqs[t]) for t in tids],
                    self.corpus_size, self.avg_doc_length))
        fn = _sharded_span_fn(self, buckets, tuple(mults), anchor_i,
                              len(tids), slop, kind, k1, b)
        offs = np.stack([np.asarray(self.offsets)[:, t] for t in uniq],
                        axis=1)
        ns = np.stack([np.asarray(self.lengths)[:, t] for t in uniq], axis=1)
        sh = NamedSharding(self.mesh, P("docs", None))
        return fn(self.hdrs, self.pays, self.doc_lens,
                  jax.device_put(offs, sh), jax.device_put(ns, sh),
                  np.float32(idf))

    def _phrase_group(self, gkey, chunk, kind: str, k1: float, b: float):
        """One shard_map program for a [Qg, T] phrase or span group,
        running the dense engine's math on every chip.

        With the per-shard plane pool (default): the chunk's terms are
        made pool-resident by one donated fill program per posting
        bucket, and the group program gathers pool rows per query.  A
        chunk whose unique terms exceed the pool falls back to the
        in-program scatter-expansion path."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        T = gkey[1]
        qaxis = self.mesh.shape["queries"]
        Qg = len(chunk)
        Qp = -(-Qg // qaxis) * qaxis
        idfs = np.zeros(Qp, np.float32)
        for r, (qi, tids, idf) in enumerate(chunk):
            idfs[r] = idf
        idfs_d = jax.device_put(
            idfs, NamedSharding(self.mesh, P("queries")))

        uniq_terms = list(dict.fromkeys(
            t for _, tids, _ in chunk for t in tids))
        _, C = shard_plane_geom(self)
        if len(uniq_terms) <= C - 1:
            ensure_shard_planes(self, uniq_terms, pin=uniq_terms)
            slots = np.zeros((Qp, T), np.int32)
            for r, (qi, tids, idf) in enumerate(chunk):
                slots[r] = [self.plane_slot[t] for t in tids]
            slots[Qg:] = slots[0] if Qg else 0
            # pooled program key drops the posting bucket
            skey = gkey[:-1]
            fn = _sharded_pooled_group_fn(self, skey, Qp, kind, k1, b)
            slots_d = jax.device_put(
                slots, NamedSharding(self.mesh, P("queries", None)))
            return fn(self.plane_pool, self.doc_lens, slots_d, idfs_d)[:Qg]

        S = self.num_shards
        offs = np.zeros((S, Qp, T), np.int64)
        ns = np.zeros((S, Qp, T), np.int64)
        offsets_h = np.asarray(self.offsets)
        for r, (qi, tids, idf) in enumerate(chunk):
            offs[:, r, :] = offsets_h[:, tids]
            ns[:, r, :] = self._host_lengths[:, tids]
        fn = _sharded_phrase_group_fn(self, gkey, Qp, kind, k1, b)
        shq = NamedSharding(self.mesh, P("docs", "queries", None))
        offs_d = jax.device_put(offs, shq)
        ns_d = jax.device_put(ns, shq)
        return fn(self.hdrs, self.pays, self.doc_lens, offs_d, ns_d,
                  idfs_d)[:Qg]

    # ------------------------------------------------------------------
    # sharded candidate-subset engine (search/candidates.py per shard)
    # ------------------------------------------------------------------
    def _qp_pad(self, qp: int) -> int:
        """shard_map needs the queries axis divisible by the mesh axis."""
        qaxis = self.mesh.shape["queries"]
        return -(-qp // qaxis) * qaxis

    def _local_words(self, t: int) -> int:
        """Static per-shard slice size for a term: the max local posting
        length over shards (every shard runs the same program, shorter
        shards pad)."""
        return int(self._host_lengths[:, t].max(initial=1))

    def _cand_shim(self):
        """candidates.py sizing helpers see the SHARD-local geometry."""
        import types

        return types.SimpleNamespace(blk_bits=self.blk_bits,
                                     corpus_size=self.max_shard_docs)

    def _cand_term_kc(self, t: int):
        """Candidate-row bucket for a single-term query, or None when the
        candidate route does not win (broad term / small corpus)."""
        from searcharray_tpu.search import candidates as C

        if self.corpus_size < C.CAND_TERM_MIN_DOCS:
            return None
        kc = K.expand_bucket_of(max(1, self._local_words(t)))
        if kc * C.CAND_MAX_FRAC > self.max_shard_docs:
            return None
        return kc

    def _cand_phrase_spec(self, tids, rarest_i=None):
        """(rarest_i, Kc, srcs) when a phrase/span can run per shard on
        candidate rows (shard-local: each chip compacts its own rarest
        slice; no collective — candidates never cross shards)."""
        from searcharray_tpu.search import candidates as C

        if self.corpus_size < C.CAND_MIN_DOCS:
            return None
        lens = [self._local_words(t) for t in tids]
        buckets = [K.expand_bucket_of(max(1, n)) for n in lens]
        if rarest_i is None:
            rarest_i = int(np.argmin(buckets))
        Kc = buckets[rarest_i]
        if Kc * C.CAND_MAX_FRAC > self.max_shard_docs:
            return None
        srcs = C.query_sources(None, lens)
        n_pool = sum(1 for s in srcs if s == "pool")
        if n_pool > shard_plane_geom(self)[1] - 1:
            return None
        return rarest_i, Kc, srcs

    def _cand_width(self, gkey) -> int:
        """Max queries per candidate group program (bounds the gathered
        mini-planes / imap temporaries per shard)."""
        from searcharray_tpu.search import candidates as C

        shim = self._cand_shim()
        if gkey[0] == "cterm":
            return max(1, self._qp_pad(C.class_qp(shim, gkey[2])))
        T, srcs, Kc = gkey[1], gkey[-4], gkey[-3]
        width = max(1, C.class_qp(shim, Kc, srcs) // max(1, T))
        n_pool = sum(1 for s in srcs if s == "pool")
        if n_pool:
            width = min(width, max(
                1, (shard_plane_geom(self)[1] - 1) // n_pool))
        return max(1, self._qp_pad(width))

    def _cand_group(self, gkey, chunk, Qp: int, kind: str, k1: float,
                    b: float):
        """One shard_map program for a candidate class chunk -> [Qg, N]."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        S = self.num_shards
        Qg = len(chunk)
        idfs = np.zeros(Qp, np.float32)
        for r, (_qi, _tids, idf) in enumerate(chunk):
            idfs[r] = idf
        idfs_d = jax.device_put(idfs, NamedSharding(self.mesh, P("queries")))
        offsets_h = np.asarray(self.offsets)
        shq = NamedSharding(self.mesh, P("docs", "queries"))
        shq3 = NamedSharding(self.mesh, P("docs", "queries", None))
        shs = NamedSharding(self.mesh, P("queries", None))
        CAND_PROGRAMS[0] += 1
        if gkey[0] == "cterm":
            offs = np.zeros((S, Qp), np.int64)
            ns = np.zeros((S, Qp), np.int64)
            for r, (_qi, tids, _idf) in enumerate(chunk):
                offs[:, r] = offsets_h[:, tids[0]]
                ns[:, r] = self._host_lengths[:, tids[0]]
            fn = _sharded_cand_fn(self, gkey, Qp, kind, k1, b)
            return fn(self.hdrs, self.pays, self.doc_lens,
                      jax.device_put(offs, shq), jax.device_put(ns, shq),
                      idfs_d)[:Qg]
        T, srcs, rarest_i = gkey[1], gkey[-4], gkey[-1]
        mini_is = [i for i in range(T) if srcs[i] != "pool"]
        pool_is = [i for i in range(T) if srcs[i] == "pool"]
        pool_terms = list(dict.fromkeys(
            tids[i] for _qi, tids, _idf in chunk for i in pool_is))
        if pool_terms:
            ensure_shard_planes(self, pool_terms, pin=pool_terms)
        M = max(1, len(mini_is))
        Pn = max(1, len(pool_is))
        r_offs = np.zeros((S, Qp), np.int64)
        r_ns = np.zeros((S, Qp), np.int64)
        m_offs = np.zeros((S, Qp, M), np.int64)
        m_ns = np.zeros((S, Qp, M), np.int64)
        slots = np.zeros((Qp, Pn), np.int32)
        for r, (_qi, tids, _idf) in enumerate(chunk):
            rt = tids[rarest_i]
            r_offs[:, r] = offsets_h[:, rt]
            r_ns[:, r] = self._host_lengths[:, rt]
            for j, i in enumerate(mini_is):
                m_offs[:, r, j] = offsets_h[:, tids[i]]
                m_ns[:, r, j] = self._host_lengths[:, tids[i]]
            for j, i in enumerate(pool_is):
                slots[r, j] = self.plane_slot[tids[i]]
        fn = _sharded_cand_fn(self, gkey, Qp, kind, k1, b)
        args = [self.hdrs, self.pays]
        if pool_is:
            args.append(self.plane_pool)
        args += [self.doc_lens, jax.device_put(r_offs, shq),
                 jax.device_put(r_ns, shq), jax.device_put(m_offs, shq3),
                 jax.device_put(m_ns, shq3), jax.device_put(slots, shs),
                 idfs_d]
        return fn(*args)[:Qg]

    def _score_rows_batch(self, queries_tids, rows, kind: str, k1: float,
                          b: float):
        """Mixed term/phrase batch scored ONLY at global doc ids ``rows``
        -> f32[Q, len(rows)] (sharded edismax phase pruning)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from searcharray_tpu.search import candidates as C
        from searcharray_tpu.search.phrase import _plan
        from searcharray_tpu.search.scoring import host_idf

        rows = np.asarray(rows, dtype=np.int64)
        order = np.argsort(rows, kind="stable")
        unsorted = bool((np.diff(rows) < 0).any()) if len(rows) > 1 else False
        rows_s = rows[order] if unsorted else rows
        R = len(rows)
        N = self.corpus_size
        N_shard = self.max_shard_docs
        S = self.num_shards
        sid = rows_s // N_shard
        loc = (rows_s % N_shard).astype(np.int32)
        counts = np.bincount(sid, minlength=S)
        # one row-table bucket shared by every group in the batch: the
        # program class keys on Kc, so serving converges to a warm set
        Kc = K.expand_bucket_of(int(max(1, counts.max())))
        rtab = np.full((S, Kc), N_shard, np.int32)
        flat = np.zeros(R, np.int64)
        pos = 0
        for s in range(S):
            c = int(counts[s])
            rtab[s, :c] = loc[pos: pos + c]
            flat[pos: pos + c] = s * Kc + np.arange(c)
            pos += c
        if unsorted:
            inv = np.empty(R, np.int64)
            inv[order] = np.arange(R)
            flat = flat[inv]
        Rp = bucket_of(max(1, R))
        flat_p = np.zeros(Rp, np.int32)
        flat_p[:R] = flat
        rtab_d = jax.device_put(rtab,
                                NamedSharding(self.mesh, P("docs", None)))
        flat_d = jnp.asarray(flat_p)

        Q = len(queries_tids)
        out = jnp.zeros((Q, R), jnp.float32)
        groups: dict = {}
        for qi, tids in enumerate(queries_tids):
            if tids is None or len(tids) == 0 or any(t < 0 for t in tids):
                continue
            if any(int(self._host_lengths[:, t].sum()) == 0 for t in tids):
                continue
            lens = [self._local_words(t) for t in tids]
            dfs = [int(self.doc_freqs[t]) for t in tids]
            idf = host_idf(kind, dfs, N, self.avg_doc_length)
            srcs = C.query_sources(None, lens)
            T = len(tids)
            if T == 1:
                gkey = ("rphrase", 1, (), (0,), srcs, Kc, Kc, 0)
            else:
                split = int(np.argmin(lens))
                plan_key = tuple((d, tuple(idxs))
                                 for d, idxs in _plan(T, split))
                pattern = tuple(tids.index(t) for t in tids)
                gkey = ("rphrase", T, plan_key, pattern, srcs, Kc, Kc, 0)
            groups.setdefault(gkey, []).append((qi, list(tids), idf))
        for gkey, grows in groups.items():
            width = self._cand_width(gkey)
            for c0 in range(0, len(grows), width):
                chunk = grows[c0: c0 + width]
                Qp = self._qp_pad(C.qp_pad(len(chunk), width))
                scores = self._rows_group(gkey, chunk, Qp, rtab_d, flat_d,
                                          Rp, kind, k1, b)
                qidx = np.asarray([qi for qi, _, _ in chunk], np.int64)
                out = out.at[jnp.asarray(qidx)].set(scores[:, :R])
        return out

    def _rows_group(self, gkey, chunk, Qp: int, rtab_d, flat_d, Rp: int,
                    kind: str, k1: float, b: float):
        """One shard_map program for a rows= class chunk -> [Qg, Rp]."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        S = self.num_shards
        Qg = len(chunk)
        T, srcs = gkey[1], gkey[4]
        idfs = np.zeros(Qp, np.float32)
        for r, (_qi, _tids, idf) in enumerate(chunk):
            idfs[r] = idf
        idfs_d = jax.device_put(idfs,
                                NamedSharding(self.mesh, P("queries")))
        offsets_h = np.asarray(self.offsets)
        shq3 = NamedSharding(self.mesh, P("docs", "queries", None))
        shs = NamedSharding(self.mesh, P("queries", None))
        mini_is = [i for i in range(T) if srcs[i] != "pool"]
        pool_is = [i for i in range(T) if srcs[i] == "pool"]
        pool_terms = list(dict.fromkeys(
            tids[i] for _qi, tids, _idf in chunk for i in pool_is))
        if pool_terms:
            ensure_shard_planes(self, pool_terms, pin=pool_terms)
        M = max(1, len(mini_is))
        Pn = max(1, len(pool_is))
        m_offs = np.zeros((S, Qp, M), np.int64)
        m_ns = np.zeros((S, Qp, M), np.int64)
        slots = np.zeros((Qp, Pn), np.int32)
        for r, (_qi, tids, _idf) in enumerate(chunk):
            for j, i in enumerate(mini_is):
                m_offs[:, r, j] = offsets_h[:, tids[i]]
                m_ns[:, r, j] = self._host_lengths[:, tids[i]]
            for j, i in enumerate(pool_is):
                slots[r, j] = self.plane_slot[tids[i]]
        CAND_PROGRAMS[0] += 1
        fn = _sharded_rows_fn(self, gkey, Qp, Rp, kind, k1, b)
        args = [self.hdrs, self.pays]
        if pool_is:
            args.append(self.plane_pool)
        args += [self.doc_lens, rtab_d, jax.device_put(m_offs, shq3),
                 jax.device_put(m_ns, shq3), jax.device_put(slots, shs),
                 idfs_d, flat_d]
        return fn(*args)[:Qg]

    def _score_terms(self, tids_np: np.ndarray, idfs_np: np.ndarray,
                     kind: str, k1: float, b: float):
        """One-term-per-query batch with host-side idfs -> [Qt, N].

        Terms go through the per-shard tf pool when the batch fits
        (repeat terms across batches then cost one row gather each);
        oversized batches fall back to the slice+scatter program."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        qaxis = self.mesh.shape["queries"]
        Q = len(tids_np)
        Qp = -(-Q // qaxis) * qaxis
        if Qp != Q:
            tids_np = np.concatenate(
                [tids_np, np.full(Qp - Q, -1, dtype=np.int64)])
            idfs_np = np.concatenate(
                [idfs_np, np.zeros(Qp - Q, dtype=np.float32)])
        uniq_terms = [int(t) for t in dict.fromkeys(tids_np) if t >= 0]
        _, Ct = shard_tf_geom(self)
        if uniq_terms and len(uniq_terms) <= Ct - 1:
            ensure_shard_tfs(self, uniq_terms, pin=uniq_terms)
            fill = self.tf_slot[uniq_terms[0]]
            slots = np.asarray(
                [self.tf_slot[int(t)] if t >= 0 else fill
                 for t in tids_np], np.int32)
            fn = _sharded_pooled_term_fn(self, Qp, kind, k1, b)
            sh = NamedSharding(self.mesh, P("queries"))
            out = fn(self.tf_pool, self.doc_lens,
                     jax.device_put(slots, sh),
                     jax.device_put(idfs_np, sh))
            return out[:Q]
        bucket = self._max_bucket_for(tids_np)
        key = ("terms1", self.corpus_size, self.max_shard_docs,
               self.blk_bits, self.num_shards, float(self.avg_doc_length),
               Qp, bucket, kind, k1, b)
        fn = _score_cache.get(key)
        if fn is None:
            fn = _build_sharded_term_scores(self, bucket, kind, k1, b)
            _score_cache[key] = fn
        sh = NamedSharding(self.mesh, P("queries"))
        tids = jax.device_put(tids_np, sh)
        idfs = jax.device_put(idfs_np, sh)
        out = fn(self.hdrs, self.pays, self.offsets, self.lengths,
                 self.doc_lens, tids, idfs)
        return out[:Q]

    def phrase_freqs(self, tokens: Sequence[str], k1: float = 1.2,
                     b: float = 0.75, kind: str = "none"):
        """Exact-phrase frequencies (or BM25 scores) corpus-wide, computed
        per shard under shard_map (phrases are doc-local, so no collective
        is needed beyond the build-time global stats)."""
        import jax.numpy as jnp

        if any(t not in self.vocab for t in tokens):
            return jnp.zeros(self.corpus_size, dtype=jnp.float32)
        tids = [self.vocab.get_term_id(t) for t in tokens]
        return self._phrase_tids(tids, kind=kind, k1=k1, b=b)

    def _phrase_tids(self, tids, kind: str = "none", k1: float = 1.2,
                     b: float = 0.75, idf=None):
        buckets = tuple(
            bucket_of(int(self._host_lengths[:, t].max(initial=1)))
            for t in tids
        )
        lengths = [int(self._host_lengths[:, t].sum()) for t in tids]
        split = int(np.argmin(lengths))
        tids_key = tuple(tids.index(t) for t in tids)
        if idf is None:
            if kind == "none":
                idf = 0.0
            else:
                from searcharray_tpu.search.scoring import host_idf

                dfs = [int(self.doc_freqs[t]) for t in tids]
                idf = float(host_idf(kind, dfs, self.corpus_size,
                                     self.avg_doc_length))
        fn = _sharded_phrase_fn(self, buckets, tids_key, split, kind, k1, b)
        offs = np.stack(
            [np.asarray(self.offsets)[:, t] for t in tids], axis=1
        )  # [S, T]
        ns = np.stack([np.asarray(self.lengths)[:, t] for t in tids], axis=1)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("docs", None))
        offs_d = jax.device_put(offs, sh)
        ns_d = jax.device_put(ns, sh)
        return fn(self.hdrs, self.pays, self.doc_lens, offs_d, ns_d,
                  np.float32(idf))

    def span_freqs(self, tokens: Sequence[str], slop: int, k1: float = 1.2,
                   b: float = 0.75, kind: str = "none"):
        """Slop-phrase frequencies (or BM25 scores) corpus-wide, per shard
        under shard_map (windows never cross documents, so slop search is
        shard-local like exact phrases)."""
        import jax.numpy as jnp

        if any(t not in self.vocab for t in tokens):
            return jnp.zeros(self.corpus_size, dtype=jnp.float32)
        tids = [self.vocab.get_term_id(t) for t in tokens]
        return self._span_tids(tids, slop, kind=kind, k1=k1, b=b)


# ---------------------------------------------------------------------------
# per-shard plane pool
# ---------------------------------------------------------------------------
SHARD_POOL_BYTES = 1 << 30     # per-chip HBM budget for expanded planes
SHARD_POOL_MAX_SLOTS = 256
_SHARD_FILL_K = 32             # terms per fill dispatch (fixed row axis)

_pool_cache: dict = {}


def shard_plane_geom(idx: ShardedIndex):
    """(NS_shard, capacity) of the per-shard plane pool."""
    NS_shard = idx.max_shard_docs << idx.blk_bits
    C = int(min(SHARD_POOL_MAX_SLOTS,
                max(8, SHARD_POOL_BYTES // max(1, NS_shard * 4))))
    return NS_shard, C


def _init_shard_pool(idx: ShardedIndex) -> None:
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if idx.plane_pool is not None:
        return
    NS_shard, C = shard_plane_geom(idx)
    sh = NamedSharding(idx.mesh, P("docs", None, None))

    @functools.partial(jax.jit, out_shardings=sh)
    def z():
        return jnp.zeros((idx.num_shards, C, NS_shard), jnp.uint32)

    idx.plane_pool = z()
    idx.plane_free = list(range(C - 1, -1, -1))


def _shard_fill_fn(idx: ShardedIndex, bucket: int, C: int):
    """jit (pool donated): fill _SHARD_FILL_K term planes on every shard.

    Slot ids are global (replicated): term t lands in the same pool row
    on each chip, over that chip's local doc range."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("sfill", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, bucket, C)
    fn = _pool_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.ops import kernels as K

    NS_shard = idx.max_shard_docs << idx.blk_bits
    blk_bits = idx.blk_bits

    def local(pool_s, hdr_s, pay_s, offs_s, ns_s, slots, k_real):
        pool0, hdr0, pay0 = pool_s[0], hdr_s[0], pay_s[0]
        offs0, ns0 = offs_s[0], ns_s[0]

        # dynamic 0..k_real trip count, not a fixed loop with a cond-skip:
        # a cond threading the pool makes XLA copy the whole buffer per
        # iteration on TPU (see search/dense.py _fill_fn)
        def body(i, pl):
            h, p = K.take_term_planes(hdr0, pay0, offs0[i], ns0[i],
                                      bucket=bucket, blk_bits=blk_bits)
            row = jnp.zeros(NS_shard, jnp.uint32).at[h].set(
                p, mode="drop", unique_indices=True,
                indices_are_sorted=True)
            return jax.lax.dynamic_update_slice(pl, row[None, :],
                                                (slots[i], 0))

        return jax.lax.fori_loop(0, k_real, body, pool0)[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None, None), P("docs", None), P("docs", None),
                  P("docs", None), P("docs", None), P(), P()),
        out_specs=P("docs", None, None),
    )

    run = jax.jit(mapped, donate_argnums=(0,))
    _pool_cache[key] = run
    return run


def ensure_shard_planes(idx: ShardedIndex, tids, pin=()) -> None:
    """Make every term's expanded plane pool-resident on all shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from searcharray_tpu.search.dense import _alloc_slots

    _init_shard_pool(idx)
    new = _alloc_slots(idx.plane_slot, idx.plane_free,
                       set(pin) | set(tids), tids)
    if not new:
        return
    C = idx.plane_pool.shape[1]
    by_bucket: dict = {}
    for t, s in new:
        b = bucket_of(int(idx._host_lengths[:, t].max(initial=1)))
        by_bucket.setdefault(b, []).append((t, s))
    offsets_h = np.asarray(idx.offsets)
    sh = NamedSharding(idx.mesh, P("docs", None))
    for bucket, rows in by_bucket.items():
        fn = _shard_fill_fn(idx, bucket, C)
        for c0 in range(0, len(rows), _SHARD_FILL_K):
            chunk = rows[c0: c0 + _SHARD_FILL_K]
            offs = np.zeros((idx.num_shards, _SHARD_FILL_K), np.int64)
            ns = np.zeros((idx.num_shards, _SHARD_FILL_K), np.int64)
            slots = np.zeros(_SHARD_FILL_K, np.int32)
            for r, (t, s) in enumerate(chunk):
                offs[:, r] = offsets_h[:, t]
                ns[:, r] = idx._host_lengths[:, t]
                slots[r] = s
            idx.plane_pool = fn(idx.plane_pool, idx.hdrs, idx.pays,
                                jax.device_put(offs, sh),
                                jax.device_put(ns, sh), slots,
                                np.int32(len(chunk)))


SHARD_TF_POOL_BYTES = 256 << 20   # per-chip budget for cached tf rows
SHARD_TF_MAX_SLOTS = 1024
_SHARD_TF_FILL_K = 32


def shard_tf_geom(idx: ShardedIndex):
    Ct = int(min(SHARD_TF_MAX_SLOTS,
                 max(8, SHARD_TF_POOL_BYTES // max(1, idx.max_shard_docs * 4))))
    return idx.max_shard_docs, Ct


def _init_shard_tf_pool(idx: ShardedIndex) -> None:
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if idx.tf_pool is not None:
        return
    N_shard, Ct = shard_tf_geom(idx)
    sh = NamedSharding(idx.mesh, P("docs", None, None))

    @functools.partial(jax.jit, out_shardings=sh)
    def z():
        return jnp.zeros((idx.num_shards, Ct, N_shard), jnp.float32)

    idx.tf_pool = z()
    idx.tf_free = list(range(Ct - 1, -1, -1))


def _shard_tf_fill_fn(idx: ShardedIndex, bucket: int, Ct: int):
    """jit (pool donated): fill _SHARD_TF_FILL_K tf rows on every shard."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("stfill", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, bucket, Ct)
    fn = _pool_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.ops import kernels as K

    N_shard = idx.max_shard_docs
    blk_bits = idx.blk_bits

    def local(pool_s, hdr_s, pay_s, offs_s, ns_s, slots, k_real):
        pool0, hdr0, pay0 = pool_s[0], hdr_s[0], pay_s[0]
        offs0, ns0 = offs_s[0], ns_s[0]

        # dynamic trip count — see _shard_fill_fn
        def body(i, pl):
            h, p = K.take_term_planes(hdr0, pay0, offs0[i], ns0[i],
                                      bucket=bucket, blk_bits=blk_bits)
            keys = (h >> jnp.int32(blk_bits)).astype(jnp.int32)
            pops = jax.lax.population_count(p).astype(jnp.float32)
            row = jnp.zeros(N_shard, jnp.float32).at[keys].add(
                pops, mode="drop")
            return jax.lax.dynamic_update_slice(pl, row[None, :],
                                                (slots[i], 0))

        return jax.lax.fori_loop(0, k_real, body, pool0)[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None, None), P("docs", None), P("docs", None),
                  P("docs", None), P("docs", None), P(), P()),
        out_specs=P("docs", None, None),
    )

    run = jax.jit(mapped, donate_argnums=(0,))
    _pool_cache[key] = run
    return run


def ensure_shard_tfs(idx: ShardedIndex, tids, pin=()) -> None:
    """Make every term's tf row pool-resident on all shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from searcharray_tpu.search.dense import _alloc_slots

    _init_shard_tf_pool(idx)
    new = _alloc_slots(idx.tf_slot, idx.tf_free, set(pin) | set(tids), tids)
    if not new:
        return
    Ct = idx.tf_pool.shape[1]
    by_bucket: dict = {}
    for t, s in new:
        b = bucket_of(int(idx._host_lengths[:, t].max(initial=1)))
        by_bucket.setdefault(b, []).append((t, s))
    offsets_h = np.asarray(idx.offsets)
    sh = NamedSharding(idx.mesh, P("docs", None))
    for bucket, rows in by_bucket.items():
        fn = _shard_tf_fill_fn(idx, bucket, Ct)
        for c0 in range(0, len(rows), _SHARD_TF_FILL_K):
            chunk = rows[c0: c0 + _SHARD_TF_FILL_K]
            offs = np.zeros((idx.num_shards, _SHARD_TF_FILL_K), np.int64)
            ns = np.zeros((idx.num_shards, _SHARD_TF_FILL_K), np.int64)
            slots = np.zeros(_SHARD_TF_FILL_K, np.int32)
            for r, (t, s) in enumerate(chunk):
                offs[:, r] = offsets_h[:, t]
                ns[:, r] = idx._host_lengths[:, t]
                slots[r] = s
            idx.tf_pool = fn(idx.tf_pool, idx.hdrs, idx.pays,
                             jax.device_put(offs, sh),
                             jax.device_put(ns, sh), slots,
                             np.int32(len(chunk)))


def _sharded_pooled_term_fn(idx: ShardedIndex, Qp: int, kind: str,
                            k1: float, b: float):
    """shard_map program: (tf_pool, doc_lens, slots int32[Qp], idfs[Qp])
    -> f32[Qp, N] — one row gather + similarity per query."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("tgroup_pool", idx.corpus_size, idx.max_shard_docs,
           idx.num_shards, float(idx.avg_doc_length), Qp, kind, k1, b)
    fn = _pool_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.search.scoring import apply_similarity_device

    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))

    def local(pool_s, doc_lens_s, slots_q, idfs_q):
        pool0, doc_lens0 = pool_s[0], doc_lens_s[0]
        tfs = jnp.take(pool0, slots_q, axis=0)  # [Qq, N_shard]
        out = apply_similarity_device(kind, tfs, doc_lens0[None, :],
                                      idfs_q[:, None], avgdl, k1, b)
        return out[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None, None), P("docs", None), P("queries"),
                  P("queries")),
        out_specs=P("docs", "queries", None),
    )

    num_real = idx.corpus_size

    @jax.jit
    def run(pool, doc_lens, slots, idfs):
        out = mapped(pool, doc_lens, slots, idfs)
        out = jnp.moveaxis(out, 0, 1)
        return out.reshape(out.shape[0], -1)[:, :num_real]

    _pool_cache[key] = run
    return run


def _sharded_pooled_group_fn(idx: ShardedIndex, skey, Qp: int, kind: str,
                             k1: float, b: float):
    """shard_map program for a phrase/span group over POOLED planes:
    (pool, doc_lens, slots int32[Qp, T], idfs[Qp]) -> f32[Qp, N].

    Gathers each query's term planes from the per-shard pool — no
    per-query scatter-expansion, and the program key drops the posting
    bucket (pool rows are bucket-free), so group classes collapse
    further than the expansion path's."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("pgroup_pool", idx.corpus_size, idx.max_shard_docs,
           idx.blk_bits, idx.num_shards, float(idx.avg_doc_length), skey,
           Qp, kind, k1, b)
    fn = _pool_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.search.dense import (
        phrase_counts_dense_planes,
        span_counts_dense_planes,
    )
    from searcharray_tpu.search.scoring import apply_similarity_device

    T = skey[1]
    N_shard = idx.max_shard_docs
    S_blk = 1 << idx.blk_bits
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    if skey[0] == "phrase":
        _, _, plan_key, pattern = skey
        plan = [(d, list(idxs)) for d, idxs in plan_key]
        pattern_l = list(pattern)

        def reduce_planes(planes):
            return phrase_counts_dense_planes(planes, pattern_l, plan,
                                              N_shard, S_blk)
    else:  # span
        _, _, anchor_i, w, mults = skey

        def reduce_planes(planes):
            return span_counts_dense_planes(planes, anchor_i, w, N_shard,
                                            S_blk, mults=mults)

    def local(pool_s, doc_lens_s, slots_q, idfs_q):
        pool0, doc_lens0 = pool_s[0], doc_lens_s[0]
        planes = [jnp.take(pool0, slots_q[:, t], axis=0)
                  for t in range(T)]  # [Qq, NS_shard] each
        freqs = reduce_planes(planes)
        out = apply_similarity_device(kind, freqs, doc_lens0[None, :],
                                      idfs_q[:, None], avgdl, k1, b)
        return out[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None, None), P("docs", None),
                  P("queries", None), P("queries")),
        out_specs=P("docs", "queries", None),
    )

    num_real = idx.corpus_size

    @jax.jit
    def run(pool, doc_lens, slots, idfs):
        out = mapped(pool, doc_lens, slots, idfs)
        out = jnp.moveaxis(out, 0, 1)  # [S, Qp, N_shard] -> [Qp, S, ...]
        return out.reshape(out.shape[0], -1)[:, :num_real]

    _pool_cache[key] = run
    return run


# candidate shard_map dispatches since import (tests pin the routing)
CAND_PROGRAMS = [0]


def _sharded_cand_fn(idx: ShardedIndex, gkey, Qp: int, kind: str,
                     k1: float, b: float):
    """shard_map program for a candidate class: each shard compacts its
    LOCAL rarest-term slice into candidate rows, builds per-term
    mini-planes (search/candidates.py bodies with N = the shard's doc
    range), scores, and scatters into its local dense vector — work per
    shard is O(local docfreq), not O(corpus/chip), and no collective is
    needed (candidates are shard-local).  This is the sharded analog of
    the single-chip cterm/cphrase/cspan routing (round-3 verdict item 3).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from searcharray_tpu.search import candidates as C

    key = ("cgroup", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, float(idx.avg_doc_length), gkey, Qp, kind, k1, b)
    fn = _pool_cache.get(key)
    if fn is not None:
        return fn

    N_shard = idx.max_shard_docs
    dev_static = {"N": N_shard, "blk_bits": idx.blk_bits}
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    num_real = idx.corpus_size

    if gkey[0] == "cterm":
        _, bucket, Kc = gkey

        def local(hdr_s, pay_s, doc_lens_s, offs_q, ns_q, idfs_q):
            hdr0, pay0, dl0 = hdr_s[0], pay_s[0], doc_lens_s[0]
            tf, crows = jax.vmap(
                lambda o_, n_: C.cterm_body(dev_static, Kc, bucket, hdr0,
                                            pay0, o_, n_)
            )(offs_q[0], ns_q[0])
            out = C.finish_candidates(tf, crows, dl0, idfs_q, avgdl, kind,
                                      k1, b, None, N_shard, N_shard)
            return out[None]

        in_specs = (P("docs", None), P("docs", None), P("docs", None),
                    P("docs", "queries"), P("docs", "queries"),
                    P("queries"))
    else:
        if gkey[0] == "cphrase":
            _, T, plan_key, pattern, srcs, Kc, rbucket, _ri = gkey

            def body(hdr0, pay0, pool0, ro, rn, mo, mn, sl):
                return C.cphrase_body(dev_static, T, plan_key, pattern,
                                      srcs, Kc, rbucket, hdr0, pay0, pool0,
                                      ro, rn, mo, mn, sl)
        else:  # cspan
            _, T, anchor_i, w, mults, srcs, Kc, rbucket, _ri = gkey

            def body(hdr0, pay0, pool0, ro, rn, mo, mn, sl):
                return C.cspan_body(dev_static, T, anchor_i, w, mults, srcs,
                                    Kc, rbucket, hdr0, pay0, pool0,
                                    ro, rn, mo, mn, sl)

        has_pool = any(s == "pool" for s in srcs)

        def finish(freqs, crows, dl0, idfs_q):
            return C.finish_candidates(freqs, crows, dl0, idfs_q, avgdl,
                                       kind, k1, b, None, N_shard, N_shard)

        if has_pool:
            def local(hdr_s, pay_s, pool_s, doc_lens_s, r_offs_q, r_ns_q,
                      m_offs_q, m_ns_q, slots_q, idfs_q):
                hdr0, pay0, pool0 = hdr_s[0], pay_s[0], pool_s[0]
                freqs, crows = jax.vmap(
                    lambda ro, rn, mo, mn, sl: body(hdr0, pay0, pool0, ro,
                                                    rn, mo, mn, sl)
                )(r_offs_q[0], r_ns_q[0], m_offs_q[0], m_ns_q[0], slots_q)
                return finish(freqs, crows, doc_lens_s[0], idfs_q)[None]

            in_specs = (P("docs", None), P("docs", None),
                        P("docs", None, None), P("docs", None),
                        P("docs", "queries"), P("docs", "queries"),
                        P("docs", "queries", None),
                        P("docs", "queries", None), P("queries", None),
                        P("queries"))
        else:
            def local(hdr_s, pay_s, doc_lens_s, r_offs_q, r_ns_q,
                      m_offs_q, m_ns_q, slots_q, idfs_q):
                hdr0, pay0 = hdr_s[0], pay_s[0]
                freqs, crows = jax.vmap(
                    lambda ro, rn, mo, mn, sl: body(hdr0, pay0, None, ro,
                                                    rn, mo, mn, sl)
                )(r_offs_q[0], r_ns_q[0], m_offs_q[0], m_ns_q[0], slots_q)
                return finish(freqs, crows, doc_lens_s[0], idfs_q)[None]

            in_specs = (P("docs", None), P("docs", None), P("docs", None),
                        P("docs", "queries"), P("docs", "queries"),
                        P("docs", "queries", None),
                        P("docs", "queries", None), P("queries", None),
                        P("queries"))

    mapped = jax.shard_map(local, mesh=idx.mesh, in_specs=in_specs,
                           out_specs=P("docs", "queries", None))

    @jax.jit
    def run(*args):
        out = mapped(*args)
        out = jnp.moveaxis(out, 0, 1)  # [S, Qp, N_shard] -> [Qp, S, ...]
        return out.reshape(out.shape[0], -1)[:, :num_real]

    _pool_cache[key] = run
    return run


def _sharded_rows_fn(idx: ShardedIndex, gkey, Qp: int, Rp: int, kind: str,
                     k1: float, b: float):
    """shard_map program for a rows= class: each shard aligns every query
    term's postings to its LOCAL slice of the caller-supplied row table
    (candidates.minis_for_rows) and scores only those rows — per-shard
    work is O(subset + local docfreq), never O(corpus/chip).  The [S, Qp,
    Kc] per-shard scores regather to the caller's global row order via a
    host-built flat index (shard * Kc + slot)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from searcharray_tpu.search import candidates as C
    from searcharray_tpu.search.dense import (
        _popcount_f32,
        _slot_sum,
        phrase_counts_dense_planes,
    )
    from searcharray_tpu.search.scoring import apply_similarity_device

    key = ("rgroup", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, float(idx.avg_doc_length), gkey, Qp, Rp, kind,
           k1, b)
    fn = _pool_cache.get(key)
    if fn is not None:
        return fn

    N_shard = idx.max_shard_docs
    dev_static = {"N": N_shard, "blk_bits": idx.blk_bits}
    S_blk = 1 << idx.blk_bits
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    _, T, plan_key, pattern, srcs, Kc, _rb, _ri = gkey
    has_pool = any(s == "pool" for s in srcs)
    plan = [(d, list(idxs)) for d, idxs in plan_key]

    def one_query(hdr0, pay0, pool0, rows_loc, mo, mn, sl):
        minis = C.minis_for_rows(dev_static, T, srcs, Kc, rows_loc, hdr0,
                                 pay0, pool0, mo, mn, sl)
        if T == 1:
            return _slot_sum(_popcount_f32(minis[0]), S_blk)
        return phrase_counts_dense_planes(minis, list(pattern), plan, Kc,
                                          S_blk)

    def score_local(freqs, rows_loc, dl0, idfs_q):
        valid = rows_loc < jnp.int32(N_shard)
        dl = jnp.take(dl0, jnp.clip(rows_loc, 0, N_shard - 1))
        scores = apply_similarity_device(kind, freqs, dl[None, :],
                                         idfs_q[:, None], avgdl, k1, b)
        return jnp.where(valid[None, :], scores, np.float32(0.0))

    if has_pool:
        def local(hdr_s, pay_s, pool_s, dl_s, rtab_s, mo_q, mn_q, sl_q,
                  idfs_q):
            hdr0, pay0, pool0 = hdr_s[0], pay_s[0], pool_s[0]
            rows_loc = rtab_s[0]
            freqs = jax.vmap(
                lambda mo, mn, sl: one_query(hdr0, pay0, pool0, rows_loc,
                                             mo, mn, sl)
            )(mo_q[0], mn_q[0], sl_q)
            return score_local(freqs, rows_loc, dl_s[0], idfs_q)[None]

        in_specs = (P("docs", None), P("docs", None),
                    P("docs", None, None), P("docs", None),
                    P("docs", None), P("docs", "queries", None),
                    P("docs", "queries", None), P("queries", None),
                    P("queries"))
    else:
        def local(hdr_s, pay_s, dl_s, rtab_s, mo_q, mn_q, sl_q, idfs_q):
            hdr0, pay0 = hdr_s[0], pay_s[0]
            rows_loc = rtab_s[0]
            freqs = jax.vmap(
                lambda mo, mn, sl: one_query(hdr0, pay0, None, rows_loc,
                                             mo, mn, sl)
            )(mo_q[0], mn_q[0], sl_q)
            return score_local(freqs, rows_loc, dl_s[0], idfs_q)[None]

        in_specs = (P("docs", None), P("docs", None), P("docs", None),
                    P("docs", None), P("docs", "queries", None),
                    P("docs", "queries", None), P("queries", None),
                    P("queries"))

    mapped = jax.shard_map(local, mesh=idx.mesh, in_specs=in_specs,
                           out_specs=P("docs", "queries", None))

    @jax.jit
    def run(*args):
        *margs, flat_idx = args
        out = mapped(*margs)                       # [S, Qp, Kc]
        out = jnp.moveaxis(out, 0, 1)              # [Qp, S, Kc]
        out = out.reshape(out.shape[0], -1)        # [Qp, S*Kc]
        return jnp.take(out, flat_idx, axis=1)     # [Qp, Rp]

    _pool_cache[key] = run
    return run


_span_shard_cache: dict = {}


def _sharded_span_fn(idx: ShardedIndex, buckets, mults, anchor_i, n_terms,
                     slop: int, kind: str, k1: float, b: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("span", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, float(idx.avg_doc_length), buckets, mults,
           anchor_i, n_terms, slop, kind, k1, b)
    fn = _span_shard_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.ops.encoding import LSB_BITS
    from searcharray_tpu.search.spans import _span_impl

    N_shard = idx.max_shard_docs
    blk_bits = idx.blk_bits
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    w = n_terms + slop - 1
    C = -(-w // LSB_BITS)
    T = len(buckets)

    def local(hdr_s, pay_s, doc_lens_s, offs_s, ns_s, idf):
        hdr_s, pay_s = hdr_s[0], pay_s[0]
        doc_lens_s = doc_lens_s[0]
        offs_s, ns_s = offs_s[0], ns_s[0]
        offs = tuple(offs_s[i] for i in range(T))
        ns = tuple(ns_s[i] for i in range(T))
        out = _span_impl(
            hdr_s, pay_s, offs, ns, doc_lens_s, idf, avgdl, 0, 0,
            buckets=buckets, anchor_i=anchor_i, mults=mults, w=w, C=C,
            num_docs=N_shard, windowed=False, kind=kind, k1=k1, b=b,
            blk_bits=blk_bits,
        )
        return out[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None), P("docs", None), P("docs", None),
                  P("docs", None), P("docs", None), P()),
        out_specs=P("docs", None),
    )

    num_real = idx.corpus_size

    @jax.jit
    def run(hdrs, pays, doc_lens, offs, ns, idf):
        out = mapped(hdrs, pays, doc_lens, offs, ns, idf)
        return out.reshape(-1)[:num_real]

    _span_shard_cache[key] = run
    return run


_phrase_shard_cache: dict = {}


def _sharded_phrase_group_fn(idx: ShardedIndex, gkey, Qp: int, kind: str,
                             k1: float, b: float):
    """shard_map program for a phrase/span group: [S, Qp, T] slice specs
    -> f32[Qp, N] scores.  Each chip scatter-expands its local term
    slices into dense block-layout planes and runs the elementwise chain
    / windowed dilation (search/dense.py math) vmapped over its query
    sub-axis; queries are sharded over the mesh's ``queries`` axis, docs
    over ``docs``."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("pgroup", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, float(idx.avg_doc_length), gkey, Qp, kind, k1, b)
    fn = _phrase_shard_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.ops import kernels as K
    from searcharray_tpu.search.dense import (
        phrase_counts_dense_planes,
        span_counts_dense_planes,
    )
    from searcharray_tpu.search.scoring import apply_similarity_device

    T = gkey[1]
    bucket = gkey[-1]
    N_shard = idx.max_shard_docs
    blk_bits = idx.blk_bits
    S_blk = 1 << blk_bits
    NS_shard = N_shard * S_blk
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    if gkey[0] == "phrase":
        _, _, plan_key, pattern, _ = gkey
        plan = [(d, list(idxs)) for d, idxs in plan_key]
        pattern_l = list(pattern)

        def reduce_planes(planes):
            return phrase_counts_dense_planes(planes, pattern_l, plan,
                                              N_shard, S_blk)
    else:  # span
        _, _, anchor_i, w, mults, _ = gkey

        def reduce_planes(planes):
            return span_counts_dense_planes(planes, anchor_i, w, N_shard,
                                            S_blk, mults=mults)

    def local(hdr_s, pay_s, doc_lens_s, offs_q, ns_q, idfs_q):
        hdr_s, pay_s, doc_lens_s = hdr_s[0], pay_s[0], doc_lens_s[0]
        offs_q, ns_q = offs_q[0], ns_q[0]

        def one_query(offs, ns):
            planes = []
            for i in range(T):
                h, p = K.take_term_planes(hdr_s, pay_s, offs[i], ns[i],
                                          bucket=bucket, blk_bits=blk_bits)
                planes.append(
                    jnp.zeros(NS_shard, jnp.uint32).at[h].set(
                        p, mode="drop", unique_indices=True,
                        indices_are_sorted=True))
            return reduce_planes(planes)

        freqs = jax.vmap(one_query)(offs_q, ns_q)  # [Qq, N_shard]
        out = apply_similarity_device(kind, freqs, doc_lens_s[None, :],
                                      idfs_q[:, None], avgdl, k1, b)
        return out[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None), P("docs", None), P("docs", None),
                  P("docs", "queries", None), P("docs", "queries", None),
                  P("queries")),
        out_specs=P("docs", "queries", None),
    )

    num_real = idx.corpus_size

    @jax.jit
    def run(hdrs, pays, doc_lens, offs, ns, idfs):
        out = mapped(hdrs, pays, doc_lens, offs, ns, idfs)
        out = jnp.moveaxis(out, 0, 1)  # [S, Qp, N_shard] -> [Qp, S, N_shard]
        return out.reshape(out.shape[0], -1)[:, :num_real]

    _phrase_shard_cache[key] = run
    return run


def _sharded_phrase_fn(idx: ShardedIndex, buckets, tids_key, split,
                       kind: str, k1: float, b: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = ("phrase", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, float(idx.avg_doc_length), buckets, tids_key,
           split, kind, k1, b)
    fn = _phrase_shard_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.ops import kernels as K
    from searcharray_tpu.search.phrase import _chain_planes, _plan
    from searcharray_tpu.search.scoring import apply_similarity_device

    N_shard = idx.max_shard_docs
    blk_bits = idx.blk_bits
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    T = len(buckets)

    def local(hdr_s, pay_s, doc_lens_s, offs_s, ns_s, idf):
        hdr_s, pay_s = hdr_s[0], pay_s[0]
        doc_lens_s = doc_lens_s[0]
        offs_s, ns_s = offs_s[0], ns_s[0]
        planes = [
            K.take_term_planes(hdr_s, pay_s, offs_s[i], ns_s[i],
                               bucket=buckets[i], blk_bits=blk_bits)
            for i in range(T)
        ]
        denses = []
        for direction, idxs in _plan(T, split):
            denses += _chain_planes(
                [planes[i] for i in idxs], [tids_key[i] for i in idxs],
                direction, N_shard, blk_bits,
            )
        freqs = denses[0]
        for d in denses[1:]:
            freqs = jnp.minimum(freqs, d)
        out = apply_similarity_device(kind, freqs, doc_lens_s, idf, avgdl,
                                      k1, b)
        return out[None]

    mapped = jax.shard_map(
        local,
        mesh=idx.mesh,
        in_specs=(P("docs", None), P("docs", None), P("docs", None),
                  P("docs", None), P("docs", None), P()),
        out_specs=P("docs", None),
    )

    num_real = idx.corpus_size

    @jax.jit
    def run(hdrs, pays, doc_lens, offs, ns, idf):
        out = mapped(hdrs, pays, doc_lens, offs, ns, idf)
        return out.reshape(-1)[:num_real]

    _phrase_shard_cache[key] = run
    return run


_score_cache: dict = {}


def _sharded_score(idx: ShardedIndex, tids_np: np.ndarray, bucket: int,
                   k1: float, b: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # structural key (id() could collide after GC and reuse a kernel
    # whose closure baked different corpus constants)
    key = ("score", idx.corpus_size, idx.max_shard_docs, idx.blk_bits,
           idx.num_shards, float(idx.avg_doc_length), tids_np.shape, bucket,
           k1, b)
    fn = _score_cache.get(key)
    if fn is None:
        fn = _build_sharded_score(idx, tids_np.shape[1], bucket, k1, b)
        _score_cache[key] = fn
    tids = jax.device_put(
        tids_np, NamedSharding(idx.mesh, P("queries", None))
    )
    return fn(idx.hdrs, idx.pays, idx.offsets, idx.lengths, idx.doc_lens, tids)


def _build_sharded_term_scores(idx: ShardedIndex, bucket: int, kind: str,
                               k1: float, b: float):
    """One term per query, host-side idf, any builtin similarity — the
    building block the sharded edismax composition scores fields with."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from searcharray_tpu.search.scoring import apply_similarity_device

    N_shard = idx.max_shard_docs
    avgdl = np.float32(max(idx.avg_doc_length, 1e-38))
    blk_bits = idx.blk_bits
    mesh = idx.mesh

    def local(hdr_s, pay_s, off_s, len_s, doc_lens_s, tids_q, idfs_q):
        hdr_s, pay_s = hdr_s[0], pay_s[0]
        off_s, len_s, doc_lens_s = off_s[0], len_s[0], doc_lens_s[0]

        def one_query(tid, idf):
            hit = tid >= 0
            tid_c = jnp.maximum(tid, 0)
            off = off_s[tid_c]
            n = len_s[tid_c] * hit
            h = jax.lax.dynamic_slice(hdr_s, (off,), (bucket,))
            p = jax.lax.dynamic_slice(pay_s, (off,), (bucket,))
            valid = jnp.arange(bucket, dtype=jnp.int32) < n
            h = jnp.where(valid, h, jnp.int32(PAD_HDR32))
            p = jnp.where(valid, p, jnp.uint32(0))
            keys = (h >> jnp.int32(blk_bits)).astype(jnp.int32)
            pops = jax.lax.population_count(p).astype(jnp.float32)
            tf = jnp.zeros(N_shard, jnp.float32).at[keys].add(pops,
                                                              mode="drop")
            s = apply_similarity_device(kind, tf, doc_lens_s, idf, avgdl,
                                        k1, b)
            return jnp.where(hit, s, 0.0)

        return jax.vmap(one_query)(tids_q, idfs_q)[None]

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("docs", None), P("docs", None), P("docs", None),
                  P("docs", None), P("docs", None), P("queries"),
                  P("queries")),
        out_specs=P("docs", "queries", None),
    )

    num_real_docs = idx.corpus_size

    @jax.jit
    def run(hdrs, pays, offsets, lengths, doc_lens, tids, idfs):
        out = mapped(hdrs, pays, offsets, lengths, doc_lens, tids, idfs)
        out = jnp.moveaxis(out, 0, 1)  # [S, Q, N_shard] -> [Q, S, N_shard]
        return out.reshape(out.shape[0], -1)[:, :num_real_docs]

    return run


def _build_sharded_score(idx: ShardedIndex, T: int, bucket: int,
                         k1: float, b: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    N_shard = idx.max_shard_docs
    avgdl = np.float32(idx.avg_doc_length)
    num_docs = np.float32(idx.corpus_size)
    mesh = idx.mesh

    blk_bits = idx.blk_bits

    def term_tf_df(hdr_s, pay_s, off, n, doc_lens_s):
        h = jax.lax.dynamic_slice(hdr_s, (off,), (bucket,))
        p = jax.lax.dynamic_slice(pay_s, (off,), (bucket,))
        valid = jnp.arange(bucket, dtype=jnp.int32) < n
        h = jnp.where(valid, h, jnp.int32(PAD_HDR32))
        p = jnp.where(valid, p, jnp.uint32(0))
        keys = (h >> jnp.int32(blk_bits)).astype(jnp.int32)
        pops = jax.lax.population_count(p).astype(jnp.float32)
        tf = jnp.zeros(N_shard, jnp.float32).at[keys].add(pops, mode="drop")
        prev = jnp.concatenate([keys[:1] - 1, keys[:-1]])
        df = jnp.sum((valid & (keys != prev)).astype(jnp.float32))
        return tf, df

    def local(hdr_s, pay_s, off_s, len_s, doc_lens_s, tids_q):
        hdr_s, pay_s = hdr_s[0], pay_s[0]
        off_s, len_s, doc_lens_s = off_s[0], len_s[0], doc_lens_s[0]

        def one_query(tids):
            def one_term(tid):
                hit = tid >= 0
                tid_c = jnp.maximum(tid, 0)
                tf, df_local = term_tf_df(
                    hdr_s, pay_s, off_s[tid_c], len_s[tid_c] * hit, doc_lens_s
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
                  P("docs", None), P("docs", None), P("queries", None)),
        out_specs=P("docs", "queries", None),
    )

    num_real_docs = idx.corpus_size

    @jax.jit
    def run(hdrs, pays, offsets, lengths, doc_lens, tids):
        out = mapped(hdrs, pays, offsets, lengths, doc_lens, tids)
        out = jnp.moveaxis(out, 0, 1)  # [S, Q, N_shard] -> [Q, S, N_shard]
        return out.reshape(out.shape[0], -1)[:, :num_real_docs]

    return run
