"""Candidate-subset scoring: O(df) work per query instead of O(corpus).

At huge-corpus scales the dense engine's full planes stop paying: a
term's payload plane at 8.8M docs is ~281 MB, so a phrase query streams
``T x 281 MB`` of HBM and only one query fits a program (round-2 VERDICT:
49 qps, ~10x off roofline).  But a phrase can only match documents that
contain its rarest term, and a term query only its own documents — the
per-doc score everywhere else is exactly zero (the chain's min includes
the rarest term's step).  This is the dense-engine generalization of the
reference's ``trim_phrase_search`` (`/root/reference/searcharray/phrase/
middle_out.py:44-70`) and of its "phrase phases only on matched rows"
contract (`/root/reference/searcharray/solr.py:328-338`).

So: derive the **candidate doc rows** on device from the rarest term's
posting slice (sorted doc keys -> run-compaction into a static ``Kc``
buffer; ``Kc`` = padded docfreq, known on host), then build each term's
**mini-plane** ``u32[Kc * S]`` — the candidate docs' block rows only —
and run the ordinary dense chain / similarity on it:

* big terms ("pool" source): gather ``Kc x S`` flat slots out of the
  term's pooled full plane — one clustered-gather round, ~32 B runs;
* small terms ("mini" source, <= MINI_MAX_WORDS posting words): skip the
  pool entirely — align the slice's doc keys to the [Kc] candidate row
  table (one-gather imap alignment for big buckets, ``searchsorted``
  for tiny ones; see ALIGN_IMAP_FRAC) and scatter the payloads
  in-program.  Rare terms never touch the plane pool, so the pool holds
  only the hot stopword planes and serving stops thrashing.

Everything is static-shape: candidate buffers pad with a sentinel row
(``corpus_size``), masked out of scores; top-k runs over the Kc axis and
maps indices back through the row table on device, so the packed
[Q, 2k] wire format is identical to the full-corpus groups.

Known tie-region divergence: queries matching fewer than k docs fill the
top-k tail with an arbitrary *zero-score* document (the full-corpus
engine fills with the smallest-index docs, also zero-score).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K

# Candidate scoring turns on only where it wins: big corpora (full planes
# / tf rows >= ~4 MB of traffic per query) and selective queries (padded
# candidate count at most corpus/CAND_MAX_FRAC).  Tests force it on tiny
# corpora by patching CAND_MIN_DOCS.
CAND_MIN_DOCS = 1 << 19
# Single-term candidate scoring turns on earlier: a rare term's cterm
# program skips the tf-pool fill a cold term otherwise pays per batch
# (the serving tail cycles terms faster than any pool retains them), and
# cterm classes are just the 4-ish posting buckets — stable enough to
# stay fused in the batch super-program without churning its key.
CAND_TERM_MIN_DOCS = 1 << 16
CAND_MAX_FRAC = 8
MINI_MAX_WORDS = 1 << 18  # mini-source ceiling (bucketed words)
# Pool-source mini gathers cost ~24 ns per gathered element on v5e
# (Kc=1M x 8 slots ~ 204 ms; scripts/profile_ops_88m.py) while a dense
# pool fill is a ~25 ms flat scatter + streaming dilation, so a
# mid-frequency anchor with stopword co-terms is far cheaper on the
# dense engine: queries whose srcs include "pool" stay candidates only
# up to this Kc (break-even ~160k; the pow-4 ladder puts the cut here).
CAND_POOL_MAX_KC = 1 << 16

# Mini-plane alignment strategy.  ``searchsorted`` into the [Kc] row
# table costs log2(Kc) dependent-gather rounds per posting word — the
# pattern this repo measured at ~20-30 ns/element/round.  Above a few
# thousand words per query it is ~4-8x cheaper (measured on v5e:
# 793 -> 104 ms for a [64, 65536] spec) to scatter the candidate rows
# once into a doc->candidate-index map ``int32[N]`` and align every
# mini term with ONE gather round.  The imap costs an N-word sequential
# init per query, so small-bucket queries keep searchsorted; the choice
# is static per group key (srcs ship in the gkey).
ALIGN_IMAP_FRAC = 256     # imap when sum(mini buckets) >= N / this
IMAP_BYTES_CAP = 1 << 30  # bound on a program's [Qp, N] imap temps


def use_imap(num_docs: int, srcs) -> bool:
    mini = sum(x for x in srcs if x != "pool")
    return mini >= max(1, num_docs // ALIGN_IMAP_FRAC)


def kc_bucket(dev: DeviceIndex, tid: int) -> int:
    """Candidate-row buffer size for a rows-source term: its coarse
    posting bucket (>= its docfreq, so compaction always fits).  Using
    the SAME pow-4 bucket for Kc and the slice collapses the
    (slice bucket x candidate bucket) compile matrix to one class per
    bucket — serving batches then reuse a handful of programs forever
    instead of minting one per docfreq granularity."""
    return K.expand_bucket_of(max(1, dev.term_span(tid)[1]))


_QP_LADDER = (1, 4, 16, 32, 64)


def class_qp(dev: DeviceIndex, Kc: int, srcs=None) -> int:
    """Max query-axis width for a candidate class.  Chunks pad to the
    smallest _QP_LADDER width that fits (qp_pad), so a class compiles at
    most len(_QP_LADDER) programs ever while big groups still run as one
    wide dispatch — on the tunneled TPU each extra program costs ~6-9 ms,
    far above the padded rows' compute.  The width is bounded so one
    program's gathered mini-planes stay ~tens of MB (and, for
    imap-aligned groups, its [Qp, N] index-map temps under
    IMAP_BYTES_CAP)."""
    S = 1 << dev.blk_bits
    cap = max(1, (1 << 25) // max(1, Kc * S))
    if srcs is not None and use_imap(dev.corpus_size, srcs):
        cap = min(cap, max(1, IMAP_BYTES_CAP // (4 * dev.corpus_size)))
    w = 1
    for x in _QP_LADDER:
        if x <= cap:
            w = x
    return w


def qp_pad(q: int, width: int) -> int:
    """Smallest ladder width >= q (clamped to the class width)."""
    for x in _QP_LADDER:
        if x >= q:
            return min(x, width)
    return width


def rows_source(dev: DeviceIndex, tids: Sequence[int]) -> int:
    """The term whose docs become the candidate rows: any query term's
    doc set is sound (the final score is zero outside every term's docs);
    pick the FIRST term with the smallest candidate buffer.  No docfreq
    tie-break: within one Kc bucket every choice costs the same program,
    and the tie-break only churned the rarest_i in the group class key —
    a fresh ~6-9 ms dispatch per tie permutation a serving tail saw."""
    return min(tids, key=lambda t: kc_bucket(dev, t))


def term_source(dev: DeviceIndex, n_words: int):
    """Per-term mini-plane source: coarse posting bucket for the
    in-program alignment, or "pool" for stopword-sized terms (gathered
    from their pooled full plane)."""
    b = K.expand_bucket_of(max(1, n_words))
    return "pool" if b > MINI_MAX_WORDS else b


def query_sources(dev: DeviceIndex, lens: Sequence[int]) -> tuple:
    """Collapsed per-term sources for one candidate query.

    Every mini-source term pads to the query's LARGEST mini bucket: the
    srcs tuple sits in the group key, so per-term granularity minted one
    compile class per docfreq combination — a live rare-term tail then
    launches (and at 8.8M-doc shapes, compiles) a fresh program per
    batch.  Collapsing costs only padded slice words (bounded by
    MINI_MAX_WORDS) and leaves one class per (pool pattern, max bucket).
    """
    raw = [term_source(dev, n) for n in lens]
    mini_max = max((s for s in raw if s != "pool"), default=0)
    return tuple("pool" if s == "pool" else mini_max for s in raw)


def eligible_term(dev: DeviceIndex, tid: int, top_k: Optional[int]) -> bool:
    N = dev.corpus_size
    if N < CAND_TERM_MIN_DOCS:
        return False
    kc = kc_bucket(dev, tid)
    if top_k is not None and top_k > kc:
        return False
    return kc * CAND_MAX_FRAC <= N


def eligible_phrase(dev: DeviceIndex, tids: Sequence[int],
                    top_k: Optional[int]) -> bool:
    from searcharray_tpu.search import dense

    N = dev.corpus_size
    if N < CAND_MIN_DOCS:
        return False
    rarest = rows_source(dev, tids)
    kc = kc_bucket(dev, rarest)
    if top_k is not None and top_k > kc:
        return False
    if kc * CAND_MAX_FRAC > N:
        return False
    # pool-source terms still need pooled planes (and the pool must fit
    # them); mini-source terms need nothing
    if not dense.dense_eligible(dev):
        return all(term_source(dev, dev.term_span(t)[1]) != "pool"
                   for t in set(tids))
    pool_terms = {t for t in tids
                  if term_source(dev, dev.term_span(t)[1]) == "pool"}
    if pool_terms and kc > CAND_POOL_MAX_KC:
        # mid-frequency anchor + stopword co-terms: the Kc x S pool
        # gathers dominate (~24 ns/element); the dense engine's pool
        # fill + full-plane streaming chain is ~5-10x cheaper there
        return False
    return len(pool_terms) <= dense.plane_capacity(dev) - 1


# ---------------------------------------------------------------------------
# traced bodies (single query; callers vmap over the batch)
# ---------------------------------------------------------------------------
def _compact_rows(keys, valid_word, Kc: int, num_docs: int):
    """Sorted doc keys [B] -> (rows int32[Kc] sentinel-padded sorted,
    cand_idx int32[B] candidate index per word, n_valid)."""
    import jax.numpy as jnp

    first = jnp.concatenate(
        [jnp.ones((1,), bool), keys[1:] != keys[:-1]]) & valid_word
    cidx = jnp.cumsum(first.astype(jnp.int32)) - 1
    rows = jnp.full(Kc, num_docs, jnp.int32).at[
        jnp.where(valid_word, cidx, Kc)
    ].set(keys, mode="drop", indices_are_sorted=True)
    return rows, cidx, first.sum().astype(jnp.int32)


def _slice_keys(dev_static, hdrs, pays, off, n, bucket: int):
    import jax.numpy as jnp

    blk_bits = dev_static["blk_bits"]
    h, p = K.take_term_planes(hdrs, pays, off, n, bucket=bucket,
                              blk_bits=blk_bits)
    keys = (h >> jnp.int32(blk_bits)).astype(jnp.int32)
    valid = h != jnp.int32(K.PAD_HDR32)
    blks = h & jnp.int32((1 << blk_bits) - 1)
    return keys, blks, p, valid


def cterm_body(dev_static, Kc: int, bucket: int, hdrs, pays, off, n):
    """One term query: (tf float32[Kc], rows int32[Kc])."""
    import jax.numpy as jnp

    from searcharray_tpu.search.dense import _popcount_f32

    keys, _blks, p, valid = _slice_keys(dev_static, hdrs, pays, off, n,
                                        bucket)
    rows, cidx, _nv = _compact_rows(keys, valid, Kc, dev_static["N"])
    tf = jnp.zeros(Kc, jnp.float32).at[
        jnp.where(valid, cidx, Kc)
    ].add(_popcount_f32(p), mode="drop", indices_are_sorted=True)
    return tf, rows


def candidate_minis(dev_static, T: int, srcs, Kc: int, rarest_bucket: int,
                    hdrs, pays, pool, r_off, r_n, m_offs, m_ns, slots):
    """Build the candidate row table and per-term mini-planes.

    ``srcs[i]`` is "pool" (gather Kc*S slots from the pooled plane at
    ``slots[j]``) or a mini bucket (searchsorted-align the raw slice at
    ``m_offs[j]/m_ns[j]``).  j indexes within each source kind in term
    order.  Returns (minis list of u32[Kc*S], rows int32[Kc])."""
    r_keys, _b, _p, r_valid = _slice_keys(dev_static, hdrs, pays, r_off,
                                          r_n, rarest_bucket)
    rows, _cidx, _nv = _compact_rows(r_keys, r_valid, Kc, dev_static["N"])
    minis = minis_for_rows(dev_static, T, srcs, Kc, rows, hdrs, pays, pool,
                           m_offs, m_ns, slots)
    return minis, rows


def minis_for_rows(dev_static, T: int, srcs, Kc: int, rows, hdrs, pays,
                   pool, m_offs, m_ns, slots):
    """Per-term mini-planes over an EXTERNAL candidate row table.

    ``rows`` is int32[Kc], sorted ascending, sentinel-padded with the
    corpus size.  This is the shared second half of candidate_minis,
    also used by the sharded rows= path (edismax phase pruning): the
    caller supplies the rows (e.g. the main query's matched docs on this
    shard) instead of compacting them from the rarest term's slice."""
    import jax.numpy as jnp

    N = dev_static["N"]
    blk_bits = dev_static["blk_bits"]
    S = 1 << blk_bits

    rows_clip = jnp.clip(rows, 0, N - 1)

    imap = None
    if use_imap(N, srcs):
        # one scatter builds doc -> candidate index; every mini term then
        # aligns with a single gather round instead of log2(Kc) rounds
        # (sentinel rows == N drop out of the scatter)
        imap = jnp.full(N, jnp.int32(-1)).at[rows].set(
            jnp.arange(Kc, dtype=jnp.int32), mode="drop",
            indices_are_sorted=True)

    minis = []
    jp = jm = 0
    for i in range(T):
        if srcs[i] == "pool":
            # ONE scalar gather from the 2D pool: indexing pool[slot]
            # first is a dynamic-slice that vmap turns into a [Qp, NS]
            # gather — Qp x 283 MB of pure copy at 8.8M docs (~40 ms per
            # pool term; measured round 5) before the tiny Kc*S mini
            # gather.  pool.reshape(-1) is no better: the 2D tiled
            # layout makes the flatten a full pool relayout (~2.8 GB).
            # Advanced indexing [slot, flat] gathers the Kc*S elements
            # without materializing either.  Large-Kc pool gathers still
            # pay ~24 ns/element, so routing keeps pool-pattern queries
            # out of the candidate engine above CAND_POOL_MAX_KC.
            flat = (rows_clip[:, None] * jnp.int32(S)
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
            minis.append(pool[slots[jp], flat])
            jp += 1
        else:
            bkt = srcs[i]
            keys_i, blks_i, p_i, valid_i = _slice_keys(
                dev_static, hdrs, pays, m_offs[jm], m_ns[jm], bkt)
            if imap is not None:
                ci_c = jnp.take(imap, jnp.clip(keys_i, 0, N - 1))
                hit = valid_i & (ci_c >= 0)
                ci_c = jnp.clip(ci_c, 0, Kc - 1)
            else:
                ci = jnp.searchsorted(rows, keys_i).astype(jnp.int32)
                ci_c = jnp.clip(ci, 0, Kc - 1)
                hit = valid_i & (jnp.take(rows, ci_c) == keys_i)
            # miss sentinels (Kc*S) are interleaved with hits, so indices
            # are NOT sorted here — no indices_are_sorted hint
            sidx = jnp.where(hit, ci_c * jnp.int32(S) + blks_i,
                             jnp.int32(Kc * S))
            minis.append(
                jnp.zeros(Kc * S, jnp.uint32).at[sidx].set(
                    p_i, mode="drop"))
            jm += 1
    return minis


def cphrase_body(dev_static, T: int, plan_key, pattern, srcs, Kc: int,
                 rarest_bucket: int, hdrs, pays, pool, r_off, r_n,
                 m_offs, m_ns, slots):
    """One phrase query: (freqs float32[Kc], rows int32[Kc])."""
    from searcharray_tpu.search.dense import phrase_counts_dense_planes

    S = 1 << dev_static["blk_bits"]
    minis, rows = candidate_minis(dev_static, T, srcs, Kc, rarest_bucket,
                                  hdrs, pays, pool, r_off, r_n, m_offs,
                                  m_ns, slots)
    plan = [(d, list(idxs)) for d, idxs in plan_key]
    freqs = phrase_counts_dense_planes(minis, list(pattern), plan, Kc, S)
    return freqs, rows


def cspan_body(dev_static, T: int, anchor_i: int, w: int, mults, srcs,
               Kc: int, rarest_bucket: int, hdrs, pays, pool, r_off, r_n,
               m_offs, m_ns, slots):
    """One slop query over candidate rows: (freqs f32[Kc], rows i32[Kc]).

    Rows come from the lowest-docfreq term; the anchor (counted) term is
    the shortest-postings one, matching spans._span_impl.  Sound because
    every doc with a nonzero span count contains all query terms."""
    from searcharray_tpu.search.dense import span_counts_dense_planes

    S = 1 << dev_static["blk_bits"]
    minis, rows = candidate_minis(dev_static, T, srcs, Kc, rarest_bucket,
                                  hdrs, pays, pool, r_off, r_n, m_offs,
                                  m_ns, slots)
    freqs = span_counts_dense_planes(minis, anchor_i, w, Kc, S,
                                     mults=mults)
    return freqs, rows


def finish_candidates(freqs, rows, doc_lens, idfs, avgdl, kind, k1, b,
                      top_k: Optional[int], N: int, Npad: int):
    """[Qg, Kc] freqs + candidate rows -> packed top-k (real doc ids) or
    dense [Qg, Npad] scores."""
    import jax
    import jax.numpy as jnp

    from searcharray_tpu.search.scoring import apply_similarity_device

    Qg, Kc = freqs.shape
    valid = rows < jnp.int32(N)
    rows_clip = jnp.clip(rows, 0, N - 1)
    dl = jnp.take(doc_lens, rows_clip, mode="clip")
    scores = apply_similarity_device(kind, freqs, dl, idfs[:, None], avgdl,
                                     k1, b)
    scores = jnp.where(valid, scores, np.float32(0.0))
    if top_k is None:
        offs = (jnp.arange(Qg, dtype=jnp.int32) * jnp.int32(Npad))[:, None]
        flat = jnp.where(valid, rows_clip + offs, jnp.int32(Qg * Npad))
        return jnp.zeros(Qg * Npad, jnp.float32).at[flat.reshape(-1)].add(
            scores.reshape(-1), mode="drop").reshape(Qg, Npad)
    # top-k over the candidate axis, indices mapped back to doc ids; pad
    # slots map to a guaranteed zero-score (non-candidate) doc
    k = top_k
    n_valid = valid.sum(axis=1)
    cand_max = jnp.max(jnp.where(valid, rows, -1), axis=1)
    fallback = jnp.where(cand_max < N - 1, cand_max + 1,
                         jnp.maximum(rows[:, 0] - 1, 0))
    rows_m = jnp.where(valid, rows, fallback[:, None])
    masked = jnp.where(valid, scores, np.float32(-1.0))
    # two-stage exact top-k: lax.top_k over a wide Kc row is one
    # sequential sort (measured 2.3x slower at Kc=65536 on v5e)
    from searcharray_tpu.ops.kernels import topk_exact

    v, i = topk_exact(masked, k)
    real = jnp.take_along_axis(rows_m, i, axis=1)
    v = jnp.maximum(v, np.float32(0.0))
    del n_valid
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(v, jnp.int32), real], axis=1)
