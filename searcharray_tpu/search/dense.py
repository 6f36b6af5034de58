"""Dense block-layout phrase/term engine: the TPU speed-of-light path.

The sort-merge chain (search/phrase.py) re-sorts posting buckets per query
— for stopword phrases that is ~5-8 ms of `lax.sort` per query, four
orders of magnitude above the HBM traffic a query actually needs.  The
roaringish header is already a dense address: ``hdr = doc << blk_bits |
block``.  Expanding a term's payload plane into ``u32[N << blk_bits]``
(one scatter-set, cached in HBM for hot terms) makes every phrase-chain
operation **positionally aligned**:

* inner bigram matches:   ``L & (R >> 1)``                (same slot)
* cross-block adjacency:  ``(L[s-1] >> 17) & (R[s] & 1)`` (slot shift)
* continuations:          in-place payload updates        (same slot)
* term freqs:             ``popcount(D).reshape(N, S).sum(-1)``

— all elementwise VPU streams over ~(N*S*4)-byte operands, no sorts, no
gathers, no scatters.  Queries of the same length share one program shape
regardless of posting sizes, so batching is a plain leading vmap axis.

Semantics are pinned to the sort-merge chain (same formulas as
`phrase._merge_step` / `_same_term_step`, themselves pinned to the
reference's bigram_freqs at `/root/reference/searcharray/phrase/
bigram_freqs.py:104-188`); tests/test_dense.py asserts bit-for-bit parity
against it, and via it against the reference scenario tables.

Memory policy: a term plane costs ``(N << blk_bits) * 4`` bytes.  Hot
terms (>= CACHE_MIN_WORDS postings) are cached with LRU eviction under
``DENSE_CACHE_BYTES``; cold terms expand transiently inside the query
program (scatter cost proportional to their small posting size).  When a
single plane would exceed ``DENSE_TERM_BYTES_LIMIT`` (huge corpora /
pathological doc lengths) the engine reports ineligible and callers fall
back to the sort-merge chain.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS, LSB_MASK

_TOP = LSB_BITS - 1          # bit index of "last position in block"
_LSB32 = int(LSB_MASK)

CACHE_MIN_WORDS = 1          # LRU budget (not a threshold) bounds the cache
DENSE_CACHE_BYTES = 4 << 30  # total HBM budget for cached planes
DENSE_TERM_BYTES_LIMIT = 1 << 29  # per-plane ceiling; beyond -> ineligible

_jit_cache: dict = {}


def plane_slots(dev: DeviceIndex) -> int:
    return 1 << dev.blk_bits


def plane_size(dev: DeviceIndex) -> int:
    return dev.corpus_size << dev.blk_bits


def dense_eligible(dev: DeviceIndex) -> bool:
    return 0 < plane_size(dev) * 4 <= DENSE_TERM_BYTES_LIMIT


def _expand_fn(dev: DeviceIndex, bucket: int):
    """jit: CSR slice -> dense u32[N*S] payload plane (scatter-set;
    headers are unique and sorted, PAD sorts above the plane and drops)."""
    import jax

    key = ("expand", dev.corpus_size, dev.blk_bits, bucket)
    fn = _jit_cache.get(key)
    if fn is None:
        NS = plane_size(dev)
        blk_bits = dev.blk_bits

        def f(hdrs, pays, off, n):
            import jax.numpy as jnp

            h, p = K.take_term_planes(hdrs, pays, off, n, bucket=bucket,
                                      blk_bits=blk_bits)
            return jnp.zeros(NS, jnp.uint32).at[h].set(
                p, mode="drop", unique_indices=True, indices_are_sorted=True)

        fn = jax.jit(f)
        _jit_cache[key] = fn
    return fn


def expand_term(dev: DeviceIndex, term_id: int):
    """Dense payload plane for a term; LRU-cached in HBM."""
    cache = dev.dense_cache
    arr = cache.get(term_id)
    if arr is not None:
        cache.move_to_end(term_id)
        return arr
    off, n, _ = dev.term_span(term_id)
    arr = _expand_fn(dev, K.expand_bucket_of(n))(dev.hdrs, dev.pays, off, n)
    if n >= CACHE_MIN_WORDS:
        per = plane_size(dev) * 4
        budget = max(per, DENSE_CACHE_BYTES)
        while cache and (len(cache) + 1) * per > budget:
            cache.popitem(last=False)
        cache[term_id] = arr
    return arr


# ---------------------------------------------------------------------------
# chain math (slot-aligned mirrors of phrase._merge_step/_same_term_step)
# ---------------------------------------------------------------------------
def _shift_up(a):
    """a[s] -> a[s-1] (previous slot; zero fill)."""
    import jax.numpy as jnp

    return jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., :-1]], -1)


def _shift_down(a):
    """a[s] -> a[s+1] (next slot; zero fill)."""
    import jax.numpy as jnp

    return jnp.concatenate([a[..., 1:], jnp.zeros_like(a[..., :1])], -1)


def _popcount_f32(x):
    import jax

    return jax.lax.population_count(x).astype(jax.numpy.int32).astype(
        jax.numpy.float32)


def _same_counts_dense(p):
    """Same-term adjusted counts per slot (phrase._same_term_counts)."""
    import jax
    import jax.numpy as jnp

    lsb = jnp.uint32(_LSB32)
    overlap = p & ((p << 1) & lsb)
    adj = jax.lax.population_count(overlap).astype(jnp.int32)
    consec = jax.lax.population_count(overlap & (overlap << 1) & lsb).astype(
        jnp.int32)
    adjusted = adj - (-(consec // jnp.int32(-2)))
    return adjusted.astype(jnp.float32), overlap


def _dense_chain(planes: List, pattern: List[int], direction: str):
    """Bigram chain over dense planes ([..., NS] each); returns per-slot
    count arrays (one per step) and nothing else — the caller reduces
    slots to docs.  ``pattern`` are same-term equivalence tags."""
    import jax.numpy as jnp

    lsb = jnp.uint32(_LSB32)
    steps = []
    carry = None
    if direction == "l2r":
        for i in range(1, len(planes)):
            R = planes[i]
            if carry is None and pattern[i] == pattern[i - 1]:
                counts, overlap = _same_counts_dense(R)
                adj = ((_shift_up(R) >> np.uint32(_TOP)) & R & 1).astype(
                    jnp.float32)
                counts = counts + adj
                cont = overlap | ((_shift_up(R) >> np.uint32(_TOP)) & R
                                  & jnp.uint32(1))
            else:
                L = planes[i - 1] if carry is None else carry
                inner = L & (R >> 1)
                adj_m = (_shift_up(L) >> np.uint32(_TOP)) & R & jnp.uint32(1)
                counts = _popcount_f32(inner) + adj_m.astype(jnp.float32)
                cont = ((inner << 1) & lsb) | adj_m
            steps.append(counts)
            carry = cont
    else:
        for i in range(len(planes) - 2, -1, -1):
            L = planes[i]
            if carry is None and pattern[i] == pattern[i + 1]:
                counts, _ = _same_counts_dense(L)
                adj_m = ((L >> np.uint32(_TOP)) & _shift_down(L)
                         & jnp.uint32(1))
                counts = counts + adj_m.astype(jnp.float32)
                cont = (L & (L >> 1)) | jnp.where(
                    adj_m > 0, jnp.uint32(1 << _TOP), jnp.uint32(0))
            else:
                R = planes[i + 1] if carry is None else carry
                overlap = L & (R >> 1)
                adj_m = ((L >> np.uint32(_TOP)) & _shift_down(R)
                         & jnp.uint32(1))
                counts = _popcount_f32(overlap) + adj_m.astype(jnp.float32)
                cont = overlap | jnp.where(
                    adj_m > 0, jnp.uint32(1 << _TOP), jnp.uint32(0))
            steps.append(counts)
            carry = cont
    return steps


def phrase_counts_dense_planes(planes, pattern, plan, num_docs: int,
                               slots: int):
    """Min-over-steps per-doc phrase freqs from dense planes ([..., NS])."""
    import jax.numpy as jnp

    freqs = None
    for direction, idxs in plan:
        sub = [planes[i] for i in idxs]
        tags = [pattern[i] for i in idxs]
        for counts in _dense_chain(sub, tags, direction):
            per_doc = counts.reshape(counts.shape[:-1] + (num_docs, slots)
                                     ).sum(-1)
            freqs = per_doc if freqs is None else jnp.minimum(freqs, per_doc)
    return freqs


# ---------------------------------------------------------------------------
# slop spans on dense planes (mults == 1, window <= one block)
# ---------------------------------------------------------------------------
def _shift_posns_down(x, k: int):
    """y(p) = x(p + k), 1 <= k <= LSB_BITS (pulls from the next slot)."""
    import jax.numpy as jnp

    nxt = _shift_down(x)
    if k == LSB_BITS:
        return nxt
    lsb = jnp.uint32(_LSB32)
    return ((x >> k) | (nxt << (LSB_BITS - k))) & lsb


def _shift_posns_up(x, k: int):
    """y(p) = x(p - k), 1 <= k <= LSB_BITS (pulls from the previous slot;
    slot 0 pulls the previous doc's empty spare slot, so docs never leak)."""
    import jax.numpy as jnp

    prv = _shift_up(x)
    if k == LSB_BITS:
        return prv
    lsb = jnp.uint32(_LSB32)
    return ((x << k) | (prv >> (LSB_BITS - k))) & lsb


def _dilate(x, length: int, shifter):
    """OR of ``x`` shifted by every offset in [0, length) — log-step."""
    y = x
    cur = 1
    while cur < length:
        k = min(cur, length - cur)
        y = y | shifter(y, k)
        cur += k
    return y


def span_counts_dense_planes(planes, anchor_i: int, w: int, num_docs: int,
                             slots: int):
    """Per-doc slop span counts on dense planes ([..., NS] each).

    Same semantics as spans._span_impl with all multiplicities 1: anchor
    position p (rarest term) is covered iff some window [s, s+w] with
    s <= p <= s+w contains a bit of every term.  ok(s) = AND of per-term
    window presence (dilation down over [0, w]); covered(p) = OR of ok
    over [p-w, p] (dilation up); counts = per-doc popcount of covered
    anchors.  Valid for w <= LSB_BITS (shift never crosses two slots)."""
    ok = None
    for pl in planes:
        present = _dilate(pl, w + 1, _shift_posns_down)
        ok = present if ok is None else ok & present
    covered = _dilate(ok, w + 1, _shift_posns_up)
    anchored = planes[anchor_i] & covered
    counts = _popcount_f32(anchored)
    return counts.reshape(counts.shape[:-1] + (num_docs, slots)).sum(-1)


def score_span_dense(dev: DeviceIndex, uniq_tids: List[int], anchor_i: int,
                     w: int, kind: str, k1: float, b: float, idf):
    """Single-query dense slop scoring (one dispatch after expansions)."""
    import jax

    T = len(uniq_tids)
    key = ("dspan1", dev.corpus_size, dev.blk_bits, T, anchor_i, w, kind,
           k1, b)
    fn = _jit_cache.get(key)
    if fn is None:
        from searcharray_tpu.search.scoring import apply_similarity_device

        N = dev.corpus_size
        S = plane_slots(dev)

        def f(doc_lens, idf_, avgdl, *planes):
            freqs = span_counts_dense_planes(list(planes), anchor_i, w, N, S)
            return apply_similarity_device(kind, freqs, doc_lens, idf_,
                                           avgdl, k1, b)

        fn = jax.jit(f)
        _jit_cache[key] = fn
    seen = {}
    for t in uniq_tids:
        if t not in seen:
            seen[t] = expand_term(dev, t)
    planes = [seen[t] for t in uniq_tids]
    avgdl = np.float32(max(dev.avg_doc_length, 1e-38))
    return fn(dev.doc_lens, np.float32(idf), avgdl, *planes)


def pack_topk(dense, k: int):
    """[..., N] -> int32 [..., 2k]: f32 score bits ‖ int32 doc indices —
    one packed array so a whole batch crosses the tunnel in one transfer."""
    import jax
    import jax.numpy as jnp

    scores, idx = jax.lax.top_k(dense, k)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(scores, jnp.int32),
         idx.astype(jnp.int32)], axis=-1)


# ---------------------------------------------------------------------------
# jitted entry points (batched group + single query)
# ---------------------------------------------------------------------------
def phrase_group_fn(dev: DeviceIndex, T: int, plan_key: tuple,
                    pattern: tuple, kind: str, k1: float, b: float,
                    top_k: Optional[int]):
    """jit: (dstack u32[Qg, T, NS], doc_lens, idfs[Qg]) -> scores.

    No vmap needed: every chain op broadcasts over the leading query axis.
    Qg is not part of the cache key — XLA recompiles per Qg shape, but the
    program is shape-generic and tiny to build."""
    import jax

    key = ("dphrase", dev.corpus_size, dev.blk_bits, T, plan_key, pattern,
           kind, k1, b, top_k)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.search.scoring import apply_similarity_device

    N = dev.corpus_size
    S = plane_slots(dev)
    plan = [(d, list(idxs)) for d, idxs in plan_key]

    def f(dstack, doc_lens, idfs, avgdl):
        planes = [dstack[:, i] for i in range(T)]
        freqs = phrase_counts_dense_planes(planes, list(pattern), plan, N, S)
        out = apply_similarity_device(kind, freqs, doc_lens[None, :],
                                      idfs[:, None], avgdl, k1, b)
        if top_k is None:
            return out
        return pack_topk(out, top_k)

    fn = jax.jit(f)
    _jit_cache[key] = fn
    return fn


TF_CACHE_MIN_WORDS = 1       # LRU budget (not a threshold) bounds the cache


def _tf_from_plane_fn(dev: DeviceIndex):
    """jit: dense plane u32[NS] -> tf f32[N] (popcount + slot sum).

    Shape depends only on the corpus, never on the term — arbitrary
    long-tail terms share ONE compiled program."""
    import jax

    key = ("tfplane", dev.corpus_size, dev.blk_bits)
    fn = _jit_cache.get(key)
    if fn is None:
        N = dev.corpus_size
        S = plane_slots(dev)

        def f(plane):
            return _popcount_f32(plane).reshape(N, S).sum(-1)

        fn = jax.jit(f)
        _jit_cache[key] = fn
    return fn


def term_tf(dev: DeviceIndex, term_id: int):
    """Dense float32[N] term-frequency vector, LRU-cached per term.

    The TPU analog of the reference's ``termfreq_cache``
    (`/root/reference/searcharray/phrase/middle_out.py:322-328`): tf is
    immutable for an index, costs N*4 bytes, and turns repeat scoring of a
    hot term into pure elementwise similarity + top-k."""
    cache = dev.tf_cache
    arr = cache.get(term_id)
    if arr is not None:
        cache.move_to_end(term_id)
        return arr
    off, n, _ = dev.term_span(term_id)
    if dense_eligible(dev):
        arr = _tf_from_plane_fn(dev)(expand_term(dev, term_id))
    else:
        from searcharray_tpu.search import scoring

        arr = scoring.score_term_dense(dev, term_id, kind="none")
    if n >= TF_CACHE_MIN_WORDS:
        per = dev.corpus_size * 4
        budget = max(per, DENSE_CACHE_BYTES // 8)
        while cache and (len(cache) + 1) * per > budget:
            cache.popitem(last=False)
        cache[term_id] = arr
    return arr


def phrase_group_subset_fn(dev: DeviceIndex, T: int, plan_key: tuple,
                           pattern: tuple, kind: str, k1: float, b: float,
                           top_k: Optional[int]):
    """jit: (dstack u32[Qg, T, NS], rows int32[Cp], doc_lens_sub f32[Cp],
    idfs[Qg], avgdl) -> scores over the candidate rows only.

    The candidate-pruned phrase phase (reference intent at
    `/root/reference/searcharray/solr.py:328-338`): planes are gathered at
    the candidate docs' slot ranges, so chain cost is proportional to the
    number of matching rows, not the corpus."""
    import jax

    key = ("dphrase_sub", dev.corpus_size, dev.blk_bits, T, plan_key,
           pattern, kind, k1, b, top_k)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.search.scoring import apply_similarity_device

    S = plane_slots(dev)
    plan = [(d, list(idxs)) for d, idxs in plan_key]

    def f(dstack, rows, doc_lens, idfs, avgdl):
        import jax.numpy as jnp

        Cp = rows.shape[0]
        doc_lens_sub = jnp.take(doc_lens, rows, axis=-1)
        flat_idx = (rows[:, None] * jnp.int32(S)
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
        planes = [jnp.take(dstack[:, i], flat_idx, axis=-1)
                  for i in range(T)]  # [Qg, Cp*S] each
        freqs = phrase_counts_dense_planes(planes, list(pattern), plan,
                                           Cp, S)
        out = apply_similarity_device(kind, freqs, doc_lens_sub[None, :],
                                      idfs[:, None], avgdl, k1, b)
        if top_k is None:
            return out
        return pack_topk(out, top_k)

    fn = jax.jit(f)
    _jit_cache[key] = fn
    return fn


def term_group_subset_fn(dev: DeviceIndex, kind: str, k1: float, b: float,
                         top_k: Optional[int]):
    """jit: (tfstack f32[Qg, N], rows int32[Cp], doc_lens_sub, idfs) ->
    scores over candidate rows (gather + similarity)."""
    import jax

    key = ("dterm_sub", dev.corpus_size, kind, k1, b, top_k)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.search.scoring import apply_similarity_device

    def f(tfstack, rows, doc_lens, idfs, avgdl):
        import jax.numpy as jnp

        sub = jnp.take(tfstack, rows, axis=-1)
        doc_lens_sub = jnp.take(doc_lens, rows, axis=-1)
        out = apply_similarity_device(kind, sub, doc_lens_sub[None, :],
                                      idfs[:, None], avgdl, k1, b)
        if top_k is None:
            return out
        return pack_topk(out, top_k)

    fn = jax.jit(f)
    _jit_cache[key] = fn
    return fn


def term_group_fn(dev: DeviceIndex, kind: str, k1: float, b: float,
                  top_k: Optional[int]):
    """jit: (tfstack f32[Qg, N], doc_lens, idfs[Qg]) -> scores.

    With cached tf vectors a term query is one elementwise similarity pass
    (plus fused top-k)."""
    import jax

    key = ("dterm", dev.corpus_size, kind, k1, b, top_k)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    from searcharray_tpu.search.scoring import apply_similarity_device

    def f(tfstack, doc_lens, idfs, avgdl):
        out = apply_similarity_device(kind, tfstack, doc_lens[None, :],
                                      idfs[:, None], avgdl, k1, b)
        if top_k is None:
            return out
        return pack_topk(out, top_k)

    fn = jax.jit(f)
    _jit_cache[key] = fn
    return fn


def score_phrase_dense(dev: DeviceIndex, term_ids: List[int], plan,
                       pattern, kind: str, k1: float, b: float, idf):
    """Single-query dense phrase scoring (one dispatch after expansions)."""
    import jax

    T = len(term_ids)
    plan_key = tuple((d, tuple(idxs)) for d, idxs in plan)
    key = ("dphrase1", dev.corpus_size, dev.blk_bits, T, plan_key,
           tuple(pattern), kind, k1, b)
    fn = _jit_cache.get(key)
    if fn is None:
        from searcharray_tpu.search.scoring import apply_similarity_device

        N = dev.corpus_size
        S = plane_slots(dev)
        plan_l = [(d, list(idxs)) for d, idxs in plan_key]
        pattern_l = list(pattern)

        def f(doc_lens, idf_, avgdl, *planes):
            return apply_similarity_device(
                kind,
                phrase_counts_dense_planes(list(planes), pattern_l, plan_l,
                                           N, S),
                doc_lens, idf_, avgdl, k1, b)

        fn = jax.jit(f)
        _jit_cache[key] = fn
    uniq = {}
    for t in term_ids:
        if t not in uniq:
            uniq[t] = expand_term(dev, t)
    planes = [uniq[t] for t in term_ids]
    avgdl = np.float32(max(dev.avg_doc_length, 1e-38))
    return fn(dev.doc_lens, np.float32(idf), avgdl, *planes)
