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
bigram_freqs.py:104-188`); tests/test_batch.py (cross-engine parity
cases) asserts bit-for-bit parity against it, and via it against the
reference scenario tables.

Memory policy: term planes live in ONE device-resident **plane pool**
``u32[C, NS]`` (term -> slot map on host, LRU eviction), and term tf
vectors in a **tf pool** ``f32[Ct, N]``.  All of a batch's missing terms
are expanded by ONE donated-buffer program per posting-size bucket (the
pool is updated in place on device), and query kernels gather rows from
the pools by slot index — so a whole serving batch costs a handful of
dispatches instead of one per term (round-1 VERDICT: the tunneled
dispatch, not compute, dominated at ~30 ms each).  When a single plane
would exceed ``DENSE_TERM_BYTES_LIMIT`` (huge corpora / pathological doc
lengths) the engine reports ineligible and callers fall back to the
sort-merge chain.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS, LSB_MASK

_TOP = LSB_BITS - 1          # bit index of "last position in block"
_LSB32 = int(LSB_MASK)

PLANE_POOL_BYTES = 3 << 30   # HBM budget for the plane pool
TF_POOL_BYTES = 768 << 20    # HBM budget for the tf pool
DENSE_TERM_BYTES_LIMIT = 1 << 29  # per-plane ceiling; beyond -> ineligible
PLANE_POOL_MAX_SLOTS = 1024
TF_POOL_MAX_SLOTS = 4096
_FILL_CHUNK = 64             # max terms per pool-fill dispatch (bounds the
                             # transient [K, NS] expansion inside the program)

# Phrase-tf cache: a phrase's per-doc freq vector is f32[N] — the same
# shape as a term tf row — and immutable for an index, so a repeated
# ("hot") phrase can live in the tf pool keyed by (tids, slop) and score
# as a term does: one row gather + similarity.  At 8.8M docs the full
# dense chain for a stopword phrase streams T x 281 MB of planes per
# batch; the cached row replays it for 35 MB.  This is the phrase-level
# analog of the reference's termfreq cache (`/root/reference/searcharray/
# phrase/middle_out.py:322-342` caches term freqs; its phrase path
# recomputes every call).  Promotion: the batch classifier counts
# encounters per signature and promotes at PHRASE_TF_MIN_HITS; rows fill
# inside the same fused pool-fill program as term planes ("ph"/"phs"
# sub-fills below), and LRU-evicted rows re-promote on later hits.
PHRASE_TF_MIN_HITS = 2
_PH_CHUNK = 8                # phrase rows per sub-fill (fori, one live row)

_jit_cache: dict = {}


def plane_slots(dev: DeviceIndex) -> int:
    return 1 << dev.blk_bits


def plane_size(dev: DeviceIndex) -> int:
    return dev.corpus_size << dev.blk_bits


def dense_eligible(dev: DeviceIndex) -> bool:
    return 0 < plane_size(dev) * 4 <= DENSE_TERM_BYTES_LIMIT


def plane_capacity(dev: DeviceIndex) -> int:
    per = plane_size(dev) * 4
    return int(min(PLANE_POOL_MAX_SLOTS, max(8, PLANE_POOL_BYTES // per)))


def tf_capacity(dev: DeviceIndex) -> int:
    per = max(1, dev.corpus_size * 4)
    return int(min(TF_POOL_MAX_SLOTS, max(16, TF_POOL_BYTES // per)))


# Fill programs always take _FILL_CHUNK rows with a dynamic live count
# (pad iterations cond-skip): the merged fill program is keyed by the
# whole set of sub-fill shapes, so any per-batch shape variation would
# compile a fresh program per batch.


def phrase_fits_pool(dev: DeviceIndex, tids: Sequence[int]) -> bool:
    """Whether a phrase's unique terms fit the plane pool with a slot to
    spare (callers fall back to the sparse sort-merge chain otherwise —
    at huge-corpus scales the pool holds only a handful of planes)."""
    return len(set(tids)) <= plane_capacity(dev) - 1


# Pools are allocated lazily per kind: a term-only workload must not pay
# the multi-GB plane-pool allocation (and vice versa) — two large indexes
# can then coexist on one chip as long as only one needs each pool.
def _init_plane_pool(dev: DeviceIndex) -> None:
    import jax.numpy as jnp

    if dev.plane_pool is None:
        C = plane_capacity(dev)
        dev.plane_pool = jnp.zeros((C, plane_size(dev)), jnp.uint32)
        dev.plane_free = list(range(C - 1, -1, -1))


def _init_tf_pool(dev: DeviceIndex) -> None:
    import jax.numpy as jnp

    if dev.tf_pool is None:
        Ct = tf_capacity(dev)
        dev.tf_pool = jnp.zeros((Ct, dev.corpus_size), jnp.float32)
        dev.tf_free = list(range(Ct - 1, -1, -1))


def _alloc_slots(slot_map, free: list, pin: set, tids: Sequence[int]):
    """Assign pool slots to the missing ``tids`` (LRU eviction, never
    evicting ``pin``); returns the list of (tid, slot) newly assigned."""
    new = []
    for t in dict.fromkeys(tids):
        if t in slot_map:
            slot_map.move_to_end(t)
            continue
        if free:
            s = free.pop()
        else:
            s = None
            for old in slot_map:
                if old not in pin:
                    s = slot_map.pop(old)
                    break
            if s is None:
                raise RuntimeError(
                    "dense pool exhausted by pinned terms; shrink the batch")
        slot_map[t] = s
        new.append((t, s))
    return new


def _fill_fn(dev: DeviceIndex, skey: tuple, cap_p: int, cap_t: int):
    """jit (both pools donated): one program applying a tuple of
    sub-fills — expanded term planes into the plane pool, tf vectors into
    the tf pool, and cached phrase-freq rows ("ph" exact / "phs" slop)
    into the tf pool.  ``skey`` is the ordered tuple of sub-fill shape
    keys.  Term fills dispatch through the corpus-canonical skey
    (_canonical_fill_skey, "p" sections ahead of "t"); phrase-row fills
    dispatch as separate per-fkey programs AFTER the term waves, so their
    plane reads see the freshly filled pool through the threaded
    ``dev.plane_pool`` value (the data dependency holds across dispatches,
    not inside one program).  Each section loops a dynamic 0..k_real trip
    count, so empty sections cost nothing."""
    import jax

    key = ("fill", dev.corpus_size, dev.blk_bits, skey, cap_p, cap_t)
    fn = _jit_cache.get(key)
    if fn is None:
        NS = plane_size(dev)
        N = dev.corpus_size
        blk_bits = dev.blk_bits

        # One fori_loop iteration per term, NOT a vmap over rows: only one
        # row's temporaries are ever live, so fills stay inside HBM even
        # when a single plane is hundreds of MB (8.8M docs).  tf rows come
        # straight from the CSR words (popcount + scatter-add by doc key),
        # never via a dense plane.  Iterations past the live count are
        # cond-skipped, so the row axis is always _FILL_CHUNK wide and the
        # program space stays (pool kind x posting bucket).
        def f(pool, tfpool, hdrs, pays, parts):
            import jax.numpy as jnp

            # Dynamic trip counts (0..k_real), NOT a fixed-width loop with
            # a cond-skip per row: lax.cond threading a multi-GB pool
            # through its identity branch makes XLA's copy-insertion pass
            # materialise full-pool copies per iteration on TPU (measured:
            # pool_fill_16x2 10 s vs 7.5 ms on CPU at a 50k corpus).  A
            # while_loop body updating the donated carry via
            # dynamic_update_slice aliases in place, and padded iterations
            # simply never run.
            for sk, part in zip(skey, parts):
                which = sk[0]
                if which in ("ph", "phs"):
                    tslots, outs, k_real = part
                    T = sk[1]
                    S = 1 << blk_bits

                    def body_ph(i, tfp, tslots=tslots, outs=outs,
                                sk=sk, pool=pool):
                        planes = [pool[tslots[i, j]] for j in range(T)]
                        if sk[0] == "ph":
                            plan = [(d, list(ix)) for d, ix in sk[2]]
                            freqs = phrase_counts_dense_planes(
                                planes, list(sk[3]), plan, N, S)
                        else:
                            _, _, anchor_i, w, mults = sk
                            freqs = span_counts_dense_planes(
                                planes, anchor_i, w, N, S, mults=mults)
                        return jax.lax.dynamic_update_slice(
                            tfp, freqs[None, :], (outs[i], 0))

                    tfpool = jax.lax.fori_loop(0, k_real, body_ph, tfpool)
                    continue
                bucket = sk[1]
                offs, ns, slots, k_real = part
                if which == "p":
                    def body_p(i, pl, offs=offs, ns=ns, slots=slots,
                               bucket=bucket):
                        h, p = K.take_term_planes(
                            hdrs, pays, offs[i], ns[i], bucket=bucket,
                            blk_bits=blk_bits)
                        row = jnp.zeros(NS, jnp.uint32).at[h].set(
                            p, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
                        return jax.lax.dynamic_update_slice(
                            pl, row[None, :], (slots[i], 0))

                    pool = jax.lax.fori_loop(0, k_real, body_p, pool)
                else:
                    def body_t(i, tp, offs=offs, ns=ns, slots=slots,
                               bucket=bucket):
                        h, p = K.take_term_planes(
                            hdrs, pays, offs[i], ns[i], bucket=bucket,
                            blk_bits=blk_bits)
                        keys = (h >> jnp.int32(blk_bits)).astype(
                            jnp.int32)
                        row = jnp.zeros(N, jnp.float32).at[keys].add(
                            _popcount_f32(p), mode="drop")
                        return jax.lax.dynamic_update_slice(
                            tp, row[None, :], (slots[i], 0))

                    tfpool = jax.lax.fori_loop(0, k_real, body_t, tfpool)
            return pool, tfpool

        fn = jax.jit(f, donate_argnums=(0, 1))
        _jit_cache[key] = fn
    return fn


def _canonical_fill_skey(dev: DeviceIndex, want_p: bool, want_t: bool):
    """The fixed sub-fill structure for this corpus: one _FILL_CHUNK-wide
    section per (kind, expand-bucket) the corpus can ever produce.  Keyed
    only on which pools exist, so the fill program compiles once per
    corpus instead of once per batch-miss composition."""
    key = ("cskey", want_p, want_t)
    cached = dev.__dict__.get("_fill_skeys")
    if cached is None:
        cached = dev._fill_skeys = {}
    skey = cached.get(key)
    if skey is None:
        max_len = (int(dev.postings.lengths.max())
                   if dev.postings.num_terms else 1)
        top = K.expand_bucket_of(max(1, max_len))
        buckets = []
        b = 4096
        while True:
            buckets.append(b)
            if b >= top:
                break
            b <<= 2
        skey = tuple(("p", b) for b in buckets if want_p) + tuple(
            ("t", b) for b in buckets if want_t)
        cached[key] = skey
    return skey


def _subfills(dev: DeviceIndex, which: str, new, cap: int):
    """Chunk newly assigned (tid, slot) rows into quantized sub-fill
    specs, grouped by coarse posting bucket."""
    by_bucket: dict = {}
    for t, s in new:
        off, n, _ = dev.term_span(t)
        by_bucket.setdefault(K.expand_bucket_of(n), []).append((off, n, s))
    out = []
    for bucket, rows in by_bucket.items():
        for c0 in range(0, len(rows), _FILL_CHUNK):
            chunk = rows[c0: c0 + _FILL_CHUNK]
            offs = np.zeros(_FILL_CHUNK, np.int32)
            ns = np.zeros(_FILL_CHUNK, np.int32)
            slots = np.zeros(_FILL_CHUNK, np.int32)
            for r, (off, n, s) in enumerate(chunk):
                offs[r], ns[r], slots[r] = off, n, s
            out.append(((which, bucket),
                        (offs, ns, slots, np.int32(len(chunk)))))
    return out


def _phrase_subfills(dev: DeviceIndex, new_sigs):
    """Sub-fill specs for newly assigned phrase-tf rows.  ``new_sigs``
    are ((tids, slop) signature, tf slot) pairs; each signature's recipe
    (term list + structural fill key) was registered at promotion time.
    Term plane slots are resolved host-side — ensure_batch allocated the
    recipe planes in the same call."""
    by_f: dict = {}
    for sig, slot in new_sigs:
        tids, fkey = dev.phrase_recipes[sig]
        tslots = [dev.plane_slot[t] for t in tids]
        by_f.setdefault(fkey, []).append((tslots, slot))
    out = []
    for fkey, rows in by_f.items():
        T = fkey[1]
        for c0 in range(0, len(rows), _PH_CHUNK):
            chunk = rows[c0: c0 + _PH_CHUNK]
            ts = np.zeros((_PH_CHUNK, T), np.int32)
            outs = np.zeros(_PH_CHUNK, np.int32)
            for r, (tslots, slot) in enumerate(chunk):
                ts[r] = tslots
                outs[r] = slot
            out.append((fkey, (ts, outs, np.int32(len(chunk)))))
    return out


def ensure_batch(dev: DeviceIndex, plane_tids: Sequence[int] = (),
                 tf_tids: Sequence[int] = (), pin_p=(), pin_t=()) -> None:
    """Make every requested term's plane / tf vector pool-resident with a
    single device dispatch for the whole batch (both pools, all buckets).

    ``tf_tids`` entries may be phrase signatures ((tids, slop) tuples)
    promoted into the phrase-tf cache: missing ones pull their recipe
    terms' planes into the same fill program and chain inside it.

    The TPU analog of the reference's docfreq/termfreq caches
    (`/root/reference/searcharray/phrase/middle_out.py:322-342`), shaped
    for a tunneled device where each dispatch costs ~9 ms."""
    if plane_tids:
        _init_plane_pool(dev)
    if tf_tids:
        _init_tf_pool(dev)
    miss_sigs = [t for t in tf_tids
                 if isinstance(t, tuple) and t not in dev.tf_slot]
    if miss_sigs:
        _init_plane_pool(dev)
        rec_tids = [t for s in dict.fromkeys(miss_sigs)
                    for t in dev.phrase_recipes[s][0]]
        plane_tids = list(plane_tids) + rec_tids
        pin_p = set(pin_p) | set(rec_tids)
    new_p = _alloc_slots(dev.plane_slot, dev.plane_free,
                         set(pin_p) | set(plane_tids), plane_tids)
    new_t = _alloc_slots(dev.tf_slot, dev.tf_free,
                         set(pin_t) | set(tf_tids), tf_tids)
    cap_p = 0 if dev.plane_pool is None else dev.plane_pool.shape[0]
    cap_t = 0 if dev.tf_pool is None else dev.tf_pool.shape[0]
    new_t_terms = [x for x in new_t if not isinstance(x[0], tuple)]
    new_t_sigs = [x for x in new_t if isinstance(x[0], tuple)]
    term_subs = (_subfills(dev, "p", new_p, cap_p)
                 + _subfills(dev, "t", new_t_terms, cap_t))
    ph_subs = _phrase_subfills(dev, new_t_sigs)
    if not term_subs and not ph_subs:
        return
    from searcharray_tpu.search import batch as _batch

    # Term fills dispatch through ONE canonical program whose structure
    # (every (kind, bucket) section this corpus can produce, fixed
    # _FILL_CHUNK width, empty sections cond-skipped at k_real == 0) is
    # the same for every batch.  A program keyed on the batch's actual
    # miss composition — the previous design — recompiles per distinct
    # composition, and the composition depends on live pool state, so
    # steady serving with a varied rare tail minted fresh 1-2 s XLA
    # compiles indefinitely (measured: 1M serving at 430 qps pipelined
    # with compile stalls vs ~1.3k qps warm).  Overflow beyond one
    # _FILL_CHUNK per section runs extra waves of the same program.
    if term_subs:
        queues: dict = {}
        for sk, part in term_subs:
            queues.setdefault(sk, []).append(part)
        skey = _canonical_fill_skey(dev, want_p=cap_p > 0, want_t=cap_t > 0)
        if not all(sk in skey for sk in queues):
            # an out-of-structure sub-fill silently dropped by the
            # skey-driven parts tuple would leave stale pool rows that
            # score as garbage — fail loudly (survives python -O,
            # unlike an assert)
            raise RuntimeError(
                "sub-fill outside the corpus's canonical structure: "
                f"{sorted(set(queues) - set(skey))} not in {skey}")
        empty = {
            sk: (np.zeros(_FILL_CHUNK, np.int32), np.zeros(_FILL_CHUNK,
                 np.int32), np.zeros(_FILL_CHUNK, np.int32), np.int32(0))
            for sk in skey}
        n_waves = max(len(q) for q in queues.values())
        fn = _fill_fn(dev, skey, cap_p, cap_t)
        for w in range(n_waves):
            parts = tuple(queues[sk][w] if w < len(queues.get(sk, ()))
                          else empty[sk] for sk in skey)
            _batch.DISPATCHES[0] += 1
            # absent pools (lazy init) pass through as None: jit flattens
            # them to zero leaves, and skey never touches them
            dev.plane_pool, dev.tf_pool = fn(dev.plane_pool, dev.tf_pool,
                                             dev.hdrs, dev.pays, parts)

    # Phrase-row fills run per structural recipe key (fkey): unbounded
    # fkey variety would destabilise the canonical program, and
    # promotions are rare events, so an extra ~9 ms dispatch per distinct
    # fkey is the right trade.  Plane sections above ran first, so recipe
    # planes are resident before these read them.
    for fkey, part in ph_subs:
        fn = _fill_fn(dev, (fkey,), cap_p, cap_t)
        _batch.DISPATCHES[0] += 1
        dev.plane_pool, dev.tf_pool = fn(dev.plane_pool, dev.tf_pool,
                                         dev.hdrs, dev.pays, (part,))


def ensure_planes(dev: DeviceIndex, tids: Sequence[int], pin=()) -> None:
    """Make every term's dense plane resident in the plane pool."""
    ensure_batch(dev, plane_tids=tids, pin_p=pin)


def ensure_tfs(dev: DeviceIndex, tids: Sequence[int], pin=()) -> None:
    """Make every term's tf vector resident in the tf pool."""
    ensure_batch(dev, tf_tids=tids, pin_t=pin)


def plane_slots_of(dev: DeviceIndex, tids: Sequence[int]) -> np.ndarray:
    return np.asarray([dev.plane_slot[t] for t in tids], np.int32)


def tf_slots_of(dev: DeviceIndex, tids: Sequence[int]) -> np.ndarray:
    return np.asarray([dev.tf_slot[t] for t in tids], np.int32)


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


_slotsum_mats: dict = {}


def _slot_sum(x, slots: int):
    """f32[..., N*S] -> f32[..., N]: sum each doc's S contiguous slots.

    An MXU matmul: rows of S*128 elements times a 0/1 block-summing
    [S*128, 128] matrix.  The two obvious forms are both slow on TPU —
    ``reshape(..., N, S).sum(-1)`` pads the tiny minor dim 16x (15 GB of
    temp at 1M docs), and ``reduce_window`` measured ~100x off roofline
    (33 ms for a 70M-element operand).  The matmul runs at ~HBM speed."""
    import jax
    import jax.numpy as jnp

    NS = x.shape[-1]
    cols = slots * 128
    b = _slotsum_mats.get(slots)  # numpy (jnp under trace leaks tracers)
    if b is None:
        b = np.zeros((cols, 128), np.float32)
        b[np.arange(cols), np.arange(cols) // slots] = 1.0
        _slotsum_mats[slots] = b
    mat = jnp.asarray(b)
    pad = -NS % cols
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
    rows = (NS + pad) // cols
    x2 = x.reshape(x.shape[:-1] + (rows, cols))
    y = jax.lax.dot_general(x2, mat,
                            (((x2.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(x.shape[:-1] + (rows * 128,))[..., : NS // slots]


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
            per_doc = _slot_sum(counts, slots)
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


def _win_pair_starts(x, w: int):
    """Window starts s where [s, s+w] contains >= 2 set bits of ``x``.

    Bit trick: positions p and p+d are both set iff ``x & (x >> d)`` has
    bit p; such a pair lies in window [s, s+w] iff s is within
    [p-(w-d), p] — a down-dilation of length w-d+1.  OR over d=1..w.
    O(w log w) vector ops, no per-position count raster."""
    ok = None
    for d in range(1, w + 1):
        pair = x & _shift_posns_down(x, d)
        cover = _dilate(pair, w + 1 - d, _shift_posns_down)
        ok = cover if ok is None else ok | cover
    return ok


def span_counts_dense_planes(planes, anchor_i: int, w: int, num_docs: int,
                             slots: int, mults=None):
    """Per-doc slop span counts on dense planes ([..., NS] each).

    Same semantics as spans._span_impl: anchor position p (rarest term)
    is covered iff some window [s, s+w] with s <= p <= s+w contains at
    least ``mults[t]`` bits of every distinct term t.  ok(s) = AND of
    per-term window presence (dilation down over [0, w]; the pair trick
    for multiplicity 2); covered(p) = OR of ok over [p-w, p] (dilation
    up); counts = per-doc popcount of covered anchors.  Valid for
    w <= LSB_BITS (shift never crosses two slots) and mults <= 2."""
    ok = None
    for i, pl in enumerate(planes):
        m = 1 if mults is None else mults[i]
        if m == 1:
            present = _dilate(pl, w + 1, _shift_posns_down)
        elif m == 2:
            present = _win_pair_starts(pl, w)
        else:
            raise ValueError("dense span kernel supports mults <= 2")
        ok = present if ok is None else ok & present
    covered = _dilate(ok, w + 1, _shift_posns_up)
    anchored = planes[anchor_i] & covered
    return _slot_sum(_popcount_f32(anchored), slots)


def score_span_dense(dev: DeviceIndex, uniq_tids: List[int], anchor_i: int,
                     w: int, kind: str, k1: float, b: float, idf,
                     mults=None):
    """Single-query dense slop scoring (one dispatch after the pool fill)."""
    import jax

    T = len(uniq_tids)
    mults_key = None if mults is None else tuple(mults)
    key = ("dspan1", dev.corpus_size, dev.blk_bits, T, anchor_i, w, kind,
           k1, b, mults_key)
    fn = _jit_cache.get(key)
    if fn is None:
        from searcharray_tpu.search.scoring import apply_similarity_device

        N = dev.corpus_size
        S = plane_slots(dev)

        def f(doc_lens, idf_, avgdl, pool, slots):
            planes = [pool[slots[i]] for i in range(T)]
            freqs = span_counts_dense_planes(planes, anchor_i, w, N, S,
                                             mults=mults_key)
            return apply_similarity_device(kind, freqs, doc_lens, idf_,
                                           avgdl, k1, b)

        fn = jax.jit(f)
        _jit_cache[key] = fn
    ensure_planes(dev, uniq_tids)
    slots = plane_slots_of(dev, uniq_tids)
    avgdl = np.float32(max(dev.avg_doc_length, 1e-38))
    return fn(dev.doc_lens, np.float32(idf), avgdl, dev.plane_pool, slots)


def pack_topk(dense, k: int):
    """[..., N] -> int32 [..., 2k]: f32 score bits ‖ int32 doc indices —
    one packed array so a whole batch crosses the tunnel in one transfer."""
    import jax
    import jax.numpy as jnp

    scores, idx = K.topk_exact(dense, k)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(scores, jnp.int32),
         idx.astype(jnp.int32)], axis=-1)


# ---------------------------------------------------------------------------
# jitted entry points (batched group + single query)
# ---------------------------------------------------------------------------
def phrase_group_body(dev: DeviceIndex, T: int, plan_key: tuple,
                      pattern: tuple, kind: str, k1: float, b: float,
                      top_k: Optional[int], pool, slots, doc_lens, idfs,
                      avgdl, rows=None):
    """Traced body of one phrase group: gather planes from the pool, run
    the chain, apply similarity (optionally over a candidate-row subset),
    optionally fuse top-k packing."""
    import jax.numpy as jnp

    from searcharray_tpu.search.scoring import apply_similarity_device

    N = dev.corpus_size
    S = plane_slots(dev)
    plan = [(d, list(idxs)) for d, idxs in plan_key]
    if rows is None:
        # lax.map per query: a broadcast [Qg, T, NS] gather duplicates
        # full planes per query (Qg x T x 283 MB of pure copy at 8.8M
        # docs) while the chain itself streams at near-HBM rate; per-
        # iteration dynamic-slices read the pool in place
        import jax

        from searcharray_tpu.search.scoring import apply_similarity_device as _sim

        def one(args):
            slots_q, idf_q = args
            planes = [pool[slots_q[i]] for i in range(T)]
            freqs = phrase_counts_dense_planes(planes, list(pattern), plan,
                                               N, S)
            out = _sim(kind, freqs[None, :], doc_lens[None, :],
                       jnp.full((1, 1), idf_q, jnp.float32), avgdl, k1, b)
            if top_k is None:
                return out[0]
            return pack_topk(out, top_k)[0]

        return jax.lax.map(one, (slots, idfs))
    else:
        Cp = rows.shape[0]
        flat_idx = (rows[:, None] * jnp.int32(S)
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
        planes = [jnp.take(jnp.take(pool, slots[:, i], axis=0), flat_idx,
                           axis=-1)
                  for i in range(T)]  # [Qg, Cp*S] each
        n_docs, dl = Cp, jnp.take(doc_lens, rows, axis=-1)
    freqs = phrase_counts_dense_planes(planes, list(pattern), plan, n_docs,
                                       S)
    out = apply_similarity_device(kind, freqs, dl[None, :], idfs[:, None],
                                  avgdl, k1, b)
    if top_k is None:
        return out
    return pack_topk(out, top_k)


def span_group_body(dev: DeviceIndex, T: int, anchor_i: int, w: int,
                    mults: tuple, kind: str, k1: float, b: float,
                    top_k: Optional[int], pool, slots, doc_lens, idfs,
                    avgdl, rows=None):
    """Traced body of one slop group: gather planes from the pool, run
    the windowed dilation span kernel over the query axis, apply
    similarity, optionally fuse top-k packing."""
    import jax.numpy as jnp

    from searcharray_tpu.search.scoring import apply_similarity_device

    N = dev.corpus_size
    S = plane_slots(dev)
    if rows is None:
        # lax.map per query — see phrase_group_body: no [Qg, T, NS]
        # plane duplication, the window kernel streams pool slices
        import jax

        from searcharray_tpu.search.scoring import apply_similarity_device as _sim

        def one(args):
            slots_q, idf_q = args
            planes = [pool[slots_q[i]] for i in range(T)]
            freqs = span_counts_dense_planes(planes, anchor_i, w, N, S,
                                             mults=mults)
            out = _sim(kind, freqs[None, :], doc_lens[None, :],
                       jnp.full((1, 1), idf_q, jnp.float32), avgdl, k1, b)
            if top_k is None:
                return out[0]
            return pack_topk(out, top_k)[0]

        return jax.lax.map(one, (slots, idfs))
    else:
        Cp = rows.shape[0]
        flat_idx = (rows[:, None] * jnp.int32(S)
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
        planes = [jnp.take(jnp.take(pool, slots[:, i], axis=0), flat_idx,
                           axis=-1)
                  for i in range(T)]
        n_docs, dl = Cp, jnp.take(doc_lens, rows, axis=-1)
    freqs = span_counts_dense_planes(planes, anchor_i, w, n_docs, S,
                                     mults=mults)
    out = apply_similarity_device(kind, freqs, dl[None, :], idfs[:, None],
                                  avgdl, k1, b)
    if top_k is None:
        return out
    return pack_topk(out, top_k)


def term_group_body(kind: str, k1: float, b: float, top_k: Optional[int],
                    tfpool, slots, doc_lens, idfs, avgdl, rows=None):
    """Traced body of one term group: gather tf rows + similarity."""
    import jax.numpy as jnp

    from searcharray_tpu.search.scoring import apply_similarity_device

    tfstack = jnp.take(tfpool, slots, axis=0)
    dl = doc_lens
    if rows is not None:
        tfstack = jnp.take(tfstack, rows, axis=-1)
        dl = jnp.take(doc_lens, rows, axis=-1)
    out = apply_similarity_device(kind, tfstack, dl[None, :], idfs[:, None],
                                  avgdl, k1, b)
    if top_k is None:
        return out
    return pack_topk(out, top_k)


def phrase_group_fn(dev: DeviceIndex, T: int, plan_key: tuple,
                    pattern: tuple, kind: str, k1: float, b: float,
                    top_k: Optional[int]):
    """jit: (pool u32[C, NS], slots int32[Qg, T], doc_lens, idfs[Qg]) ->
    scores.  Planes are gathered from the pool inside the program; every
    chain op broadcasts over the leading query axis.  Qg is not part of
    the cache key — XLA recompiles per Qg shape, but the program is
    shape-generic and tiny to build."""
    import jax

    key = ("dphrase", dev.corpus_size, dev.blk_bits, T, plan_key, pattern,
           kind, k1, b, top_k)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    def f(pool, slots, doc_lens, idfs, avgdl):
        return phrase_group_body(dev, T, plan_key, pattern, kind, k1, b,
                                 top_k, pool, slots, doc_lens, idfs, avgdl)

    fn = jax.jit(f)
    _jit_cache[key] = fn
    return fn


def term_tf(dev: DeviceIndex, term_id: int):
    """Dense float32[N] term-frequency vector (a tf-pool row view).

    The TPU analog of the reference's ``termfreq_cache``
    (`/root/reference/searcharray/phrase/middle_out.py:322-328`): tf is
    immutable for an index, costs N*4 bytes, and turns repeat scoring of a
    hot term into pure elementwise similarity + top-k."""
    if dense_eligible(dev):
        ensure_tfs(dev, [term_id])
        return dev.tf_pool[dev.tf_slot[term_id]]
    from searcharray_tpu.search import scoring

    cache = dev.tf_cache  # dict fallback for pool-ineligible corpora
    arr = cache.get(term_id)
    if arr is None:
        arr = scoring.score_term_dense(dev, term_id, kind="none")
        per = dev.corpus_size * 4
        budget = max(per, TF_POOL_BYTES)
        while cache and (len(cache) + 1) * per > budget:
            cache.popitem(last=False)
        cache[term_id] = arr
    else:
        cache.move_to_end(term_id)
    return arr


def term_group_fn(dev: DeviceIndex, kind: str, k1: float, b: float,
                  top_k: Optional[int]):
    """jit: (tfpool f32[Ct, N], slots int32[Qg], doc_lens, idfs[Qg]) ->
    scores.  With pooled tf vectors a term query is one gather +
    elementwise similarity pass (plus fused top-k)."""
    import jax

    key = ("dterm", dev.corpus_size, kind, k1, b, top_k)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    def f(tfpool, slots, doc_lens, idfs, avgdl):
        return term_group_body(kind, k1, b, top_k, tfpool, slots, doc_lens,
                               idfs, avgdl)

    fn = jax.jit(f)
    _jit_cache[key] = fn
    return fn


def score_phrase_dense(dev: DeviceIndex, term_ids: List[int], plan,
                       pattern, kind: str, k1: float, b: float, idf):
    """Single-query dense phrase scoring (one dispatch after the pool
    fill)."""
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

        def f(doc_lens, idf_, avgdl, pool, slots):
            planes = [pool[slots[i]] for i in range(T)]
            return apply_similarity_device(
                kind,
                phrase_counts_dense_planes(planes, pattern_l, plan_l, N, S),
                doc_lens, idf_, avgdl, k1, b)

        fn = jax.jit(f)
        _jit_cache[key] = fn
    ensure_planes(dev, term_ids)
    slots = plane_slots_of(dev, term_ids)
    avgdl = np.float32(max(dev.avg_doc_length, 1e-38))
    return fn(dev.doc_lens, np.float32(idf), avgdl, dev.plane_pool, slots)
