"""Exact phrase matching: sort-merge bigram chain over 32-bit posting planes.

Reference semantics (`/root/reference/searcharray/phrase/bigram_freqs.py`,
`middle_out.py:96-168`): chain bigram matches left-to-right / right-to-left /
middle-out split at the rarest term, carrying a *continuation* array of
match-end positions, and take the per-doc running min of bigram counts.

TPU redesign — why a sort and not a search: binary-search alignment
(searchsorted) costs ~log2(n) dependent random-gather passes; measured on
TPU v5e that is ~150 ms for a stopword-sized posting list.  A multi-operand
`lax.sort` streams sequentially through HBM instead (~10 ms at 1.3M
elements).  So each bigram step is a **tagged merge**:

  combined = sort by (header, tag) of
     lhs words           (tag 0, carrying lhs payload)
     lhs "push" probes   (tag 1, header+1, carrying lhs payload)
     rhs words           (tag 2, carrying rhs payload)

After the sort, each rhs element's inner match (same-header lhs payload) and
cross-block adjacency (lhs top bit one block earlier) sit at most two
positions behind it — fixed-lookback shifts, no gathers.  Counts scatter
into the dense ``float32[num_docs]`` vector; the continuation (match-end
bits per rhs word) is compacted back to rhs order with one monotone
scatter.  Headers are shard-compressed ``doc << blk_bits | blk`` int32
(device.py), so the sort key is a native 32-bit compare.

The whole query — slices, chain, min, similarity — is ONE dispatch.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.ops import kernels as K
from searcharray_tpu.ops.encoding import LSB_BITS, LSB_MASK
from searcharray_tpu.ops.kernels import PAD_HDR32
from searcharray_tpu.search.scoring import (
    _window_blocks,
    apply_similarity_device,
    host_idf,
)

_TOP_BIT = 1 << (LSB_BITS - 1)  # bit 17, "last position in block"
_LSB32 = int(LSB_MASK)


def jax_popcount(x):
    import jax

    return jax.lax.population_count(x).astype(jax.numpy.int32)


def _same_term_counts(pay):
    """Per-word adjusted same-term bigram count (bigram_freqs.py:48-101)."""
    import jax.numpy as jnp

    lsb = jnp.uint32(_LSB32)
    overlap = pay & ((pay << 1) & lsb)
    adj = jax_popcount(overlap)
    consec = jax_popcount(overlap & (overlap << 1) & lsb)
    adjusted = adj - (-(consec // jnp.int32(-2)))  # == adj - ceil(consec/2)
    return adjusted.astype(jnp.float32), overlap


def _shift_prev(arr, fill):
    import jax.numpy as jnp

    return jnp.concatenate([jnp.full((1,), fill, arr.dtype), arr[:-1]])


def _shift_next(arr, fill):
    import jax.numpy as jnp

    return jnp.concatenate([arr[1:], jnp.full((1,), fill, arr.dtype)])


def _same_term_step(h, p, cont_side, num_docs, blk_bits, need_cont=True,
                    pairs=False):
    """Closed-form bigram step when lhs and rhs are the identical array.

    No alignment needed: within-word runs use the same-term correction,
    cross-block adjacency is simply the neighbouring element (headers are
    unique and sorted).  With ``pairs`` the per-word (sorted doc key,
    count) stream is returned instead of the dense vector (for batched
    flat segment-sums, search/batch.py)."""
    import jax.numpy as jnp

    st_counts, st_overlap = _same_term_counts(p)
    if cont_side == "rhs":
        ph = _shift_prev(h, jnp.int32(-2))
        pp = _shift_prev(p, jnp.uint32(0))
        adj = (ph == h - 1) & (((pp >> np.uint32(LSB_BITS - 1)) & 1) == 1) & (
            (p & 1) == 1
        )
        cont_bits = st_overlap
        adj_bit = jnp.where(adj, jnp.uint32(1), jnp.uint32(0))
    else:
        nh = _shift_next(h, jnp.int32(PAD_HDR32))
        np_ = _shift_next(p, jnp.uint32(0))
        adj = (nh == h + 1) & ((np_ & 1) == 1) & (
            ((p >> np.uint32(LSB_BITS - 1)) & 1) == 1
        )
        cont_bits = p & (p >> 1)
        adj_bit = jnp.where(adj, jnp.uint32(_TOP_BIT), jnp.uint32(0))

    counts = st_counts + adj.astype(jnp.float32)
    valid = h != PAD_HDR32
    counts = jnp.where(valid, counts, 0.0)
    keys = (h >> jnp.int32(blk_bits)).astype(jnp.int32)
    if pairs:
        dense = (keys, counts)
    else:
        dense = jnp.zeros(num_docs, jnp.float32).at[keys].add(counts,
                                                              mode="drop")
    if not need_cont:
        return dense, None
    cont_p = jnp.where(valid, cont_bits | adj_bit, jnp.uint32(0))
    return dense, (h, cont_p)


def _merge_step(lh, lp, rh, rp, cont_side, num_docs, blk_bits,
                need_cont=True, segsum_wpb=None, pairs=False):
    """Sort-merge bigram step; continuation shaped like the `base` side
    (rhs for L2R, lhs for R2L).  With ``pairs`` the (sorted doc key,
    count) stream is returned instead of the dense vector.

    Tag order puts *base* (tag 0) before *other* (tag 1) at equal headers,
    so for each base element the same-header partner is at lookahead 1 and
    the adjacent-block partner within lookback/lookahead <= 3 — the merge
    needs only one (A+B)-element sort plus shifted compares, no probe
    copies and no gathers."""
    import jax
    import jax.numpy as jnp

    if cont_side == "rhs":
        base_h, base_p = rh, rp
        other_h, other_p = lh, lp
    else:
        base_h, base_p = lh, lp
        other_h, other_p = rh, rp

    B = base_h.shape[0]
    A = other_h.shape[0]
    ch = jnp.concatenate([base_h, other_h])
    ct = jnp.concatenate([jnp.zeros(B, jnp.int32), jnp.ones(A, jnp.int32)])
    cp = jnp.concatenate([base_p, other_p])
    sh, st, sp = jax.lax.sort((ch, ct, cp), num_keys=2)

    def prev(arr, fill):
        return _shift_prev(arr, fill)

    def nxt(arr, fill):
        return _shift_next(arr, fill)

    n1h, n1t, n1p = nxt(sh, jnp.int32(-2)), nxt(st, jnp.int32(-1)), nxt(sp, jnp.uint32(0))
    is_base = st == 0
    real = is_base & (sh != PAD_HDR32)

    # same-header partner (other sorts right after base at equal header)
    inner_p = jnp.where((n1h == sh) & (n1t == 1), n1p, jnp.uint32(0))
    inner_p = jnp.where(real, inner_p, jnp.uint32(0))

    if cont_side == "rhs":
        # adjacent partner: other at header-1, which sorts after any base at
        # header-1 and thus sits directly before this base element
        p1h, p1t, p1p = (prev(sh, jnp.int32(-2)), prev(st, jnp.int32(-1)),
                         prev(sp, jnp.uint32(0)))
        adj_p = jnp.where((p1h == sh - 1) & (p1t == 1), p1p, jnp.uint32(0))
        overlap = inner_p & (sp >> 1)
        adj = real & (((adj_p >> np.uint32(LSB_BITS - 1)) & 1) == 1) & (
            (sp & 1) == 1
        )
        cont_bits = (overlap << 1) & jnp.uint32(_LSB32)
        adj_bit = jnp.where(adj, jnp.uint32(1), jnp.uint32(0))
    else:
        # adjacent partner: other at header+1; between this base element
        # and it there can be other(h) and base(h+1) -> lookahead <= 3
        n2h, n2t, n2p = (nxt(n1h, jnp.int32(-2)), nxt(n1t, jnp.int32(-1)),
                         nxt(n1p, jnp.uint32(0)))
        n3h, n3t, n3p = (nxt(n2h, jnp.int32(-2)), nxt(n2t, jnp.int32(-1)),
                         nxt(n2p, jnp.uint32(0)))
        adj_p = jnp.where(
            (n1h == sh + 1) & (n1t == 1), n1p,
            jnp.where(
                (n2h == sh + 1) & (n2t == 1), n2p,
                jnp.where((n3h == sh + 1) & (n3t == 1), n3p, jnp.uint32(0)),
            ),
        )
        overlap = sp & (inner_p >> 1)
        adj = real & ((adj_p & 1) == 1) & (
            ((sp >> np.uint32(LSB_BITS - 1)) & 1) == 1
        )
        cont_bits = overlap
        adj_bit = jnp.where(adj, jnp.uint32(_TOP_BIT), jnp.uint32(0))

    counts = jnp.where(real, jax_popcount(overlap).astype(jnp.float32)
                       + adj.astype(jnp.float32), 0.0)
    keys = (sh >> jnp.int32(blk_bits)).astype(jnp.int32)
    if pairs:
        dense = (keys, counts)
    elif segsum_wpb is not None:
        # Pallas block-reduce segment sum (keys are sorted): ~10x cheaper
        # than XLA scatter-add on TPU for stopword-sized steps.
        from searcharray_tpu.ops.pallas.score import segment_sum_pallas

        dense = segment_sum_pallas(keys, counts, num_docs=num_docs,
                                   max_words_per_block=min(A + B, segsum_wpb))
    else:
        dense = jnp.zeros(num_docs, jnp.float32).at[keys].add(counts,
                                                              mode="drop")
    if not need_cont:
        return dense, None

    # compact continuation back to base order (base elements appear in the
    # sorted stream in their own sorted order -> ranks are monotone)
    rank = jnp.cumsum(is_base.astype(jnp.int32)) - 1
    idx = jnp.where(is_base, rank, A + B)  # out of range -> dropped
    cont_p_all = jnp.where(real, cont_bits | adj_bit, jnp.uint32(0))
    cont_h = jnp.full(B, PAD_HDR32, jnp.int32).at[idx].set(
        sh, mode="drop", unique_indices=True
    )
    cont_p = jnp.zeros(B, jnp.uint32).at[idx].set(
        cont_p_all, mode="drop", unique_indices=True
    )
    return dense, (cont_h, cont_p)


# ---------------------------------------------------------------------------
# Per-step compiled kernels.
#
# A whole-query composite jit compiles one giant program per (bucket-tuple,
# plan) — XLA compile time explodes on large fused sorts and nothing is
# reused across phrases.  Per-step jits instead are keyed by (bucket pair,
# side): a handful of small programs shared by every phrase, chained with
# cheap async dispatches (~9 ms enqueue on the TPU tunnel, fully pipelined).
# ---------------------------------------------------------------------------
_jit_cache: dict = {}


def _cached_jit(key, builder):
    fn = _jit_cache.get(key)
    if fn is None:
        import jax

        fn = jax.jit(builder())
        _jit_cache[key] = fn
    return fn


def _merge_raw_fn(A, B, cont_side, num_docs, blk_bits, windowed,
                  need_cont=True, segsum_wpb=None):
    """First chain step: slices both raw terms inside the jit."""

    def build():
        def f(hdrs, pays, lo, ln, ro, rn, min_blk, max_blk):
            mb = (min_blk, max_blk) if windowed else (None, None)
            lh, lp = K.take_term_planes(hdrs, pays, lo, ln, *mb,
                                        bucket=A, blk_bits=blk_bits)
            rh, rp = K.take_term_planes(hdrs, pays, ro, rn, *mb,
                                        bucket=B, blk_bits=blk_bits)
            return _merge_step(lh, lp, rh, rp, cont_side, num_docs, blk_bits,
                               need_cont=need_cont, segsum_wpb=segsum_wpb)

        return f

    return _cached_jit(
        ("merge_raw", A, B, cont_side, num_docs, blk_bits, windowed,
         need_cont, segsum_wpb), build
    )


def _merge_carry_fn(A, B, cont_side, num_docs, blk_bits, windowed,
                    need_cont=True, segsum_wpb=None):
    """Later chain step: carry is on device, raw term sliced inside."""

    def build():
        def f(ch, cp, hdrs, pays, o, n, min_blk, max_blk):
            mb = (min_blk, max_blk) if windowed else (None, None)
            th, tp = K.take_term_planes(hdrs, pays, o, n, *mb,
                                        bucket=B, blk_bits=blk_bits)
            if cont_side == "rhs":
                return _merge_step(ch, cp, th, tp, cont_side, num_docs,
                                   blk_bits, need_cont=need_cont,
                                   segsum_wpb=segsum_wpb)
            return _merge_step(th, tp, ch, cp, cont_side, num_docs, blk_bits,
                               need_cont=need_cont, segsum_wpb=segsum_wpb)

        return f

    return _cached_jit(
        ("merge_carry", A, B, cont_side, num_docs, blk_bits, windowed,
         need_cont, segsum_wpb), build
    )


def _same_raw_fn(B, cont_side, num_docs, blk_bits, windowed,
                 need_cont=True):
    def build():
        def f(hdrs, pays, o, n, min_blk, max_blk):
            mb = (min_blk, max_blk) if windowed else (None, None)
            h, p = K.take_term_planes(hdrs, pays, o, n, *mb,
                                      bucket=B, blk_bits=blk_bits)
            return _same_term_step(h, p, cont_side, num_docs, blk_bits,
                                   need_cont=need_cont)

        return f

    return _cached_jit(
        ("same_raw", B, cont_side, num_docs, blk_bits, windowed, need_cont),
        build
    )


def _minsim_fn(num_docs, n_acc, kind, k1, b):
    def build():
        def f(doc_lens, idf, avgdl, *accs):
            import jax.numpy as jnp

            freqs = accs[0]
            for a in accs[1:]:
                freqs = jnp.minimum(freqs, a)
            return apply_similarity_device(kind, freqs, doc_lens, idf,
                                           avgdl, k1, b)

        return f

    return _cached_jit(("minsim", num_docs, n_acc, kind, k1, b), build)


def _run_chain(index, spans, tids, direction, mbargs, windowed,
               segsum_wpb=None):
    """Dispatch the bigram chain; returns the list of dense count vectors.

    ``spans`` = [(off, n, bucket)] per term; slices are fused into the step
    kernels so a T-term phrase costs T-1 dispatches."""
    num_docs = index.corpus_size
    blk_bits = index.blk_bits
    H, P_ = index.hdrs, index.pays
    denses = []
    carry = None
    if direction == "l2r":
        for i in range(1, len(spans)):
            last = i == len(spans) - 1
            ro, rn, rb = spans[i]
            if carry is None:
                lo, ln, lb = spans[i - 1]
                if tids[i] == tids[i - 1]:
                    dense, carry = _same_raw_fn(rb, "rhs", num_docs, blk_bits,
                                                windowed, not last)(
                        H, P_, ro, rn, *mbargs)
                else:
                    dense, carry = _merge_raw_fn(lb, rb, "rhs", num_docs,
                                                 blk_bits, windowed, not last,
                                                 segsum_wpb)(
                        H, P_, lo, ln, ro, rn, *mbargs)
            else:
                dense, carry = _merge_carry_fn(carry[0].shape[0], rb, "rhs",
                                               num_docs, blk_bits, windowed,
                                               not last, segsum_wpb)(
                    *carry, H, P_, ro, rn, *mbargs)
            denses.append(dense)
    else:
        for i in range(len(spans) - 2, -1, -1):
            last = i == 0
            lo, ln, lb = spans[i]
            if carry is None:
                ro, rn, rb = spans[i + 1]
                if tids[i] == tids[i + 1]:
                    dense, carry = _same_raw_fn(lb, "lhs", num_docs, blk_bits,
                                                windowed, not last)(
                        H, P_, lo, ln, *mbargs)
                else:
                    dense, carry = _merge_raw_fn(lb, rb, "lhs", num_docs,
                                                 blk_bits, windowed, not last,
                                                 segsum_wpb)(
                        H, P_, lo, ln, ro, rn, *mbargs)
            else:
                dense, carry = _merge_carry_fn(carry[0].shape[0], lb, "lhs",
                                               num_docs, blk_bits, windowed,
                                               not last, segsum_wpb)(
                    *carry, H, P_, lo, ln, *mbargs)
            denses.append(dense)
    return denses


# "auto": single-dispatch composite kernels on TPU (host enqueue round
# trips are ~9 ms there), per-step kernels on CPU (composites recompile per
# phrase shape; steps are shared).  Tests force each mode explicitly.
COMPOSITE_MODE = "auto"


# ---------------------------------------------------------------------------
# Merged-space chain: ONE sort for the whole phrase.
#
# All T term slices are concatenated with their query position as a
# secondary sort key and sorted once by (header, qpos).  Then every bigram
# step is pure shifted compares on the merged arrays:
#   * the same-header lhs partner of an rhs entry is its immediate
#     predecessor (qpos i is the largest possible key below i+1);
#   * the adjacent-block lhs partner (header-1) is within lookback T
#     (at header-1 only qpos > i entries can intervene, at the rhs header
#     only qpos <= i entries can);
#   * continuations are in-place payload updates at the rhs entries — no
#     per-step compaction scatters, no per-step sorts.
# Counts still need a per-step dense per-doc sum (Pallas segment-sum).
# ---------------------------------------------------------------------------
def _merged_chain(planes, tids, direction, num_docs, blk_bits, segsum_wpb,
                  pairs=False):
    import jax
    import jax.numpy as jnp

    T = len(planes)
    M = sum(p[0].shape[0] for p in planes)
    if segsum_wpb is not None:
        # segsum_wpb is the 2-stream (pairwise) bound 1024*(2*bpd+2); the
        # merged stream interleaves T per-term streams, so a 1024-doc block
        # can hold up to T*bpd words per doc — scale the tile bound or the
        # kernel would silently drop overflow words.
        segsum_wpb += (segsum_wpb - 2048) * (T - 2) // 2
    if direction == "l2r":
        order = list(range(T))
    else:
        # run the chain over reversed query positions so every step is the
        # uniform "rhs consumes carry" form; cont bits mirror below
        order = list(range(T - 1, -1, -1))

    ch = jnp.concatenate([planes[i][0] for i in order])
    cq = jnp.concatenate(
        [jnp.full(planes[i][0].shape[0], j, jnp.int32)
         for j, i in enumerate(order)]
    )
    cpay = jnp.concatenate([planes[i][1] for i in order])
    sh, sq, sp = jax.lax.sort((ch, cq, cpay), num_keys=2)

    def back(arr, k, fill):
        return jnp.concatenate([jnp.full((k,), fill, arr.dtype), arr[:-k]])

    def fwd(arr, k, fill):
        return jnp.concatenate([arr[k:], jnp.full((k,), fill, arr.dtype)])

    doc_keys = (sh >> jnp.int32(blk_bits)).astype(jnp.int32)
    lsb = jnp.uint32(_LSB32)
    top = jnp.uint32(_TOP_BIT)
    cp = sp
    denses = []
    for step in range(T - 1):
        is_rhs = sq == step + 1
        real = is_rhs & (sh != PAD_HDR32)
        same_term = tids[order[step + 1]] == tids[order[step]] and step == 0

        # inner partner: immediate predecessor with same header, qpos step
        in_h = back(sh, 1, jnp.int32(-2))
        in_q = back(sq, 1, jnp.int32(-1))
        in_cp = back(cp, 1, jnp.uint32(0))
        inner = jnp.where((in_h == sh) & (in_q == step), in_cp, jnp.uint32(0))
        # adjacency partner (qpos step): at header-1 for l2r (lookback;
        # up to T-1-step entries with qpos>step at h-1 plus step+1 entries
        # with qpos<=step at h can intervene -> partner within lookback
        # T+1) or at header+1 for the reversed chain (lookahead, mirrored)
        adj_pay = jnp.uint32(0)
        found = jnp.zeros_like(is_rhs)
        for k in range(1, T + 2):
            if direction == "l2r":
                kh = back(sh, k, jnp.int32(-2))
                kq = back(sq, k, jnp.int32(-1))
                kc = back(cp, k, jnp.uint32(0))
                hit = (kh == sh - 1) & (kq == step) & ~found
            else:
                kh = fwd(sh, k, jnp.int32(-2))
                kq = fwd(sq, k, jnp.int32(-1))
                kc = fwd(cp, k, jnp.uint32(0))
                hit = (kh == sh + 1) & (kq == step) & ~found
            adj_pay = jnp.where(hit, kc, adj_pay)
            found = found | hit

        if direction == "l2r":
            if same_term:
                counts_w, cont_bits = _same_term_counts(sp)
                counts_w = jnp.where(real, counts_w, 0.0)
            else:
                overlap = jnp.where(real, inner & (sp >> 1), jnp.uint32(0))
                counts_w = jax_popcount(overlap).astype(jnp.float32)
                cont_bits = (overlap << 1) & lsb
            adj = real & (((adj_pay >> np.uint32(LSB_BITS - 1)) & 1) == 1) & (
                (sp & 1) == 1
            )
            adj_bit = jnp.where(adj, jnp.uint32(1), jnp.uint32(0))
        else:
            # reversed-order r2l: the "rhs" here is the earlier query term;
            # its payload is one position BEFORE the carry, so roles flip
            if same_term:
                counts_w, _ = _same_term_counts(sp)
                counts_w = jnp.where(real, counts_w, 0.0)
                cont_bits = sp & (sp >> 1)
            else:
                overlap = jnp.where(real, sp & (inner >> 1), jnp.uint32(0))
                counts_w = jax_popcount(overlap).astype(jnp.float32)
                cont_bits = overlap
            adj = real & ((adj_pay & 1) == 1) & (
                ((sp >> np.uint32(LSB_BITS - 1)) & 1) == 1
            )
            adj_bit = jnp.where(adj, top, jnp.uint32(0))

        counts = jnp.where(real, counts_w + adj.astype(jnp.float32), 0.0)
        if pairs:
            dense = (doc_keys, counts)
        elif segsum_wpb is not None:
            from searcharray_tpu.ops.pallas.score import segment_sum_pallas

            dense = segment_sum_pallas(doc_keys, counts, num_docs=num_docs,
                                       max_words_per_block=min(M, segsum_wpb))
        else:
            dense = jnp.zeros(num_docs, jnp.float32).at[doc_keys].add(
                counts, mode="drop"
            )
        denses.append(dense)
        if step != T - 2:
            cp = jnp.where(real, cont_bits | adj_bit, cp)
    return denses


def _plan(n: int, split: int):
    """Chain layout, parity with compute_phrase_freqs (middle_out.py:154-168)."""
    if split <= 1:
        return [("l2r", list(range(n)))]
    if split >= n - 2:
        return [("r2l", list(range(n)))]
    return [("l2r", list(range(split))), ("r2l", list(range(split, n)))]


def _chain_planes(planes, tids, direction, num_docs, blk_bits,
                  segsum_wpb=None, pairs=False):
    """In-trace bigram chain over already-sliced planes.

    With ``pairs`` each step yields (sorted doc keys, counts) instead of a
    dense vector (batched flat segment-sums, search/batch.py)."""
    denses = []
    carry = None
    if direction == "l2r":
        for i in range(1, len(planes)):
            last = i == len(planes) - 1
            if carry is None and tids[i] == tids[i - 1]:
                dense, carry = _same_term_step(*planes[i], "rhs", num_docs,
                                               blk_bits, need_cont=not last,
                                               pairs=pairs)
            else:
                lhs = planes[i - 1] if carry is None else carry
                dense, carry = _merge_step(*lhs, *planes[i], "rhs", num_docs,
                                           blk_bits, need_cont=not last,
                                           segsum_wpb=segsum_wpb, pairs=pairs)
            denses.append(dense)
    else:
        for i in range(len(planes) - 2, -1, -1):
            last = i == 0
            if carry is None and tids[i] == tids[i + 1]:
                dense, carry = _same_term_step(*planes[i], "lhs", num_docs,
                                               blk_bits, need_cont=not last,
                                               pairs=pairs)
            else:
                rhs = planes[i + 1] if carry is None else carry
                dense, carry = _merge_step(*planes[i], *rhs, "lhs", num_docs,
                                           blk_bits, need_cont=not last,
                                           segsum_wpb=segsum_wpb, pairs=pairs)
            denses.append(dense)
    return denses


def _composite_fn(buckets, tids, split, num_docs, blk_bits, windowed,
                  kind, k1, b, segsum_wpb=None):
    """One jit for the entire phrase query (slices+chain+min+similarity).

    Chains of 3+ terms use the merged-space formulation (one sort for the
    whole chain); bigrams keep the pairwise merge (identical cost)."""

    def build():
        def f(hdrs, pays, doc_lens, idf, avgdl, min_blk, max_blk, offs, ns):
            import jax.numpy as jnp

            mb = (min_blk, max_blk) if windowed else (None, None)
            planes = [
                K.take_term_planes(hdrs, pays, offs[i], ns[i], *mb,
                                   bucket=buckets[i], blk_bits=blk_bits)
                for i in range(len(buckets))
            ]
            denses = []
            for direction, idxs in _plan(len(buckets), split):
                sub = [planes[i] for i in idxs]
                stids = [tids[i] for i in idxs]
                if len(sub) >= 3:
                    denses += _merged_chain(sub, stids, direction, num_docs,
                                            blk_bits, segsum_wpb)
                else:
                    denses += _chain_planes(sub, stids, direction, num_docs,
                                            blk_bits, segsum_wpb)
            freqs = denses[0]
            for d in denses[1:]:
                freqs = jnp.minimum(freqs, d)
            return apply_similarity_device(kind, freqs, doc_lens, idf,
                                           avgdl, k1, b)

        return f

    return _cached_jit(
        ("composite", buckets, tids, split, num_docs, blk_bits, windowed,
         kind, k1, b, segsum_wpb),
        build,
    )


TRIM_FACTOR = 20  # reference parity: middle_out.py:66


def trim_spans(index: DeviceIndex, spans):
    """Pre-slice frequent terms to the rarest term's doc-key range.

    The analog of the reference's ``trim_phrase_search``
    (`/root/reference/searcharray/phrase/middle_out.py:44-70`): any term
    more than TRIM_FACTOR times longer than the rarest is narrowed, by a
    binary search on its sorted posting words, to the key window the
    rarest term occupies.  Docs outside that window cannot match the
    phrase (the rarest term's own chain step scores them 0 and the final
    freq is the min over steps), so results are identical while stopword
    buckets shrink to the rare term's neighbourhood.  Used by the sparse
    sort-merge path; the dense engine's cost is posting-size independent.
    """
    lengths = [s[1] for s in spans]
    n_r = min(lengths)
    if n_r == 0 or max(lengths) <= TRIM_FACTOR * n_r:
        return spans
    rarest = int(np.argmin(lengths))
    data = index.postings.data
    off_r = spans[rarest][0]
    lo_word = (int(data[off_r]) >> 36) << 36
    hi_word = ((int(data[off_r + n_r - 1]) >> 36) + 1) << 36
    out = []
    for (off, n, b), L in zip(spans, lengths):
        if L > TRIM_FACTOR * n_r:
            sl = data[off: off + n]
            lo = int(np.searchsorted(sl, np.uint64(lo_word)))
            hi = int(np.searchsorted(sl, np.uint64(hi_word)))
            off, n = off + lo, hi - lo
            b = K.bucket_of(max(1, n))
        out.append((off, n, b))
    return out


def phrase_freqs_dense(index: DeviceIndex, term_ids: List[int],
                       min_posn: Optional[int] = None,
                       max_posn: Optional[int] = None,
                       kind: str = "none", k1: float = 1.2, b: float = 0.75,
                       idf: Optional[float] = None):
    """Dense per-doc exact phrase frequencies or scores.

    Pipelined async per-step dispatches; host blocks only when the caller
    materialises the result."""
    import jax.numpy as jnp

    if len(term_ids) < 2:
        raise ValueError("Must have at least two terms")
    min_blk, max_blk = _window_blocks(min_posn, max_posn)
    windowed = min_posn is not None or max_posn is not None

    spans = [index.term_span(t) for t in term_ids]
    lengths = [s[1] for s in spans]
    if min(lengths) == 0:
        return jnp.zeros(index.corpus_size, dtype=jnp.float32)
    if idf is None:
        idf = host_idf(kind, [index.doc_freqs[t] for t in term_ids],
                       index.corpus_size, index.avg_doc_length)

    num_docs = index.corpus_size
    mbargs = (min_blk, max_blk)
    tids_key = tuple(term_ids.index(t) for t in term_ids)
    split = int(np.argmin(lengths))
    avgdl = np.float32(max(index.avg_doc_length, 1e-38))

    if not windowed:
        # dense block-layout chain (search/dense.py): elementwise, no sorts
        from searcharray_tpu.search import dense as dense_mod

        if (dense_mod.dense_eligible(index)
                and dense_mod.phrase_fits_pool(index, term_ids)):
            return dense_mod.score_phrase_dense(
                index, term_ids, _plan(len(term_ids), split), tids_key,
                kind, k1, b, idf)

    # sparse path from here: bound stopword buckets by the rarest term
    spans = trim_spans(index, spans)

    use_composite = COMPOSITE_MODE == "always" or (
        COMPOSITE_MODE == "auto" and _backend() == "tpu"
    )
    segsum_wpb = _segsum_wpb(index)
    if use_composite:
        buckets = tuple(s[2] for s in spans)
        fn = _composite_fn(buckets, tids_key, split, num_docs,
                           index.blk_bits, windowed, kind, k1, b, segsum_wpb)
        offs = tuple(np.int64(s[0]) for s in spans)
        ns = tuple(np.int64(s[1]) for s in spans)
        return fn(index.hdrs, index.pays, index.doc_lens, np.float32(idf),
                  avgdl, min_blk, max_blk, offs, ns)

    denses = []
    for direction, idxs in _plan(len(term_ids), split):
        denses += _run_chain(index, [spans[i] for i in idxs],
                             [tids_key[i] for i in idxs], direction,
                             mbargs, windowed, segsum_wpb)
    return _minsim_fn(num_docs, len(denses), kind, k1, b)(
        index.doc_lens, np.float32(idf), avgdl, *denses
    )


def _segsum_wpb(index: DeviceIndex):
    """Static per-doc-block word bound for the Pallas segment-sum (None =
    use XLA scatter): in a merge step, one doc contributes at most its
    block count from each side."""
    from searcharray_tpu.search import scoring as _S

    if _S.PALLAS_MODE == "never" or (
        _S.PALLAS_MODE == "auto" and _backend() != "tpu"
    ):
        return None
    blocks_per_doc = -(-int(max(1.0, index._max_doc_len)) // LSB_BITS)
    return 1024 * (2 * blocks_per_doc + 2)


def _backend() -> str:
    import jax

    return jax.default_backend()
