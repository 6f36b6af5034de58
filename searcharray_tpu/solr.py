"""Solr edismax query composition over SearchArray dataframe columns.

Behavioural parity with the reference (`/root/reference/searcharray/solr.py`):
mm spec parsing (including conditional ``n<m`` clauses and percentages),
``field^boost`` lists, term-centric vs field-centric dispatch, tie breaking,
and pf/pf2/pf3 phrase boosts computed only over rows that matched the main
query.  Scores are composed from dense per-field vectors produced on device.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from searcharray_tpu.pandas_ext.array import SearchArray
from searcharray_tpu.search.similarity import Similarity, default_bm25


def _mm_int(value: str) -> int:
    try:
        return int(value)
    except ValueError:
        raise ValueError("Invalid 'mm' spec. Expecting an integer.")


def parse_min_should_match(num_clauses: int, spec: str) -> int:
    """Parse Solr's minimum-should-match spec into a clause count.

    Supports plain integers ("3"), negatives ("-2" = all but two),
    percentages ("75%", "-25%"), and conditional chains ("2<2 5<3 7<40%":
    each "n<expr" applies when there are more than n clauses).
    Semantics follow Solr's SolrPluginUtils.calculateMinShouldMatch.
    """
    spec = spec.strip()

    # Conditional chain: evaluate left to right; the last clause whose
    # bound is exceeded wins. <= bound means "use everything so far".
    if "<" in spec:
        selected = num_clauses
        for cond in re.sub(r"\s*<\s*", "<", spec).split():
            bound_s, _, expr = cond.partition("<")
            if not expr:
                raise ValueError(
                    f"Invalid 'mm' spec: '{cond}'. "
                    "Expecting values before and after '<'"
                )
            if num_clauses <= _mm_int(bound_s):
                return selected
            selected = parse_min_should_match(num_clauses, expr)
        return selected

    if spec.endswith("%"):
        pct = _mm_int(spec[:-1])
        scaled = num_clauses * pct / 100
        required = num_clauses + int(scaled) if scaled < 0 else int(scaled)
    else:
        fixed = _mm_int(spec)
        required = num_clauses + fixed if fixed < 0 else fixed

    return min(num_clauses, max(required, 0))


def parse_field_boosts(field_lists: List[str]) -> dict:
    """Parse ``field^2.0`` style boost lists for qf/pf/pf2/pf3."""
    if not field_lists:
        return {}
    out = {}
    for field in field_lists:
        parts = re.split(r"\^", field)
        out[parts[0]] = None if len(parts) == 1 else float(parts[1])
    return out


def get_field(frame, field) -> SearchArray:
    if field not in frame.columns:
        raise ValueError(f"Field {field} not in dataframe")
    if not isinstance(frame[field].array, SearchArray):
        raise ValueError(f"Field {field} is not a searcharray field")
    return frame[field].array


def parse_query_terms(frame: pd.DataFrame, query: str, query_fields: List[str]):
    search_terms: Dict[str, List[str]] = {}
    num_search_terms = 0
    term_centric = True
    for field in query_fields:
        arr = get_field(frame, field)
        terms = list(arr.tokenizer(query))
        search_terms[field] = terms
        if num_search_terms == 0:
            num_search_terms = len(terms)
        elif len(terms) != num_search_terms:
            term_centric = False
    return num_search_terms, search_terms, term_centric


def _boost_val(boost) -> float:
    return 1.0 if boost is None else boost


def _boost_exp(boost) -> str:
    return f"{boost}" if boost is not None else "1"


_compose_cache: dict = {}


def _compose_tc_jit(F: int, tie: float, msm: int):
    """Jitted term-centric dismax: (F x [T, N] stacks, boosts[F]) -> [N].

    One program instead of ~10 eager dispatches — eager composition cost
    ~15 ms host + per-op tunnel enqueues per query (measured in the
    round-5 edismax profile)."""
    key = ("tc", F, tie, msm)
    fn = _compose_cache.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        def f(stacks, boosts):
            fs = jnp.stack(stacks) * boosts[:, None, None]
            mx = fs.max(axis=0)
            sm = fs.sum(axis=0)
            ts = mx + (sm - mx) * np.float32(tie)  # [T, N]
            matches = (ts > 0).sum(axis=0) >= msm
            return jnp.where(matches, ts.sum(axis=0), np.float32(0.0))

        fn = jax.jit(f)
        _compose_cache[key] = fn
    return fn


def _compose_fc_jit(F: int, tie: float, msms: tuple):
    """Jitted field-centric dismax: per-field mm over its own term count
    (msms[i]), then dismax/tie across fields."""
    key = ("fc", F, tie, msms)
    fn = _compose_cache.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        def f(stacks, boosts):
            sums = []
            for i, ts in enumerate(stacks):
                matches = (ts > 0).sum(axis=0) >= msms[i]
                sums.append(jnp.where(matches, ts.sum(axis=0),
                                      np.float32(0.0)) * boosts[i])
            stack = jnp.stack(sums)
            sm = stack.sum(axis=0)
            mx = stack.max(axis=0)
            return mx + (sm - mx) * np.float32(tie)

        fn = jax.jit(f)
        _compose_cache[key] = fn
    return fn


def _edismax_term_centric(frame, query_fields, num_search_terms, search_terms,
                          mm, tie, similarity) -> Tuple[np.ndarray, str]:
    """Device-side term-centric composition: one batched program per field
    scores all query terms at once (search/batch.py), then ONE jitted
    dismax/tie/mm program composes them — no host transfer here at all."""
    import jax.numpy as jnp

    stacks, boosts = [], []
    for field, boost in query_fields.items():
        arr = get_field(frame, field)
        stacks.append(arr.score_batch_device(search_terms[field],
                                             similarity=similarity[field]))
        boosts.append(_boost_val(boost))
    min_should_match = parse_min_should_match(num_search_terms, spec=mm)
    qf_scores = _compose_tc_jit(len(stacks), float(tie), min_should_match)(
        tuple(stacks), jnp.asarray(boosts, jnp.float32))

    explain = []
    for term_posn in range(num_search_terms):
        term_explain = [
            f"{field}:{search_terms[field][term_posn]}^{_boost_exp(boost)}"
            for field, boost in query_fields.items()
        ]
        explain.append("(" + " | ".join(term_explain) + ")")
    return qf_scores, "(" + " ".join(explain) + f")~{min_should_match}"


def _edismax_field_centric(frame, query_fields, num_search_terms, search_terms,
                           mm, tie, similarity) -> Tuple[np.ndarray, str]:
    """Device-side field-centric composition (see _edismax_term_centric)."""
    import jax.numpy as jnp

    stacks, boosts, msms = [], [], []
    explain = []
    for field, boost in query_fields.items():
        post_arr = get_field(frame, field)
        stacks.append(post_arr.score_batch_device(
            search_terms[field], similarity=similarity[field]))
        min_should_match = parse_min_should_match(len(search_terms[field]), spec=mm)
        exp = " ".join([f"{field}:{term}" for term in search_terms[field]])
        exp = "(" + exp + f")~{min(min_should_match, len(search_terms[field]))}"
        exp = "(" + exp + f")^{_boost_exp(boost)}"
        msms.append(min(min_should_match, len(search_terms[field])))
        boosts.append(_boost_val(boost))
        explain.append(exp)
    qf_scores = _compose_fc_jit(len(stacks), float(tie), tuple(msms))(
        tuple(stacks), jnp.asarray(boosts, jnp.float32))
    return qf_scores, " | ".join(explain)


# Candidate-row phrase phases engage above this corpus size when the
# main query matched at most 1/PHASE_SUBSET_MAX_FRAC of the docs — the
# reference's cost contract (phrase phases proportional to matches,
# solr.py:328-338).  Below the threshold the full-corpus mask is cheaper
# than the extra host round trip for the match set.
PHASE_SUBSET_MIN_DOCS = 1 << 17
PHASE_SUBSET_MAX_FRAC = 8
# Optimistic packed-rows cap: the match set comes back as ONE transfer of
# (count, first PHASE_ROWS_CAP matched ids) — 256 KB — instead of a dense
# bool[N] (8.8 MB at 8.8M docs, ~300 ms through the ~30 MB/s tunnel).
# Counts in (cap, N/8] pay one more count-sized fetch; counts above N/8
# fall back to the mask path with no second transfer at all.
PHASE_ROWS_CAP = 1 << 16

_rows_cache: dict = {}


def _packed_rows_jit(n: int, cap: int):
    """count + first ``cap`` matched doc ids, packed in one int32 wire."""
    key = (n, cap)
    fn = _rows_cache.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        def f(qf):
            pos = qf > 0
            cnt = pos.sum().astype(jnp.int32)
            (idx,) = jnp.nonzero(pos, size=cap, fill_value=n)
            return jnp.concatenate([cnt[None], idx.astype(jnp.int32)])

        fn = jax.jit(f)
        _rows_cache[key] = fn
    return fn


def _phase_candidate_rows(qf_scores) -> Optional[np.ndarray]:
    """Doc ids matched by the main query, or None when subset scoring
    would not pay (small corpus / broad match / no matches)."""
    n = int(qf_scores.shape[0])
    if n < PHASE_SUBSET_MIN_DOCS:
        return None
    if isinstance(qf_scores, np.ndarray):
        matched = np.flatnonzero(qf_scores > 0)
        if len(matched) == 0 or len(matched) * PHASE_SUBSET_MAX_FRAC > n:
            return None
        return matched
    cap = min(PHASE_ROWS_CAP, n)
    wire = np.asarray(_packed_rows_jit(n, cap)(qf_scores))
    count = int(wire[0])
    if count == 0 or count * PHASE_SUBSET_MAX_FRAC > n:
        return None
    if count <= cap:
        return wire[1: 1 + count].astype(np.int64)
    # middle zone: one more fetch, sized to the actual count
    from searcharray_tpu.ops.kernels import bucket_of

    cap2 = min(bucket_of(count), n)
    wire2 = np.asarray(_packed_rows_jit(n, cap2)(qf_scores))
    return wire2[1: 1 + count].astype(np.int64)


def _ngram_phases(frame, search_terms, phases, similarity,
                  rows: Optional[np.ndarray] = None):
    """pf / pf2 / pf3 scoring — all phases batched per FIELD.

    ``phases`` is a list of (fields, ngram, slop): ngram=0 means the
    whole phrase, 2/3 the bigram/trigram phases; ``slop`` wires the Solr
    ps/ps2/ps3 parameters (the reference accepts but never applies them,
    solr.py:178-248).  A field appearing in several phases scores ALL
    its grams in ONE device batch (per-query slop, search/batch.py) —
    one pool-fill wave and program set per field instead of one per
    (field, phase).  Results stay on device ([N] or rows-shaped).

    With ``rows`` (the main query's matched docs) a phase's grams score
    only those rows — compute proportional to matches, not corpus (the
    reference's cost contract, solr.py:328-338) — on a single chip AND on
    a mesh (each shard scores its local slice of the rows).  Slop phases
    and non-fused similarities keep the full-corpus mask-after path,
    which is numerically identical (per-row phrase scores are
    independent and use whole-index stats).

    Returns a list of (total, explain, rows_used) per phase."""
    n_ph = len(phases)
    rows_p: List[Optional[np.ndarray]] = []
    for fields, _ngram, slop in phases:
        use = rows
        if use is not None and (slop != 0 or any(
                getattr(similarity.get(f, default_bm25), "_fused",
                        None) is None
                for f in fields)):
            use = None
        rows_p.append(use)

    # per (field, rows-mode): concatenated grams + slops + segment map
    calls: dict = {}
    for pi, (fields, ngram, slop) in enumerate(phases):
        min_terms = ngram if ngram else 2
        for field, boost in fields.items():
            terms = search_terms[field]
            if len(terms) < min_terms:
                continue
            if ngram == 0:
                grams = [terms]
            else:
                grams = [terms[i: i + ngram]
                         for i in range(len(terms) - ngram + 1)]
            mode = rows_p[pi] is not None
            ent = calls.setdefault((field, mode),
                                   {"grams": [], "slops": [], "segs": []})
            ent["segs"].append((pi, field, boost, ngram, slop,
                                len(ent["grams"]), len(grams)))
            ent["grams"] += grams
            ent["slops"] += [slop] * len(grams)

    totals: List[Optional[object]] = [None] * n_ph
    explains: List[str] = [""] * n_ph
    for (field, mode), ent in calls.items():
        arr = get_field(frame, field)
        gram_scores = arr.score_batch_device(
            ent["grams"], similarity=similarity[field], slop=ent["slops"],
            rows=rows if mode else None)
        for pi, _f, boost, ngram, slop, g0, gn in ent["segs"]:
            seg = gram_scores[g0: g0 + gn]
            contrib = seg.sum(axis=0)
            if ngram == 2 and gn:
                # parity quirk: the reference double-appends the final
                # bigram (solr.py:221)
                contrib = contrib + seg[-1]
            contrib = contrib * np.float32(_boost_val(boost))
            totals[pi] = contrib if totals[pi] is None else totals[pi] + contrib
            for gram in ent["grams"][g0: g0 + gn]:
                slop_exp = f"~{slop}" if slop else ""
                explains[pi] += (f" ({field}:\"{' '.join(gram)}\""
                                 f"{slop_exp})^{_boost_exp(boost)}")
    return [(totals[pi], explains[pi],
             rows_p[pi] if totals[pi] is not None else None)
            for pi in range(n_ph)]


_finish_cache: dict = {}


def _finish_jit(n: int, k: Optional[int], n_mask: int, n_rows: int,
                cp: Optional[int]):
    """Jitted edismax finisher: fold the phase boosts into the main
    scores and (with k) pack the device top-k into one int32[2k] wire
    (score bits ‖ doc indices) — ONE program + ONE transfer for the
    whole tail.  The qf>0 mask is computed once from the input: phase
    boosts are non-negative and only ever add at already-positive rows,
    so positivity is invariant across folds."""
    key = (n, k, n_mask, n_rows, cp)
    fn = _finish_cache.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        from searcharray_tpu.ops.kernels import topk_exact

        def f(qf, mask_extras, rows, rows_extras):
            pos = qf > 0
            for e in mask_extras:
                qf = qf + jnp.where(pos, e, np.float32(0.0))
            for e in rows_extras:
                qf = qf.at[rows].add(e)
            if k is None:
                return qf
            v, i = topk_exact(qf, k)
            return jnp.concatenate(
                [jax.lax.bitcast_convert_type(v, jnp.int32),
                 i.astype(jnp.int32)])

        fn = jax.jit(f)
        _finish_cache[key] = fn
    return fn


def edismax(frame: pd.DataFrame, q: str, qf: List[str],
            mm: Optional[Union[str, int]] = None,
            pf: Optional[List[str]] = None,
            pf2: Optional[List[str]] = None,
            pf3: Optional[List[str]] = None,
            ps2: int = 0, ps3: int = 0, ps: int = 0,
            tie: float = 0.0, q_op: str = "OR",
            similarity: Union[Similarity, Dict[str, Similarity]] = default_bm25,
            top_k: Optional[int] = None,
            ) -> Tuple[np.ndarray, str]:
    """Run an edismax query over a dataframe with SearchArray columns.

    Returns (scores, explain string).  With ``top_k`` set, returns
    ``((scores float32[k], row indices int64[k]), explain)`` instead: the
    k-selection runs on device so only 2k values cross back to the host —
    the ranked-retrieval serving path (a full dense vector at 8.8M docs is
    a ~35 MB transfer; the packed top-k is ~80 bytes).  Extension over the
    reference's API (which always returns the dense vector)."""

    def listify(x):
        return x if isinstance(x, list) else [x]

    query_fields = parse_field_boosts(listify(qf))
    phrase_fields = parse_field_boosts(listify(pf)) if pf else {}
    if mm is None:
        mm = "1"
    if isinstance(mm, int):
        mm = f"{mm}"
    if q_op == "AND":
        mm = "100%"

    if not isinstance(similarity, dict):
        similarity = {field: similarity for field in query_fields}
    for field in query_fields:
        if field not in similarity:
            similarity[field] = default_bm25

    bigram_fields = parse_field_boosts(pf2) if pf2 else {}
    trigram_fields = parse_field_boosts(pf3) if pf3 else {}

    num_search_terms, search_terms, term_centric = parse_query_terms(
        frame, q, list(query_fields.keys())
    )
    if term_centric:
        qf_scores, explain = _edismax_term_centric(
            frame, query_fields, num_search_terms, search_terms, mm,
            tie=tie, similarity=similarity,
        )
    else:
        qf_scores, explain = _edismax_field_centric(
            frame, query_fields, num_search_terms, search_terms, mm,
            tie=tie, similarity=similarity,
        )

    # Phrase phases contribute only at rows matched by the main query.
    # At scale the matched rows are computed once and the grams score only
    # those docs (the reference's candidate pruning, solr.py:328-338);
    # otherwise a device mask after full-corpus scoring — numerically
    # identical either way (per-row phrase scores are independent and use
    # whole-index stats).
    import jax.numpy as jnp

    rows = None
    if phrase_fields or bigram_fields or trigram_fields:
        rows = _phase_candidate_rows(qf_scores)

    phase_results = _ngram_phases(
        frame, search_terms,
        [(phrase_fields, 0, ps), (bigram_fields, 2, ps2),
         (trigram_fields, 3, ps3)],
        similarity, rows,
    )
    (phrase_scores, pf_explain, pf_rows) = phase_results[0]
    (bigram_scores, pf2_explain, pf2_rows) = phase_results[1]
    (trigram_scores, pf3_explain, pf3_rows) = phase_results[2]
    explain += pf_explain + pf2_explain + pf3_explain

    mask_extras, rows_extras, rows_dev = [], [], None
    for extra, extra_rows in ((phrase_scores, pf_rows),
                              (bigram_scores, pf2_rows),
                              (trigram_scores, pf3_rows)):
        if extra is None:
            continue
        if extra_rows is not None:
            # extra is rows-shaped; qf_scores > 0 exactly at these rows,
            # so a scatter-add is the masked add
            if rows_dev is None:
                rows_dev = jnp.asarray(extra_rows.astype(np.int32))
            rows_extras.append(extra)
        else:
            mask_extras.append(extra)

    if isinstance(qf_scores, np.ndarray):  # host fallback path
        pos = qf_scores > 0
        for e in mask_extras:
            qf_scores = qf_scores + np.where(pos, np.asarray(e),
                                             np.float32(0.0))
        for e in rows_extras:
            np.add.at(qf_scores, np.asarray(rows_dev), np.asarray(e))
        if top_k is not None:
            k = min(top_k, int(qf_scores.shape[0]))
            idx = np.argsort(qf_scores)[::-1][:k]
            return (qf_scores[idx].astype(np.float32),
                    idx.astype(np.int64)), explain
        return qf_scores.astype(np.float32), explain

    n = int(qf_scores.shape[0])
    k = None if top_k is None else min(top_k, n)
    cp = None if rows_dev is None else int(rows_dev.shape[0])
    out = _finish_jit(n, k, len(mask_extras), len(rows_extras), cp)(
        qf_scores, tuple(mask_extras), rows_dev, tuple(rows_extras))
    if top_k is None:
        # the single host transfer for the whole query
        return np.asarray(out, dtype=np.float32), explain
    # ONE host transfer: scores bitcast beside indices in a single
    # int32[2k] wire (two separate np.asarray calls cost two ~30 ms
    # tunnel round trips — measured 116 ms of a 150 ms warm edismax)
    wire = np.asarray(out)
    return (wire[:k].view(np.float32).copy(),
            wire[k:].astype(np.int64)), explain


def _compose_batch_jit(n: int, F: int, ckey: tuple, tie: float, Cp: int):
    """Jitted batched dismax compose for one query class.

    ``ckey`` is ("tc", T, msm) or ("fc", (T per field), (msm per field)).
    Takes (per-field [G_f, N] term-score stacks, starts int32[Cp, F],
    boosts f32[F]) and returns f32[Cp, N] — each row the composed main
    score of one query, sliced out of the shared stacks (a query's terms
    are contiguous per field).  ``lax.map`` over the class keeps temps at
    one query's [F, T, N] instead of materializing [Cp, F, T, N]."""
    key = ("cb", n, F, ckey, tie, Cp)
    fn = _compose_cache.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        tc = ckey[0] == "tc"

        def f(stacks, starts, boosts):
            def one(st_row):
                if tc:
                    _, T, msm = ckey
                    fs = jnp.stack([
                        jax.lax.dynamic_slice(stacks[fi], (st_row[fi], 0),
                                              (T, n)) * boosts[fi]
                        for fi in range(F)])          # [F, T, N]
                    mx = fs.max(axis=0)
                    sm = fs.sum(axis=0)
                    ts = mx + (sm - mx) * np.float32(tie)
                    matches = (ts > 0).sum(axis=0) >= msm
                    return jnp.where(matches, ts.sum(axis=0),
                                     np.float32(0.0))
                _, Ts, msms = ckey
                sums = []
                for fi in range(F):
                    ts = jax.lax.dynamic_slice(stacks[fi], (st_row[fi], 0),
                                               (Ts[fi], n))
                    m = (ts > 0).sum(axis=0) >= msms[fi]
                    sums.append(jnp.where(m, ts.sum(axis=0),
                                          np.float32(0.0)) * boosts[fi])
                stk = jnp.stack(sums)
                sm = stk.sum(axis=0)
                mx = stk.max(axis=0)
                return mx + (sm - mx) * np.float32(tie)

            return jax.lax.map(one, starts)

        fn = jax.jit(f)
        _compose_cache[key] = fn
    return fn


def _finish_batch_jit(n: int, k: Optional[int], c_shapes: tuple,
                      g_shapes: tuple, has_zero: bool):
    """Jitted batched edismax finisher: concat the class compose outputs,
    reorder to query order, fold every phase gram's contribution in one
    MXU matmul (W[Q, Gtot] @ grams[Gtot, N], per-gram boosts and the
    double-final-bigram quirk folded into W), mask to main-query matches,
    and (with k) pack the per-row exact top-k into one int32[Q, 2k] wire
    — the batch's single host transfer."""
    key = ("fb", n, k, c_shapes, g_shapes, has_zero)
    fn = _finish_cache.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        from searcharray_tpu.search.batch import _pack_topk

        def f(class_outs, order, gram_stacks, W):
            if not class_outs:
                qf = jnp.zeros((0, n), jnp.float32)
            else:
                qf = (class_outs[0] if len(class_outs) == 1
                      else jnp.concatenate(class_outs, axis=0))
            if has_zero:
                qf = jnp.concatenate(
                    [qf, jnp.zeros((1, n), jnp.float32)], axis=0)
            qf = jnp.take(qf, order, axis=0)            # [Q, N]
            if gram_stacks:
                grams = (gram_stacks[0] if len(gram_stacks) == 1
                         else jnp.concatenate(gram_stacks, axis=0))
                extras = W @ grams                      # [Q, N] on the MXU
                qf = qf + jnp.where(qf > 0, extras, np.float32(0.0))
            if k is None:
                return qf
            return _pack_topk(qf, k)

        fn = jax.jit(f)
        _finish_cache[key] = fn
    return fn


# lax.map trip-count ladder for compose classes: pad the per-class query
# count so a serving tail's varying class sizes reuse a handful of
# programs instead of minting one per count
_CLASS_LADDER = (1, 2, 4, 8, 16, 32, 64, 128)


def _class_pad(c: int) -> int:
    for p in _CLASS_LADDER:
        if c <= p:
            return p
    return c


def edismax_batch(frame: pd.DataFrame, queries: List[str], qf: List[str],
                  mm: Optional[Union[str, int]] = None,
                  pf: Optional[List[str]] = None,
                  pf2: Optional[List[str]] = None,
                  pf3: Optional[List[str]] = None,
                  ps2: int = 0, ps3: int = 0, ps: int = 0,
                  tie: float = 0.0, q_op: str = "OR",
                  similarity: Union[Similarity,
                                    Dict[str, Similarity]] = default_bm25,
                  top_k: Optional[int] = None,
                  ) -> Tuple[object, List[str]]:
    """Run one edismax configuration over a BATCH of query strings.

    Numerically identical to calling :func:`edismax` per query (the
    differential is pinned in tests/test_solr.py), but the whole batch
    runs as a handful of device programs with ONE blocking transfer:

    - main query: per field, every query's terms score in one
      ``score_batch_device`` call (the grouped batch driver);
    - dismax/tie/mm composition: queries grouped by (term count, mm)
      class, one ``lax.map`` program per class over the shared stacks;
    - pf/pf2/pf3 grams: per field, all queries' grams in one batched
      call (mask-composition — per-row phrase scores are independent, so
      masking by the query's own matches equals the scalar path's
      candidate-rows pruning);
    - finish: one program folds every gram into its query via an MXU
      matmul, masks, and packs the per-query top-k wire.

    A blocking scalar ``edismax`` costs 2 tunnel round trips plus ~8
    program enqueues (~300 ms warm at 8.8M docs); this path amortizes
    those across the batch.  Falls back to the scalar loop for custom
    (non-fused) similarities, sharded or sliced fields.

    Returns ``((scores f32[Q, k], indices i64[Q, k]), explains)`` with
    ``top_k``, else ``(scores f32[Q, N], explains)``.  Queries that
    tokenize to no terms score 0 everywhere.
    """
    def listify(x):
        return x if isinstance(x, list) else [x]

    query_fields = parse_field_boosts(listify(qf))
    phrase_fields = parse_field_boosts(listify(pf)) if pf else {}
    if mm is None:
        mm = "1"
    if isinstance(mm, int):
        mm = f"{mm}"
    if q_op == "AND":
        mm = "100%"
    if not isinstance(similarity, dict):
        similarity = {field: similarity for field in query_fields}
    for field in query_fields:
        if field not in similarity:
            similarity[field] = default_bm25
    bigram_fields = parse_field_boosts(pf2) if pf2 else {}
    trigram_fields = parse_field_boosts(pf3) if pf3 else {}
    phases = [(phrase_fields, 0, ps), (bigram_fields, 2, ps2),
              (trigram_fields, 3, ps3)]

    all_fields = set(query_fields)
    for fields, _, _ in phases:
        all_fields |= set(fields)

    def _fallback():
        outs = [edismax(frame, q, qf=qf, mm=mm, pf=pf, pf2=pf2, pf3=pf3,
                        ps2=ps2, ps3=ps3, ps=ps, tie=tie, q_op=q_op,
                        similarity=similarity, top_k=top_k)
                for q in queries]
        explains = [e for _, e in outs]
        if top_k is None:
            return np.stack([s for s, _ in outs]), explains
        return ((np.stack([s for (s, _i), _ in outs]),
                 np.stack([i for (_s, i), _ in outs])), explains)

    for field in all_fields:
        arr = get_field(frame, field)
        sim = similarity.get(field, default_bm25)
        if (getattr(sim, "_fused", None) is None
                or arr._state.sharded is not None or arr.subset
                or len(arr.rows) != arr.corpus_size):
            return _fallback()
    if not queries:
        n0 = len(frame)
        if top_k is None:
            return np.zeros((0, n0), np.float32), []
        return ((np.zeros((0, top_k), np.float32),
                 np.zeros((0, top_k), np.int64)), [])

    import jax.numpy as jnp

    Q = len(queries)
    field_order = list(query_fields)
    parsed = [parse_query_terms(frame, q, field_order) for q in queries]

    # ---- stage 1: every query's single terms, one batched device call
    # per field (grouped programs; stacks stay in HBM) -----------------
    terms_by_field: Dict[str, list] = {f: [] for f in field_order}
    starts = np.zeros((Q, len(field_order)), np.int32)
    for qi, (_n, st, _tc) in enumerate(parsed):
        for fi, field in enumerate(field_order):
            starts[qi, fi] = len(terms_by_field[field])
            terms_by_field[field] += [[t] for t in st[field]]
    stacks = []
    for field in field_order:
        arr = get_field(frame, field)
        terms = terms_by_field[field]
        if terms:
            stacks.append(arr.score_batch_device(
                terms, similarity=similarity[field]))
        else:
            stacks.append(jnp.zeros((1, len(arr)), jnp.float32))

    # ---- stage 2: group queries by compose class, one program each ---
    classes: Dict[tuple, list] = {}
    zero_qis = []
    msm_of = np.zeros(Q, np.int32)
    for qi, (num_terms, st, tc) in enumerate(parsed):
        if num_terms == 0 or all(len(st[f]) == 0 for f in field_order):
            zero_qis.append(qi)
            continue
        if tc:
            msm = parse_min_should_match(num_terms, spec=mm)
            msm_of[qi] = msm
            ckey = ("tc", num_terms, msm)
        else:
            Ts = tuple(len(st[f]) for f in field_order)
            msms = tuple(min(parse_min_should_match(t, spec=mm), t)
                         for t in Ts)
            ckey = ("fc", Ts, msms)
        classes.setdefault(ckey, []).append(qi)

    n = len(frame)
    F = len(field_order)
    boosts_dev = jnp.asarray(
        [_boost_val(query_fields[f]) for f in field_order], jnp.float32)
    class_outs = []
    order = np.zeros(Q, np.int32)
    row = 0
    for ckey, qis in classes.items():
        Cp = _class_pad(len(qis))
        st_rows = np.zeros((Cp, F), np.int32)
        st_rows[: len(qis)] = starts[qis]
        # pad rows re-run query 0 of the class; discarded by `order`
        st_rows[len(qis):] = st_rows[0]
        out = _compose_batch_jit(n, F, ckey, float(tie), Cp)(
            tuple(stacks), jnp.asarray(st_rows), boosts_dev)
        for j, qi in enumerate(qis):
            order[qi] = row + j
        row += Cp
        class_outs.append(out)
    has_zero = bool(zero_qis)
    for qi in zero_qis:
        order[qi] = row  # the appended all-zeros row

    # ---- stage 3: every query's phase grams, one batched device call
    # per field (mask composition; per-row phrase scores are independent
    # of the row set, so masking == the scalar rows= pruning) ----------
    gram_calls: Dict[str, dict] = {}
    explains = []
    for qi, (num_terms, st, tc) in enumerate(parsed):
        # main-query explain, identical to the scalar paths
        if tc:
            exp = []
            for term_posn in range(num_terms):
                exp.append("(" + " | ".join(
                    f"{field}:{st[field][term_posn]}"
                    f"^{_boost_exp(boost)}"
                    for field, boost in query_fields.items()) + ")")
            explain = ("(" + " ".join(exp) + f")~{int(msm_of[qi])}")
        else:
            exp = []
            for field, boost in query_fields.items():
                msm = min(parse_min_should_match(len(st[field]), spec=mm),
                          len(st[field]))
                e = " ".join(f"{field}:{t}" for t in st[field])
                exp.append(f"(({e})~{msm})^{_boost_exp(boost)}")
            explain = " | ".join(exp)
        for fields, ngram, slop in phases:
            min_terms = ngram if ngram else 2
            for field, boost in fields.items():
                terms = st[field]
                if len(terms) < min_terms:
                    continue
                grams = ([terms] if ngram == 0 else
                         [terms[i: i + ngram]
                          for i in range(len(terms) - ngram + 1)])
                ent = gram_calls.setdefault(
                    field, {"grams": [], "slops": [], "w": [], "qmap": []})
                for gi, gram in enumerate(grams):
                    w = _boost_val(boost)
                    if ngram == 2 and gi == len(grams) - 1:
                        w *= 2.0  # reference double-appends the final
                        # bigram (solr.py:221)
                    ent["grams"].append(gram)
                    ent["slops"].append(slop)
                    ent["w"].append(w)
                    ent["qmap"].append(qi)
                    slop_exp = f"~{slop}" if slop else ""
                    explain += (f" ({field}:\"{' '.join(gram)}\""
                                f"{slop_exp})^{_boost_exp(boost)}")
        explains.append(explain)

    gram_stacks = []
    W_cols = []
    for field, ent in gram_calls.items():
        arr = get_field(frame, field)
        gram_stacks.append(arr.score_batch_device(
            ent["grams"], similarity=similarity.get(field, default_bm25),
            slop=ent["slops"]))
        W_cols.append((ent["qmap"], ent["w"]))
    Gtot = sum(gs.shape[0] for gs in gram_stacks)
    W = np.zeros((Q, Gtot), np.float32)
    g0 = 0
    for (qmap, ws), gs in zip(W_cols, gram_stacks):
        for j, (qi, w) in enumerate(zip(qmap, ws)):
            W[qi, g0 + j] = w
        g0 += int(gs.shape[0])

    # ---- stage 4: one finishing program, one host transfer -----------
    k = None if top_k is None else min(top_k, n)
    c_shapes = tuple(int(o.shape[0]) for o in class_outs)
    g_shapes = tuple(int(gs.shape[0]) for gs in gram_stacks)
    out = _finish_batch_jit(n, k, c_shapes, g_shapes, has_zero)(
        tuple(class_outs), jnp.asarray(order), tuple(gram_stacks),
        jnp.asarray(W))
    wire = np.asarray(out)
    if top_k is None:
        return wire.astype(np.float32, copy=False), explains
    return ((np.ascontiguousarray(wire[:, :k]).view(np.float32),
             wire[:, k:].astype(np.int64)), explains)
