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
