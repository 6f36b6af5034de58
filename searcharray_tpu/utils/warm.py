"""AOT serving warm-up: precompile the serving program set for an index.

First-compile of big-corpus kernels through the TPU tunnel costs 30 s to
minutes per program shape (STATUS round 2).  The XLA compile cache
(.jax_cache/) amortizes them across processes, but a fresh corpus size
pays interactively.  ``warm_serving`` synthesizes a query workload that
covers every program shape the batch driver can mint for this corpus —
term-bucket x candidate-bucket classes, phrase lengths, source mixes,
slop windows, the top-k packers — and runs it once, so the compiles land
in the cache offline and the first live query compiles nothing.

Shape classes are enumerated from host metadata (posting lengths and
docfreqs), not sampled: one representative term per
(expand-bucket, Kc-bucket) class that exists in the vocabulary.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def _shape_reps(dev) -> dict:
    """One representative term id per posting-bucket class (candidate
    buffers share the same bucket, candidates.kc_bucket)."""
    from searcharray_tpu.ops.kernels import expand_bucket_of

    lengths = np.asarray(dev.postings.lengths)
    reps: dict = {}
    for tid in range(len(lengths)):
        n = int(lengths[tid])
        if n == 0:
            continue
        key = expand_bucket_of(n)
        if key not in reps:
            reps[key] = tid
    return reps


def warm_serving(arr, phrase_lens: Sequence[int] = (2, 3, 4, 5),
                 top_k: int = 10, slops: Sequence[int] = (0, 2),
                 batch_sizes: Sequence[int] = (1, 8, 120)) -> int:
    """Precompile the serving programs for ``arr`` (a SearchArray).

    Returns the number of distinct warm queries issued.  Safe to call on
    a live index; results are discarded.  Covers:

    * one term query per (posting-bucket, candidate-bucket) class;
    * phrases of each length mixing the hottest terms (pool sources at
      scale) with each class representative (mini sources), in both
      positions;
    * the same shapes at each requested ``slop`` (span kernels);
    * each requested batch size (query-axis padding variants) and the
      fused top-k packers.
    """
    dev = arr.dev
    vocab = dev.vocab
    dfs = np.asarray(dev.doc_freqs)
    if not len(dfs) or dev.avg_doc_length == 0:
        return 0
    reps = _shape_reps(dev)
    hot_tids = list(np.argsort(dfs)[::-1][:4])
    hot = [vocab.get_term(int(t)) for t in hot_tids if dfs[int(t)] > 0]
    if not hot:
        return 0

    queries: list = []
    rep_terms = [vocab.get_term(int(t)) for t in reps.values()]
    queries += rep_terms
    queries += hot[:2]
    for L in phrase_lens:
        base = (hot * L)[:L]
        queries.append(base)  # all-hot phrase (pool planes / dphrase)
        for r in rep_terms:
            queries.append([r] + base[: L - 1])   # rep leads (rows source)
            queries.append(base[: L - 1] + [r])   # rep trails
    seen: set = set()
    uniq: list = []
    for q in queries:
        kq = q if isinstance(q, str) else tuple(q)
        if kq not in seen:
            seen.add(kq)
            uniq.append(q)

    n = 0
    for slop in slops:
        for bs in batch_sizes:
            for c0 in range(0, len(uniq), bs):
                chunk = uniq[c0: c0 + bs]
                if slop > 0:
                    chunk = [q for q in chunk if not isinstance(q, str)]
                    if not chunk:
                        continue
                out = arr.score_batch(chunk, top_k=top_k, slop=slop)
                n += len(chunk)
    # mixed-slop batches fuse exact and slop specs into ONE super program
    # (per-query slop, search/batch.py) — warm that composition too
    pos_slops = [s for s in slops if s > 0]
    if pos_slops:
        phrases = [q for q in uniq if not isinstance(q, str)]
        for bs in batch_sizes:
            mixed = (uniq + phrases)[: max(bs, len(uniq) + len(phrases))]
            mixed_slops = [0] * len(uniq) + [pos_slops[0]] * len(phrases)
            for c0 in range(0, len(mixed), bs):
                chunk = mixed[c0: c0 + bs]
                chunk_slops = mixed_slops[c0: c0 + bs]
                out = arr.score_batch(chunk, top_k=top_k, slop=chunk_slops)
                n += len(chunk)
    # the packed result is tiny; force materialization so every compile
    # actually ran (tunnel defers until a host transfer)
    if isinstance(out, tuple):
        np.asarray(out[0])
    return n
