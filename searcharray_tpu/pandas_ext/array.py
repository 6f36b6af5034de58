"""Pandas ExtensionArray facade over the TPU index.

API parity with the reference's `searcharray/postings.py` (`Terms`,
`TermsDtype`, `SearchArray`): same constructors, indexing semantics,
search methods (`termfreqs/docfreq/doclengths/score/positions`) and
extension-dtype registration — but backed by the device index; search
methods run fused XLA kernels over the whole corpus and only gather the
view's rows at the end.
"""
from __future__ import annotations

import json
import numbers
import warnings
from collections import Counter
from typing import Iterable, List, Optional, Union

import numpy as np
import pandas as pd
from pandas.api.extensions import (
    ExtensionArray,
    ExtensionDtype,
    no_default,
    register_extension_dtype,
    take as pd_take,
)
from pandas.api.types import is_list_like

from searcharray_tpu.index.builder import (
    BuiltIndex,
    build_index,
    build_index_from_terms,
    replace_docs,
    ws_tokenizer,
)
from searcharray_tpu.index.device import DeviceIndex
from searcharray_tpu.index.vocab import TermMissingError
from searcharray_tpu.ops import encoding as enc
from searcharray_tpu.search import (
    batch as batch_mod,
    phrase as phrase_mod,
    scoring,
    spans as spans_mod,
)
from searcharray_tpu.search.similarity import Similarity, default_bm25


_topk_cache: dict = {}


def _topk_jit(num_docs: int, k: int):
    import jax

    key = (num_docs, k)
    fn = _topk_cache.get(key)
    if fn is None:
        from searcharray_tpu.ops.kernels import topk_exact

        fn = jax.jit(lambda dense: topk_exact(dense, k))
        _topk_cache[key] = fn
    return fn


def _bytes_h(num_bytes):
    suffixes = ["B", "KB", "MB", "GB", "TB", "PB"]
    i = 0
    num = float(num_bytes)
    while num >= 1024 and i < len(suffixes) - 1:
        num /= 1024.0
        i += 1
    return f"{num:.2f} {suffixes[i]}"


class Terms:
    """One indexed doc: a bag of term -> tf plus optional positions."""

    def __init__(self, postings, doc_len: int = 0, posns: Optional[dict] = None,
                 encoded=False):
        self.postings = postings
        self.doc_len = doc_len
        self.posns = posns
        self.encoded = encoded

    def termfreq(self, token):
        return self.postings[token]

    def terms(self):
        return self.postings.items()

    @staticmethod
    def _decode(words):
        from searcharray_tpu.ops import encoding as enc

        _, p = enc.decode_words(np.asarray(words, dtype=np.uint64))
        return p.astype(np.uint32)

    def positions(self, term=None):
        """Positions per term.  Rows fetched from an index hold ENCODED
        posting words (``encoded=True`` — the reference's lazy accessor,
        postings.py:213-227) and decode here on demand."""
        if self.posns is None:
            return {}
        if term is None:
            if self.encoded:
                return {t: self._decode(w)
                        for t, w in self.posns.items()}.items()
            return self.posns.items()
        w = self.posns[term]
        return self._decode(w) if self.encoded else w

    def raw_positions(self, vocab, term=None):
        if self.posns is None:
            return {}
        if term is None:
            return [(vocab.get_term_id(t), self.positions(t))
                    for t in self.posns]
        return [(vocab.get_term_id(term), self.positions(term))]

    def tf_to_dense(self, vocab):
        dense = np.zeros(len(vocab))
        for term, freq in self.terms():
            dense[vocab.get_term_id(term)] = freq
        return dense

    def __len__(self):
        return len(self.postings)

    def __repr__(self):
        return f"Terms({set(self.postings.keys())})"

    def __str__(self):
        return repr(self)

    def __eq__(self, other):
        if isinstance(other, SearchArray):
            return other == self
        same = isinstance(other, Terms) and self.postings == other.postings
        if same and self.doc_len == other.doc_len:
            return True

    def __lt__(self, other):
        if not isinstance(other, Terms):
            # pandas rank/sort compares against Infinity/NegInfinity
            # sentinels; defer to their reflected comparison.
            return NotImplemented
        keys_both = sorted(set(self.postings.keys()) | set(other.postings.keys()))
        for key in keys_both:
            lhs_val = self.postings.get(key, 0)
            rhs_val = other.postings.get(key, 0)
            if lhs_val < rhs_val:
                return True
            elif lhs_val > rhs_val:
                return False
        return False

    def __le__(self, other):
        return self < other or self == other

    def __gt__(self, other):
        return not (self < other) and self != other

    def __hash__(self):
        return hash(json.dumps(self.postings, sort_keys=True))


class TermsDtype(ExtensionDtype):
    """Pandas dtype for tokenized, searchable text."""

    name = "tokenized_text"
    type = Terms
    kind = "O"

    @classmethod
    def construct_from_string(cls, string):
        if not isinstance(string, str):
            raise TypeError(
                "'construct_from_string' expects a string, got {}".format(type(string))
            )
        elif string == cls.name:
            return cls()
        raise TypeError(
            "Cannot construct a '{}' from '{}'".format(cls.__name__, string)
        )

    @classmethod
    def construct_array_type(cls):
        return SearchArray

    def __repr__(self):
        return "TermsDtype()"

    @property
    def na_value(self):
        return Terms({})

    def valid_value(self, value):
        return isinstance(value, dict) or pd.isna(value) or isinstance(value, Terms)


register_extension_dtype(TermsDtype)


class _IndexState:
    """Mutable holder shared by all row views of one backing index.

    Mutations (``__setitem__``) swap ``built`` in place so every pandas view
    of the same array observes them (pandas view semantics), while ``copy()``
    makes a new holder — copy-on-write.
    """

    __slots__ = ("built", "dev", "sharded", "cache_gt_than")

    def __init__(self, built: BuiltIndex, dev: Optional[DeviceIndex] = None,
                 sharded=None):
        self.built = built
        self.dev = dev
        self.sharded = sharded  # parallel.ShardedIndex when mesh-indexed
        self.cache_gt_than = 25  # pool-admission threshold (see warm())


class SearchArray(ExtensionArray):
    """An array of tokenized text, indexed for search on TPU.

    Build with :meth:`index`; normal pandas slicing yields zero-copy row
    views over the shared device index.
    """

    dtype = TermsDtype()
    # pandas 3.x defines ExtensionArray._readonly; declare it ourselves so
    # indexing works on pandas 2.x too (and so views propagate it reliably).
    _readonly = False

    def __init__(self, postings, tokenizer=ws_tokenizer, avoid_copies=True):
        if not is_list_like(postings):
            raise TypeError("Expected list-like object, got {}".format(type(postings)))
        self.tokenizer = tokenizer
        self.avoid_copies = avoid_copies
        built = build_index_from_terms(postings, Terms)
        self._attach(built)

    # ------------------------------------------------------------------
    # construction / wiring
    # ------------------------------------------------------------------
    def _attach(self, built, rows: Optional[np.ndarray] = None,
                subset: bool = False):
        state = built if isinstance(built, _IndexState) else _IndexState(built)
        self._state = state
        self.rows = (
            np.arange(state.built.corpus_size, dtype=np.int64)
            if rows is None
            else rows
        )
        self.subset = subset

    @property
    def _built(self) -> BuiltIndex:
        return self._state.built

    @property
    def doc_lens(self) -> np.ndarray:
        return self._built.doc_lens[self.rows]

    @property
    def avg_doc_length(self) -> float:
        return self._built.avg_doc_length

    @property
    def corpus_size(self) -> int:
        return self._built.corpus_size

    @property
    def dev(self) -> DeviceIndex:
        if self._state.dev is None:
            self._state.dev = DeviceIndex(self._built)
        return self._state.dev

    @property
    def term_dict(self):
        return self._built.vocab

    @classmethod
    def index(cls, array: Iterable, tokenizer=ws_tokenizer, truncate=False,
              batch_size=100_000, avoid_copies=True, workers=4,
              cache_gt_than=25, data_dir: Optional[str] = None,
              autowarm=True, mesh=None) -> "SearchArray":
        """Tokenize and index an iterable of strings.

        With ``mesh`` (a jax.sharding.Mesh with "docs"/"queries" axes) the
        postings are additionally doc-sharded across the mesh's devices
        (parallel.ShardedIndex); score_batch/edismax then execute SPMD.
        """
        if not is_list_like(array):
            raise TypeError("Expected list-like object, got {}".format(type(array)))
        built = build_index(array, tokenizer, truncate=truncate,
                            batch_size=batch_size, workers=workers)
        if data_dir is not None:
            from searcharray_tpu.index.store import memmap_postings

            memmap_postings(built.postings, data_dir)
        arr = cls([], tokenizer=tokenizer, avoid_copies=avoid_copies)
        arr._attach(built)
        if mesh is not None:
            from searcharray_tpu.parallel.sharded import ShardedIndex

            arr._state.sharded = ShardedIndex.build(built, mesh=mesh)
        if autowarm:
            arr.warm(cache_gt_than=cache_gt_than)
        else:
            arr._state.cache_gt_than = cache_gt_than
        return arr

    def warm(self, cache_gt_than: Optional[int] = None):
        """Warm the index for serving (the analog of the reference's df/tf
        cache warm, middle_out.py:337-342 — our dfs are precomputed).

        ``cache_gt_than`` is the pool-admission threshold: only terms
        with more than this many posting words are prewarmed (the
        reference's meaning at `/root/reference/searcharray/phrase/
        middle_out.py:518` — posns cached only for terms longer than the
        threshold; here the caches are the device tf/plane pools).
        Defaults to the value given at :meth:`index` time (25).

        Two costs are hidden here: XLA compilation of the fused scoring
        kernel per posting-bucket size, and the dense engine's pools —
        the hottest terms' tf vectors and payload planes are prefilled
        with one batched device program, so the first queries against
        frequent terms skip their pool fills."""
        from searcharray_tpu.ops.kernels import bucket_of

        if cache_gt_than is None:
            cache_gt_than = getattr(self._state, "cache_gt_than", 25)
        self._state.cache_gt_than = cache_gt_than
        lengths = self._built.postings.lengths
        common = np.flatnonzero(lengths > cache_gt_than)
        seen = set()
        for tid in common:
            bkt = bucket_of(int(lengths[tid]))
            if bkt not in seen:
                seen.add(bkt)
                scoring.score_term_dense(self.dev, int(tid))
        from searcharray_tpu.search import dense as dense_mod

        if dense_mod.dense_eligible(self.dev) and len(common):
            hot = common[np.argsort(-lengths[common], kind="stable")]
            # max(0, ...): a negative cap would slice from the END of hot
            # and pin more terms than the pool holds
            tf_cap = max(0, dense_mod.tf_capacity(self.dev) - 8)
            tf_hot = [int(t) for t in hot[:tf_cap]]
            plane_hot = [int(t)
                         for t in hot[: dense_mod.plane_capacity(self.dev)
                                      // 2]]
            dense_mod.ensure_batch(self.dev, plane_tids=plane_hot,
                                   tf_tids=tf_hot)

    def warm_serving(self, **kwargs) -> int:
        """Precompile the full serving program set for this index (AOT):
        every term/phrase/slop group shape the batch driver can mint for
        this corpus, into the persistent XLA compile cache — so a fresh
        process's first live query compiles nothing.  See
        utils/warm.py:warm_serving for knobs; returns the number of warm
        queries issued."""
        from searcharray_tpu.utils.warm import warm_serving as _ws

        return _ws(self, **kwargs)

    @classmethod
    def _from_sequence(cls, scalars, *, dtype=None, copy=False):
        if dtype is not None and not isinstance(dtype, TermsDtype):
            return scalars
        if isinstance(scalars, np.ndarray) and scalars.dtype == TermsDtype():
            return cls(scalars)
        elif isinstance(scalars, np.ndarray) and scalars.dtype.kind in "US":
            return cls(scalars)
        elif isinstance(scalars, np.ndarray) and scalars.dtype != object:
            return scalars
        return cls(scalars)

    # ------------------------------------------------------------------
    # pandas protocol
    # ------------------------------------------------------------------
    def memory_usage(self, deep=False):
        return self.nbytes

    @property
    def nbytes(self):
        b = self._built
        return (
            b.postings.nbytes
            + b.doc_term.nbytes
            + b.doc_lens.nbytes
            + b.vocab.nbytes
        )

    def _row_to_terms(self, corpus_row: int) -> Terms:
        """One corpus row as a Terms scalar.  Positions stay ENCODED
        (posting words; Terms decodes lazily on .positions()) — the
        reference's accessor shape, postings.py:213-227 — and tf is the
        payload popcount, so fetching a row never decodes anything."""
        b = self._built
        tids = b.doc_term.row_terms(corpus_row)
        tfs = {}
        posns = {}
        for tid in tids:
            term = b.vocab.get_term(int(tid))
            sl = b.postings.term_slice(int(tid))
            keys = enc.keys_of(sl)
            mine = sl[keys == np.uint64(corpus_row)]
            posns[term] = mine
            tfs[term] = max(1, int(enc.popcount64(
                mine & np.uint64(enc.LSB_MASK)).sum()))
        return Terms(tfs, doc_len=int(b.doc_lens[corpus_row]), posns=posns,
                     encoded=True)

    def __getitem__(self, key):
        key = pd.api.indexers.check_array_indexer(self, key)
        if isinstance(key, numbers.Integral):
            row = int(key)
            if row < 0:
                row += len(self)
            if row < 0 or row >= len(self):
                raise IndexError("index out of bounds")
            return self._row_to_terms(int(self.rows[row]))
        new = SearchArray([], tokenizer=self.tokenizer,
                          avoid_copies=self.avoid_copies)
        new._attach(self._state, rows=self.rows[key], subset=True)
        new._readonly = self._readonly
        return new

    def __setitem__(self, key, value):
        if self._readonly:
            raise ValueError("Cannot modify read-only array")
        key = pd.api.indexers.check_array_indexer(self, key)
        if isinstance(value, pd.Series):
            value = value.values
        if isinstance(value, pd.DataFrame):
            value = value.values.flatten()
        if isinstance(value, SearchArray):
            value = value.to_numpy()
        if isinstance(value, list):
            value = np.asarray(value, dtype=object)
        if not isinstance(value, np.ndarray) and not self.dtype.valid_value(value):
            raise ValueError(
                f"Cannot set non-object array to SearchArray -- "
                f"you passed type:{type(value)} -- {value}"
            )
        if isinstance(key, numbers.Integral) and isinstance(value, np.ndarray):
            raise ValueError("Cannot set a single value to an array")

        # Logical positions being assigned (key may be int/slice/mask/fancy).
        logical = np.arange(len(self))[key]
        if isinstance(logical, numbers.Integral) or np.isscalar(logical):
            logical = np.asarray([int(logical)])
        if not isinstance(value, np.ndarray):
            value = np.asarray([value] * len(logical), dtype=object)
        elif len(value) == 1 and len(logical) != 1:
            value = np.asarray([value[0]] * len(logical), dtype=object)
        elif len(value) != len(logical):
            raise ValueError(
                f"cannot set {len(logical)} positions from "
                f"{len(value)} values"
            )
        if pd.isna(value).any():
            value = np.asarray(
                [Terms({}) if pd.isna(v) else v for v in value], dtype=object
            )

        # Delta-rebuild-on-write: only the mutated docs are re-indexed and
        # spliced into the CSR (builder.replace_docs) — O(assigned docs +
        # total words), not the O(corpus x decode) full materialisation the
        # reference warns about (postings.py:409-414).
        # De-alias: a logical position whose backing row is shared with
        # another logical position of this view (take/fancy-index results
        # repeat backing rows) gets its own fresh backing row, so assigning
        # one position never changes its aliases.
        counts = np.bincount(self.rows, minlength=self._built.corpus_size)
        next_row = self._built.corpus_size
        new_rows = self.rows.copy()
        appended = False
        doc_ids: List[int] = []
        vals: List[Terms] = []
        for pos, v in zip(logical, value):
            if isinstance(v, dict):
                v = Terms(v, doc_len=len(v))
            backing = int(self.rows[int(pos)])
            if counts[backing] > 1:
                backing = next_row
                next_row += 1
                new_rows[int(pos)] = backing
                appended = True
            doc_ids.append(backing)
            vals.append(v)
        # Swap the shared holder in place: all pandas views of this array
        # observe the mutation; copies (separate holders) do not.
        self._state.built = replace_docs(self._built,
                                         np.asarray(doc_ids, dtype=np.int64),
                                         vals, Terms)
        self._state.dev = None
        if self._state.sharded is not None:
            # re-shard the mutated index on the same mesh so mesh-routed
            # queries never read the stale partition
            from searcharray_tpu.parallel.sharded import ShardedIndex

            mesh = self._state.sharded.mesh
            self._state.sharded = ShardedIndex.build(self._state.built,
                                                     mesh=mesh)
        if appended:
            self.rows = new_rows
            self.subset = True

    def value_counts(self, dropna: bool = True):
        counts = Counter(self[:])
        if dropna:
            counts.pop(Terms({}), None)
        return pd.Series(counts)

    def __len__(self):
        return len(self.rows)

    def __ne__(self, other):
        if isinstance(other, (pd.DataFrame, pd.Series, pd.Index)):
            return NotImplemented
        return ~(self == other)

    def __eq__(self, other):
        if isinstance(other, (pd.DataFrame, pd.Series, pd.Index)):
            return NotImplemented

        if isinstance(other, SearchArray):
            if len(self) != len(other):
                return False
            elif len(other) == 0:
                return np.array([], dtype=bool)
            if not self.term_dict.compatible(other.term_dict):
                return np.zeros(len(self), dtype=bool)
            eq = np.zeros(len(self), dtype=bool)
            for i in range(len(self)):
                a = np.sort(self._built.doc_term.row_terms(int(self.rows[i])))
                b = np.sort(other._built.doc_term.row_terms(int(other.rows[i])))
                eq[i] = len(a) == len(b) and bool(np.all(a == b))
            eq &= np.asarray(self.doc_lens == other.doc_lens)
            return eq

        elif isinstance(other, Terms):
            other = SearchArray([other], tokenizer=self.tokenizer)
            warnings.warn("Comparing a scalar value to a SearchArray. This is slow.")
            return np.array(self[:]) == np.array(other[:])

        elif is_list_like(other):
            if len(self) != len(other):
                return False
            elif len(other) == 0:
                return np.array([], dtype=bool)
            other = SearchArray(other, tokenizer=self.tokenizer)
            return np.array(self[:]) == np.array(other[:])
        else:
            return np.full(len(self), False)

    def isna(self):
        return np.asarray(self.doc_lens == 0)

    def unique(self):
        return self[:]

    def __iter__(self):
        if len(self) > 10000:
            warnings.warn(
                "Iterating over SearchArray is very slow and not recommended."
            )
        return super().__iter__()

    def take(self, indices, allow_fill=False, fill_value=None):
        row_indices = np.arange(len(self.rows))
        result_indices = pd_take(
            row_indices, indices, allow_fill=allow_fill, fill_value=-1
        )
        if allow_fill and -1 in result_indices:
            if fill_value is None or pd.isna(fill_value):
                fill_value = Terms({}, encoded=True)
            to_fill_mask = result_indices == -1
            taken = SearchArray([fill_value] * len(result_indices))
            taken[~to_fill_mask] = self[result_indices[~to_fill_mask]].copy()
            return taken
        return self[result_indices].copy()

    def copy(self):
        new = SearchArray([], tokenizer=self.tokenizer,
                          avoid_copies=self.avoid_copies)
        if self.avoid_copies:
            # share immutable built + device buffers (incl. the sharded
            # runtime: DataFrame construction copies, and dropping it
            # silently demoted mesh-indexed columns to the single-chip
            # engine) until either side mutates (mutation swaps its own
            # holder's built)
            new._attach(_IndexState(self._built, self._state.dev,
                                    sharded=self._state.sharded),
                        rows=self.rows.copy(), subset=self.subset)
        else:
            import copy as _copy

            new._attach(_copy.deepcopy(self._built), rows=self.rows.copy(),
                        subset=self.subset)
        return new

    @classmethod
    def _concat_same_type(cls, to_concat):
        to_concat = list(to_concat)
        # Fast path: full-corpus views concatenate by merging their built
        # indexes directly (vectorised, no per-row rebuild).
        if all(
            not ea.subset and len(ea.rows) == ea.corpus_size
            and ea.tokenizer is to_concat[0].tokenizer
            for ea in to_concat
        ):
            from searcharray_tpu.index.builder import merge_built

            new = SearchArray([], tokenizer=to_concat[0].tokenizer,
                              avoid_copies=to_concat[0].avoid_copies)
            new._attach(merge_built([ea._built for ea in to_concat]))
            return new
        data = np.concatenate([ea[:] for ea in to_concat])
        return SearchArray(data, tokenizer=to_concat[0].tokenizer)

    @classmethod
    def _from_factorized(cls, values, original):
        return cls(values)

    def _values_for_factorize(self):
        arr = np.asarray(self[:], dtype=object)
        return arr, Terms({})

    def __array__(self, dtype=None, copy=None):
        if copy is False:
            raise ValueError(
                "SearchArray rows are materialised on conversion; a no-copy "
                "numpy view is not possible"
            )
        return np.asarray([self._row_to_terms(int(r)) for r in self.rows],
                          dtype=object)

    def to_numpy(self, dtype=None, copy=False, na_value=no_default):
        # Conversion materialises fresh Terms rows (never zero-copy), so the
        # result is always writeable — the base class would wrongly mark it
        # readonly when self._readonly is set.
        result = np.asarray(self, dtype=dtype)
        if na_value is not no_default:
            result[self.isna()] = na_value
        return result

    def __getstate__(self):
        return {
            "built": self._built,
            "rows": self.rows,
            "subset": self.subset,
            "tokenizer": self.tokenizer,
            "avoid_copies": self.avoid_copies,
        }

    def __setstate__(self, state):
        self.tokenizer = state["tokenizer"]
        self.avoid_copies = state["avoid_copies"]
        # device buffers re-upload lazily on first search
        self._attach(state["built"], rows=state["rows"], subset=state["subset"])

    def _resolve_tids(self, tokens: List[str]) -> List[int]:
        """Token list -> term ids (-1 for vocabulary misses)."""
        tids = []
        for t in tokens:
            try:
                tids.append(self.term_dict.get_term_id(t))
            except TermMissingError:
                tids.append(-1)
        return tids

    def _check_token_arg(self, token):
        if isinstance(token, str):
            return token
        elif isinstance(token, list) and len(token) == 1:
            return token[0]
        elif isinstance(token, list):
            return token
        raise TypeError("Expected a string or list of strings for phrases")

    def memory_report(self, N=1000):
        b = self._built
        N = min(N, len(b.vocab))
        sizes = sorted(
            ((b.vocab.get_term(i), int(b.postings.lengths[i]) * 8)
             for i in range(N)),
            key=lambda x: x[1], reverse=True,
        )
        report = (
            "\n        SearchArray Memory Report\n"
            "        -------------------------\n"
            f"        Number of Terms: {len(b.vocab)}\n"
            "        -------------------------\n"
            f"        Doc/Term Matrix: {_bytes_h(b.doc_term.nbytes)}\n"
            f"        Positions:       {_bytes_h(b.postings.nbytes)}\n"
            f"        Term Dictionary: {_bytes_h(b.vocab.nbytes)}\n"
        )
        # device-side serving pools (the largest HBM allocations; the
        # plane pool's budget alone is 3 GB at big-corpus shapes)
        dev = self._state.dev
        if dev is not None:
            for pool, slots, label in (
                (dev.plane_pool, dev.plane_slot, "Plane Pool"),
                (dev.tf_pool, dev.tf_slot, "TF Pool"),
            ):
                if pool is not None:
                    report += (
                        f"        {label}:      {_bytes_h(pool.nbytes)} "
                        f"({len(slots)}/{pool.shape[0]} slots)\n"
                    )
        report += "\n"
        cum = 0
        for i, (term, nb) in enumerate(sizes):
            cum += nb
            report += (
                f"        Term {i}: {term} - {_bytes_h(nb)} - "
                f"Cumulative: {_bytes_h(cum)}\n"
            )
        return report

    # ------------------------------------------------------------------
    # search API
    # ------------------------------------------------------------------
    def _gather_rows(self, dense_np: np.ndarray) -> np.ndarray:
        if not self.subset and len(self.rows) == self.corpus_size:
            return dense_np
        return dense_np[self.rows]

    def termfreqs(self, token: Union[List[str], str], slop: int = 0,
                  min_posn: Optional[int] = None,
                  max_posn: Optional[int] = None) -> np.ndarray:
        token = self._check_token_arg(token)
        if isinstance(token, list):
            return self._phrase_freq(token, slop=slop, min_posn=min_posn,
                                     max_posn=max_posn)
        try:
            tid = self.term_dict.get_term_id(token)
        except TermMissingError:
            return np.zeros(len(self), dtype=np.float32)
        tfs = scoring.termfreqs_dense(self.dev, tid, min_posn, max_posn)
        return self._gather_rows(np.asarray(tfs, dtype=np.float32))

    def docfreq(self, token: str) -> int:
        if not isinstance(token, str):
            raise TypeError("Expected a string")
        try:
            return scoring.docfreq(self.dev, self.term_dict.get_term_id(token))
        except TermMissingError:
            return 0

    def doclengths(self) -> np.ndarray:
        return self.doc_lens

    def score(self, token: Union[str, List[str]],
              similarity: Similarity = default_bm25, slop: int = 0,
              min_posn: Optional[int] = None,
              max_posn: Optional[int] = None) -> np.ndarray:
        token = self._check_token_arg(token)
        fused = getattr(similarity, "_fused", None)
        if fused is not None:
            dense = self._score_fused(token, fused, slop, min_posn, max_posn)
            return self._gather_rows(np.asarray(dense, dtype=np.float32))
        # Custom (user) similarity: honour the reference protocol exactly —
        # subset-shaped numpy tfs/doc_lens in, scores out.
        tokens_l = [token] if isinstance(token, str) else token
        all_dfs = np.asarray([self.docfreq(t) for t in tokens_l])
        tfs = self.termfreqs(token, min_posn=min_posn, max_posn=max_posn,
                             slop=slop)
        doc_lens = self.doclengths()
        scores = similarity(tfs, all_dfs, doc_lens, self.avg_doc_length,
                            self.corpus_size)
        return np.asarray(scores, dtype=np.float32)

    def _score_fused(self, token, fused, slop, min_posn, max_posn):
        """Single-dispatch score path for builtin similarities."""
        kind, k1, b = fused
        tokens_l = [token] if isinstance(token, str) else token
        try:
            term_ids = [self.term_dict.get_term_id(t) for t in tokens_l]
        except TermMissingError:
            term_ids = None
        # idf uses ALL query terms' dfs (missing terms -> df 0, parity with
        # score() computing docfreq per token, postings.py:670-672)
        dfs = [self.docfreq(t) for t in tokens_l]
        idf = scoring.host_idf(kind, dfs, self.corpus_size,
                               self.avg_doc_length)
        if term_ids is None:
            return np.zeros(self.corpus_size, dtype=np.float32)
        if self.avg_doc_length == 0:
            return np.zeros(self.corpus_size, dtype=np.float32)
        if isinstance(token, str):
            return scoring.score_term_dense(
                self.dev, term_ids[0], kind=kind, k1=k1, b=b,
                min_posn=min_posn, max_posn=max_posn, idf=idf,
            )
        if min_posn is None and max_posn is None:
            # repeated phrases score from the phrase-tf cache (one row
            # gather + similarity); posn windows change freqs -> bypass
            from searcharray_tpu.search import batch as batch_mod

            r = batch_mod.score_phrase_cached_single(
                self.dev, term_ids, slop, kind, k1, b, idf)
            if r is not None:
                return r
        if slop == 0:
            return phrase_mod.phrase_freqs_dense(
                self.dev, term_ids, min_posn, max_posn,
                kind=kind, k1=k1, b=b, idf=idf,
            )
        return spans_mod.span_freqs_dense(
            self.dev, term_ids, slop, min_posn, max_posn,
            kind=kind, k1=k1, b=b, idf=idf,
        )

    def score_batch(self, queries: List[Union[str, List[str]]],
                    similarity: Similarity = default_bm25, slop=0,
                    top_k: Optional[int] = None, block: bool = True):
        """Score a batch of queries (terms or phrases) with one host sync.

        Queries are grouped by structure (terms together; phrases by
        length/plan/bucket) and each group runs as ONE jitted program —
        vmap over per-query (offset, length, idf) rows against the shared
        posting planes (search/batch.py).  Returns float32[Q, len(self)],
        or with ``top_k`` set, ``(scores[Q, k], indices[Q, k])`` — the
        k-selection is fused into the group programs and all groups'
        results cross the tunnel as one packed array.

        ``slop`` is an int applied to every query or a per-query sequence
        — a serving request mixing exact and slop queries submits ONE
        batch (one pool-fill wave) instead of a call per slop value.

        With ``block=False`` (requires ``top_k``, a fused similarity, a
        full un-sliced view, single chip) the call returns a zero-arg
        ``collect()`` callable once all device work is enqueued; invoking
        it performs the one blocking transfer.  A serving loop that
        submits batch N+1 before collecting batch N overlaps each batch's
        device-to-host round trip with the next batch's compute.
        """
        import jax

        slop_seq = None if np.isscalar(slop) else [int(s) for s in slop]
        if slop_seq is not None and len(slop_seq) != len(queries):
            raise ValueError("per-query slop length must match queries")
        fused = getattr(similarity, "_fused", None)
        full_view = not self.subset and len(self.rows) == self.corpus_size
        # validate block=False BEFORE any early return: a non-fused
        # similarity must raise here, not silently return a blocking tuple
        if not block and not (fused is not None and top_k is not None
                              and full_view
                              and self._state.sharded is None):
            raise ValueError(
                "block=False requires top_k, a fused similarity, a full "
                "un-sliced view, and a single chip")
        if fused is None:
            slops = slop_seq or [slop] * len(queries)
            dense = np.stack(
                [self.score(q, similarity=similarity, slop=s)
                 for q, s in zip(queries, slops)]
            )
            if top_k is None:
                return dense
            idx = np.argsort(dense, axis=1)[:, ::-1][:, :top_k]
            return np.take_along_axis(dense, idx, axis=1), idx
        if slop_seq is None and slop == 0:
            kind, k1, b = fused
            qtids = []
            for q in queries:
                q = self._check_token_arg(q)
                qtids.append(self._resolve_tids(
                    [q] if isinstance(q, str) else q))
            sharded = self._state.sharded
            if sharded is not None and full_view:
                dense_dev = sharded.score_batch_device(qtids, kind, k1, b)
                if top_k is not None:
                    k = min(top_k, len(self))
                    scores, idx = sharded.topk_fn(dense_dev.shape, k)(
                        dense_dev)
                    return (np.asarray(scores, dtype=np.float32),
                            np.asarray(idx, dtype=np.int64))
                return np.asarray(dense_dev, dtype=np.float32)
            if full_view:
                if top_k is not None:
                    k = min(top_k, len(self))
                    return batch_mod.score_batch_fused(
                        self.dev, qtids, kind, k1, b, top_k=k,
                        defer=not block)
                return batch_mod.score_batch_fused(self.dev, qtids, kind,
                                                   k1, b)
            from searcharray_tpu.search import dense as dense_mod

            if dense_mod.dense_eligible(self.dev):
                # candidate-pruned path: compute only the view's rows
                k = min(top_k, len(self)) if top_k is not None else None
                return batch_mod.score_batch_fused(
                    self.dev, qtids, kind, k1, b, top_k=k,
                    rows=np.asarray(self.rows, dtype=np.int64))
            dense = batch_mod.score_batch_fused(self.dev, qtids, kind, k1, b)
            dense = dense[:, self.rows]
            if top_k is not None:
                idx = np.argsort(dense, axis=1)[:, ::-1][:, :top_k]
                return np.take_along_axis(dense, idx, axis=1), idx
            return dense
        # slop queries: grouped span kernels (one program per
        # (terms, anchor, window, multiplicity) shape, search/batch.py)
        if full_view and self._state.sharded is None:
            kind, k1, b = fused
            qtids = []
            for q in queries:
                q = self._check_token_arg(q)
                qtids.append(self._resolve_tids(
                    [q] if isinstance(q, str) else q))
            if top_k is not None:
                k = min(top_k, len(self))
                return batch_mod.score_batch_fused(
                    self.dev, qtids, kind, k1, b, top_k=k, slop=slop,
                    defer=not block)
            return batch_mod.score_batch_fused(self.dev, qtids, kind, k1,
                                               b, slop=slop)
        if full_view and self._state.sharded is not None:
            # grouped sharded span programs + distributed top-k
            kind, k1, b = fused
            sharded = self._state.sharded
            qtids = []
            for q in queries:
                q = self._check_token_arg(q)
                qtids.append(self._resolve_tids(
                    [q] if isinstance(q, str) else q))
            dense_dev = sharded.score_batch_device(qtids, kind, k1, b,
                                                   slop=slop)
            if top_k is not None:
                k = min(top_k, len(self))
                scores, idx = sharded.topk_fn(dense_dev.shape, k)(dense_dev)
                return (np.asarray(scores, dtype=np.float32),
                        np.asarray(idx, dtype=np.int64))
            return np.asarray(dense_dev, dtype=np.float32)
        # sliced views: per-query dispatches
        slops = slop_seq or [slop] * len(queries)
        pending = [
            self._score_fused(self._check_token_arg(q), fused, s,
                              None, None)
            for q, s in zip(queries, slops)
        ]
        if top_k is not None and full_view:
            k = min(top_k, len(self))
            fn = _topk_jit(self.corpus_size, k)
            import jax.numpy as jnp

            picked = [
                fn(p) if not isinstance(p, np.ndarray) else fn(jnp.asarray(p))
                for p in pending
            ]
            # stack on device and cross the tunnel exactly twice — each
            # small host transfer costs a full round trip
            scores_d = jnp.stack([s for s, _ in picked])
            idx_d = jnp.stack([i for _, i in picked])
            return (np.asarray(scores_d, dtype=np.float32),
                    np.asarray(idx_d, dtype=np.int64))
        jax.block_until_ready(pending)
        out = np.stack([np.asarray(p, dtype=np.float32) for p in pending])
        if not full_view:
            out = out[:, self.rows]
        if top_k is not None:
            idx = np.argsort(out, axis=1)[:, ::-1][:, :top_k]
            return np.take_along_axis(out, idx, axis=1), idx
        return out

    def score_batch_device(self, queries: List[Union[str, List[str]]],
                           similarity: Similarity = default_bm25,
                           slop=0,
                           rows: Optional[np.ndarray] = None):
        """Like :meth:`score_batch` but returns the f32[Q, len(self)]
        scores as a DEVICE array — no host transfer.  Callers composing
        further (edismax) pay one tunnel round trip for the whole query
        instead of one per phase.  Requires a fused builtin similarity.
        ``slop`` may be an int or a per-query sequence (score_batch).

        With ``rows`` (a candidate doc-id subset; requires a full view,
        fused similarity, slop=0) scores come back as f32[Q, len(rows)]
        and compute is proportional to the subset — the reference's
        phrase-phase cost contract (solr.py:328-338).  Sharded fields
        route through the mesh rows engine (each shard aligns postings
        to its local slice of the rows).
        """
        import jax.numpy as jnp

        if not np.isscalar(slop):
            slop = [int(s) for s in slop]
            if len(slop) != len(queries):
                raise ValueError("per-query slop length must match queries")
            if not any(slop):
                slop = 0  # all-exact: take the scalar fast paths
        fused = getattr(similarity, "_fused", None)
        if rows is not None:
            full_view = (not self.subset
                         and len(self.rows) == self.corpus_size)
            if (fused is None or (np.isscalar(slop) and slop != 0)
                    or not np.isscalar(slop) or not full_view):
                raise ValueError(
                    "rows= requires a fused similarity, slop=0, and a "
                    "full un-sliced view")
            kind, k1, b = fused
            qtids = []
            for q in queries:
                q = self._check_token_arg(q)
                qtids.append(self._resolve_tids([q] if isinstance(q, str)
                                                else q))
            sharded = self._state.sharded
            if sharded is not None:
                return sharded.score_batch_device(
                    qtids, kind, k1, b,
                    rows=np.asarray(rows, dtype=np.int64))
            return batch_mod.score_batch_fused(
                self.dev, qtids, kind, k1, b, as_device=True,
                rows=np.asarray(rows, dtype=np.int64))
        if fused is None:
            # custom similarity: honour the reference protocol per query,
            # then stage the stack on device for composition
            slops = [slop] * len(queries) if np.isscalar(slop) else slop
            return jnp.asarray(np.stack(
                [self.score(q, similarity=similarity, slop=s)
                 for q, s in zip(queries, slops)]))
        kind, k1, b = fused
        full_view = not self.subset and len(self.rows) == self.corpus_size
        sharded = self._state.sharded
        if not np.isscalar(slop) or slop != 0:
            if sharded is not None and full_view:
                qtids = []
                for q in queries:
                    q = self._check_token_arg(q)
                    qtids.append(self._resolve_tids(
                        [q] if isinstance(q, str) else q))
                return sharded.score_batch_device(qtids, kind, k1, b,
                                                  slop=slop)
            if sharded is None and full_view:
                qtids = []
                for q in queries:
                    q = self._check_token_arg(q)
                    qtids.append(self._resolve_tids(
                        [q] if isinstance(q, str) else q))
                return batch_mod.score_batch_fused(
                    self.dev, qtids, kind, k1, b, as_device=True, slop=slop)
            slops = [slop] * len(queries) if np.isscalar(slop) else slop
            pending = [
                self._score_fused(self._check_token_arg(q), fused, s,
                                  None, None)
                for q, s in zip(queries, slops)
            ]
            out = jnp.stack([jnp.asarray(p) for p in pending])
            if full_view:
                return out
            return out[:, self.rows]
        qtids = []
        for q in queries:
            q = self._check_token_arg(q)
            qtids.append(self._resolve_tids([q] if isinstance(q, str)
                                            else q))
        if sharded is not None and full_view:
            return sharded.score_batch_device(qtids, kind, k1, b)
        if full_view:
            return batch_mod.score_batch_fused(self.dev, qtids, kind, k1, b,
                                               as_device=True)
        from searcharray_tpu.search import dense as dense_mod

        if dense_mod.dense_eligible(self.dev):
            return batch_mod.score_batch_fused(
                self.dev, qtids, kind, k1, b, as_device=True,
                rows=np.asarray(self.rows, dtype=np.int64))
        out = batch_mod.score_batch_fused(self.dev, qtids, kind, k1, b,
                                          as_device=True)
        return out[:, self.rows]

    def topk(self, token: Union[str, List[str]], k: int = 10,
             similarity: Similarity = default_bm25, slop: int = 0):
        """Top-k (scores, row indices) for one query.

        The k-selection runs on device (``lax.top_k`` over the dense score
        vector), so only 2k values cross back to the host — the serving
        path for ranked retrieval.  Falls back to a host argpartition for
        custom similarities.
        """
        import jax

        k = min(k, len(self))
        fused = getattr(similarity, "_fused", None)
        full_view = not self.subset and len(self.rows) == self.corpus_size
        if fused is not None and full_view:
            if self._state.sharded is None:
                # batched driver: candidate-subset routing + fused packing
                scores, idx = self.score_batch([token],
                                               similarity=similarity,
                                               slop=slop, top_k=k)
                return scores[0], idx[0]
            dense = self._score_fused(self._check_token_arg(token), fused,
                                      slop, None, None)
            if not isinstance(dense, np.ndarray):
                scores, idx = _topk_jit(self.corpus_size, k)(dense)
                return (np.asarray(scores, dtype=np.float32),
                        np.asarray(idx, dtype=np.int64))
        scores = self.score(token, similarity=similarity, slop=slop)
        idx = np.argpartition(scores, -k)[-k:]
        order = np.argsort(scores[idx])[::-1]
        idx = idx[order]
        return scores[idx], idx

    def positions(self, token: str, key=None) -> List[np.ndarray]:
        tid = self.term_dict.get_term_id(token)
        wanted = self.rows[key] if key is not None else self.rows
        if isinstance(wanted, numbers.Integral):
            wanted = np.asarray([wanted])
        sl = self._built.postings.term_slice(tid)
        keys = enc.keys_of(sl).astype(np.int64)
        mask = np.isin(keys, wanted)
        dkeys, posns = enc.decode_words(sl[mask])
        by_doc: dict = {}
        if len(dkeys):
            cuts = np.concatenate([[0], np.flatnonzero(dkeys[1:] != dkeys[:-1]) + 1])
            split = np.split(posns.astype(np.uint32), cuts[1:])
            by_doc = dict(zip(dkeys[cuts].astype(np.int64), split))
        return [by_doc.get(int(d), np.array([], dtype=np.uint32)) for d in wanted]

    def _phrase_freq(self, tokens: List[str], slop=0,
                     min_posn: Optional[int] = None,
                     max_posn: Optional[int] = None) -> np.ndarray:
        try:
            term_ids = [self.term_dict.get_term_id(t) for t in tokens]
        except TermMissingError:
            return np.zeros(len(self), dtype=np.float32)
        if slop == 0:
            dense = phrase_mod.phrase_freqs_dense(self.dev, term_ids,
                                                  min_posn, max_posn)
        else:
            dense = spans_mod.span_freqs_dense(self.dev, term_ids, slop,
                                               min_posn, max_posn)
        return self._gather_rows(np.asarray(dense, dtype=np.float32))
