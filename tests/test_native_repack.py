"""Native (C++) repack + docfreq passes vs the numpy fallback.

The build's hottest host loops run in native/indexer.cpp when g++ is
available; these differentials pin bit-identical output so the fallback
and the native path can never drift."""
import numpy as np
import pytest

from searcharray_tpu.index import native as native_mod
from searcharray_tpu.index.builder import (
    TermPostings,
    _repack,
    build_index,
    compute_doc_freqs,
)

pytestmark = pytest.mark.skipif(
    not native_mod.native_available(), reason="native library unavailable"
)


def _corpus(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(400)]
    return [" ".join(rng.choice(vocab, size=rng.integers(1, 60)))
            for _ in range(n)]


def test_multibatch_build_matches_numpy_fallback(monkeypatch):
    # workers=1: term-id assignment order depends on thread completion
    # order, so only serial builds are bit-comparable across runs
    docs = _corpus()
    built_native = build_index(docs, batch_size=500, workers=1)

    monkeypatch.setattr(native_mod, "copy_segments", lambda *a: None)
    monkeypatch.setattr(native_mod, "doc_freqs", lambda *a: None)
    built_numpy = build_index(docs, batch_size=500, workers=1)

    np.testing.assert_array_equal(built_native.postings.data,
                                  built_numpy.postings.data)
    np.testing.assert_array_equal(built_native.postings.offsets,
                                  built_numpy.postings.offsets)
    np.testing.assert_array_equal(built_native.postings.lengths,
                                  built_numpy.postings.lengths)
    np.testing.assert_array_equal(
        compute_doc_freqs(built_native.postings),
        compute_doc_freqs(built_numpy.postings))


def test_doc_freqs_counts_distinct_docs_across_blocks():
    # one doc long enough to span several 18-posn blocks must count once
    docs = ["x " * 100 + "y", "x y", "z"]
    built = build_index(docs, workers=1)
    dfs = compute_doc_freqs(built.postings)
    vocab = built.vocab
    assert dfs[vocab.get_term_id("x")] == 2
    assert dfs[vocab.get_term_id("y")] == 2
    assert dfs[vocab.get_term_id("z")] == 1


def test_compress_planes_and_block_max_match_numpy(monkeypatch):
    from searcharray_tpu.index.device import DeviceIndex
    from searcharray_tpu.ops.kernels import compress_planes

    docs = _corpus(n=1200, seed=9)
    built = build_index(docs, workers=1)
    h_n, p_n = compress_planes(built.postings.data, 3)
    bm_n = DeviceIndex._per_term_block_max(built, 16)

    monkeypatch.setattr(native_mod, "compress_planes", lambda *a: None)
    monkeypatch.setattr(native_mod, "block_max", lambda *a: None)
    h_f, p_f = compress_planes(built.postings.data, 3)
    bm_f = DeviceIndex._per_term_block_max(built, 16)
    np.testing.assert_array_equal(h_n, h_f)
    np.testing.assert_array_equal(p_n, p_f)
    np.testing.assert_array_equal(bm_n, bm_f)


def test_copy_segments_reorders_exactly():
    rng = np.random.default_rng(0)
    bufs = [rng.integers(0, 2**63, size=s).astype(np.uint64)
            for s in (17, 5, 31)]
    segs = [(0, 3, 7), (2, 0, 10), (1, 1, 4), (0, 12, 5), (2, 30, 1),
            (1, 0, 0)]
    seg_buf = np.asarray([s[0] for s in segs], np.int32)
    starts = np.asarray([s[1] for s in segs], np.int64)
    lens = np.asarray([s[2] for s in segs], np.int64)
    got = native_mod.copy_segments(bufs, seg_buf, starts, lens)
    want = np.concatenate([bufs[b][o: o + n] for b, o, n in segs])
    np.testing.assert_array_equal(got, want)
