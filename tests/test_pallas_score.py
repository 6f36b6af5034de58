"""Pallas fused term scorer vs the XLA scoring path (interpret mode on CPU)."""
import numpy as np
import pytest

from searcharray_tpu import SearchArray
from searcharray_tpu.ops.pallas.score import block_bounds, score_term_pallas
from searcharray_tpu.ops.kernels import take_term_planes
from searcharray_tpu.search import scoring


def make_docs(n=700, seed=11):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta"] + [f"w{i}" for i in range(50)]
    return [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def docs():
    return SearchArray.index(make_docs())


@pytest.mark.parametrize("term", ["alpha", "w0", "w44"])
@pytest.mark.parametrize("kind", ["none", "bm25", "bm25_legacy"])
def test_pallas_matches_xla(docs, term, kind):
    import jax

    dev = docs.dev
    tid = docs.term_dict.get_term_id(term)
    off, n, bucket = dev.term_span(tid)
    h, p = take_term_planes(dev.hdrs, dev.pays, off, n,
                            bucket=bucket, blk_bits=dev.blk_bits)
    doc_block = 128
    bounds = block_bounds(h, dev.blk_bits, dev.corpus_size, doc_block)
    maxw = int(np.max(np.diff(np.asarray(bounds))))
    idf = scoring.host_idf("bm25", [docs.docfreq(term)], dev.corpus_size,
                           dev.avg_doc_length)
    got = score_term_pallas(
        h, p, dev.doc_lens, bounds, float(idf), float(dev.avg_doc_length),
        num_docs=dev.corpus_size, blk_bits=dev.blk_bits, kind=kind,
        doc_block=doc_block, max_words_per_block=maxw, interpret=True,
    )
    want = scoring.score_term_dense(dev, tid, kind=kind)
    assert np.allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                       atol=1e-7), f"{term}/{kind}"


def test_pallas_bounds_monotone(docs):
    dev = docs.dev
    tid = docs.term_dict.get_term_id("alpha")
    off, n, bucket = dev.term_span(tid)
    h, _ = take_term_planes(dev.hdrs, dev.pays, off, n,
                            bucket=bucket, blk_bits=dev.blk_bits)
    bounds = np.asarray(block_bounds(h, dev.blk_bits, dev.corpus_size, 128))
    assert np.all(np.diff(bounds) >= 0)
    assert bounds[-1] == n


def test_pallas_integrated_path_matches(docs):
    """Force the integrated Pallas policy and compare with the XLA path."""
    from searcharray_tpu.search import scoring as S

    dev = docs.dev
    tid = docs.term_dict.get_term_id("alpha")
    old = S.PALLAS_MODE
    try:
        S.PALLAS_MODE = "never"
        want = np.asarray(S.score_term_dense(dev, tid, kind="bm25"))
        S.PALLAS_MODE = "always"
        # interpret mode on CPU backends
        import jax

        if jax.default_backend() != "tpu":
            fn = S._pallas_term_fn(dev, dev.term_span(tid)[2], "bm25", 1.2,
                                   0.75, interpret=True)
            off, n, _ = dev.term_span(tid)
            idf = S.host_idf("bm25", [int(dev.doc_freqs[tid])],
                             dev.corpus_size, dev.avg_doc_length)
            got = np.asarray(fn(dev.hdrs, dev.pays, off, n, dev.doc_lens,
                                np.float32(idf),
                                np.float32(dev.avg_doc_length)))
        else:
            got = np.asarray(S.score_term_dense(dev, tid, kind="bm25"))
    finally:
        S.PALLAS_MODE = old
    assert np.allclose(got, want, rtol=1e-6, atol=1e-7)


def test_segment_sum_pallas_matches_scatter():
    import jax.numpy as jnp

    from searcharray_tpu.ops.pallas.score import segment_sum_pallas

    rng = np.random.default_rng(4)
    M, N = 5000, 700
    docs = np.sort(rng.integers(0, N, M)).astype(np.int32)
    # padding tail: out-of-range ids must be dropped
    docs[-100:] = 2**30
    vals = rng.random(M).astype(np.float32)
    got = np.asarray(
        segment_sum_pallas(jnp.asarray(docs), jnp.asarray(vals),
                           num_docs=N, max_words_per_block=4096,
                           doc_block=256, interpret=True)
    )
    want = np.zeros(N, np.float32)
    np.add.at(want, docs[docs < N], vals[docs < N])
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)
