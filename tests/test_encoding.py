"""Encoding round-trip and property tests vs a naive per-token packer."""
import numpy as np
import pytest

from searcharray_tpu.ops import encoding as enc


def naive_encode(keys, posns):
    """Independent oracle: dict-of-dict bit packing, one token at a time."""
    words = {}
    for k, p in zip(keys, posns):
        hdr = (int(k) << 36) | ((int(p) // 18) << 18)
        words[hdr] = words.get(hdr, hdr) | (1 << (int(p) % 18))
    return np.array(sorted(words.values()), dtype=np.uint64)


@pytest.mark.parametrize("seed", range(5))
def test_encode_matches_naive(seed):
    rng = np.random.default_rng(seed)
    n = rng.integers(1, 5000)
    keys = np.sort(rng.integers(0, 50, n))
    posns = np.zeros(n, dtype=np.int64)
    for k in np.unique(keys):
        m = keys == k
        posns[m] = np.sort(rng.choice(np.arange(300), size=m.sum(), replace=False))
    words, _ = enc.encode_flat(keys, posns)
    expected = naive_encode(keys, posns)
    assert np.array_equal(words, expected)


@pytest.mark.parametrize("seed", range(5))
def test_decode_roundtrip(seed):
    rng = np.random.default_rng(seed + 100)
    n = int(rng.integers(1, 2000))
    keys = np.sort(rng.integers(0, 30, n))
    posns = np.zeros(n, dtype=np.int64)
    for k in np.unique(keys):
        m = keys == k
        posns[m] = np.sort(
            rng.choice(np.arange(1000), size=m.sum(), replace=False)
        )
    words, _ = enc.encode_flat(keys, posns)
    dk, dp = enc.decode_words(words)
    assert np.array_equal(dk.astype(np.int64), keys)
    assert np.array_equal(dp.astype(np.int64), posns)


def test_encode_with_term_boundaries():
    # two terms, same doc/posns; boundary must keep words separate per term
    keys = np.array([0, 0, 1, 0, 1, 1])
    posns = np.array([0, 1, 5, 0, 2, 40])
    starts = np.array([0, 3])
    words, bounds = enc.encode_flat(keys, posns, starts)
    assert len(bounds) == 3
    t0 = words[bounds[0] : bounds[1]]
    t1 = words[bounds[1] : bounds[2]]
    assert np.array_equal(t0, naive_encode(keys[:3], posns[:3]))
    assert np.array_equal(t1, naive_encode(keys[3:], posns[3:]))


def test_boundary_with_shared_header():
    # both terms start at (doc 0, block 0): words must not merge across terms
    keys = np.array([0, 0])
    posns = np.array([3, 4])
    words, bounds = enc.encode_flat(keys, posns, np.array([0, 1]))
    assert len(words) == 2
    assert np.array_equal(np.diff(bounds), [1, 1])


def test_max_posn_rejected():
    with pytest.raises(ValueError):
        enc.encode_flat(np.array([0]), np.array([enc.MAX_POSN + 1]))


def test_layout_constants():
    # parity with reference masks (roaringish.py:30-35)
    assert enc.KEY_MASK == np.uint64(0xFFFFFFF000000000)
    assert enc.MSB_MASK == np.uint64(0x0000000FFFFC0000)
    assert enc.LSB_MASK == np.uint64(0x000000000003FFFF)
    assert enc.MAX_POSN == 2**18 - 1


def test_word_boundary_positions():
    # positions straddling the 18-bit block boundary
    words, _ = enc.encode_flat(np.array([7, 7]), np.array([17, 18]))
    assert len(words) == 2
    assert enc.keys_of(words).tolist() == [7, 7]
    assert enc.blocks_of(words).tolist() == [0, 1]
    assert enc.payload_of(words).tolist() == [1 << 17, 1]


def test_empty():
    words, bounds = enc.encode_flat(
        np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64)
    )
    assert len(words) == 0
    k, p = enc.decode_words(words)
    assert len(k) == 0 and len(p) == 0
