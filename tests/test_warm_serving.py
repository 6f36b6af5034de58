"""AOT serving warm-up must cover the driver's shape classes and leave
scores unchanged."""
import numpy as np

from searcharray_tpu import SearchArray


def test_warm_serving_covers_shapes_and_preserves_scores():
    rng = np.random.default_rng(31)
    vocab = ["h1", "h2"] + [f"r{i}" for i in range(100)]
    probs = np.concatenate([[0.3, 0.25], np.full(100, 0.45 / 100)])
    corpus = [" ".join(rng.choice(vocab, size=rng.integers(4, 40), p=probs))
              for _ in range(1200)]
    arr = SearchArray.index(corpus, autowarm=False)
    queries = ["h1", "r5", ["h1", "r5"], ["r5", "h1", "h2"]]
    baseline = arr.score_batch(queries)
    n = arr.warm_serving(batch_sizes=(1, 4), slops=(0, 1),
                         phrase_lens=(2, 3))
    assert n > 0
    after = arr.score_batch(queries)
    np.testing.assert_allclose(after, baseline, rtol=1e-6, atol=1e-6)


def test_warm_serving_empty_index():
    arr = SearchArray.index(["", ""])
    assert arr.warm_serving() == 0
