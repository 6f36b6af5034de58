"""Verify drive: user-journey over the library surface (verify skill)."""
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import pickle

import numpy as np
import pandas as pd

from searcharray_tpu import SearchArray
from searcharray_tpu.index.builder import std_tokenizer
from searcharray_tpu.solr import edismax


def log(m):
    print(m, flush=True)


corpus = [
    "the quick brown fox jumps over the lazy dog",
    "star trek deep space nine",
    "what is the purpose of life",
    "the the the repeated tokens the",
    "Quick FOX! and (punctuation) tests...",
    "", "unicode café naïve 中文",
] * 40

arr = SearchArray.index(corpus, tokenizer=std_tokenizer)
log(f"indexed {len(arr)} docs, platform={jax.devices()[0].platform}")

s = np.asarray(arr.score("fox"))
assert s.shape == (len(corpus),) and s[0] > 0 and s[1] == 0
log(f"score(term) ok: fox[0]={s[0]:.3f}")

p = np.asarray(arr.score(["star", "trek"]))
assert p[1] > 0 and p[0] == 0
log(f"score(phrase) ok: star trek[1]={p[1]:.3f}")

tf = arr.termfreqs(["quick", "fox"], slop=1)
assert tf[0] > 0
log(f"termfreqs slop=1 ok: {tf[:3]}")

# cache_gt_than wiring: warm() must honor the threshold
arr2 = SearchArray.index(corpus, autowarm=False, cache_gt_than=10)
assert arr2._state.cache_gt_than == 10
arr2.warm()
log("cache_gt_than threaded through index()->warm() ok")

df = pd.DataFrame({"title": arr, "body": arr})
e = edismax(df, q="star trek", qf=["title^2", "body"], pf=["title"], mm=2)
scores = np.asarray(e[0] if isinstance(e, tuple) else e)
assert scores[1] > 0 and scores[0] == 0
log(f"edismax ok: {scores[1]:.3f}")

view = arr[1::2]
assert np.asarray(view.score("trek")).shape == (len(view),)
row = arr[0]
assert row.termfreq("the") == 2
log("slicing + row scalar ok")

blob = pickle.dumps(arr)
arr3 = pickle.loads(blob)
assert np.allclose(np.asarray(arr3.score("fox")), s)
log("pickle round-trip ok")

sc, ix = arr.score_batch(["fox", ["star", "trek"], "zzz_missing"], top_k=5)
assert sc.shape == (3, 5) and sc[2].max() == 0
log("score_batch top_k ok")

# probes: setitem then rescore (df must update); like the reference,
# __setitem__ accepts dict/Terms/NaN — not raw strings; scoring needs
# positions, so assign a Terms row built by the tokenizer
tmp = SearchArray.index(["replacement text entirely"],
                        tokenizer=std_tokenizer, autowarm=False)
arr4 = arr.copy()
arr4[0] = tmp[0]
assert np.asarray(arr4.score("fox"))[0] == 0
assert np.asarray(arr4.score("replacement"))[0] > 0
log("__setitem__ + rescore ok")

# determinism
a = np.asarray(arr.score(["what", "is", "the"]))
b = np.asarray(arr.score(["what", "is", "the"]))
assert np.array_equal(a, b)
log("determinism ok")
log("DRIVE PASSED")
