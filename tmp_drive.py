"""Verify drive: user-journey over the library surface on the real TPU."""
import pickle
import sys

import numpy as np
import pandas as pd

from searcharray_tpu import SearchArray
from searcharray_tpu.index.builder import std_tokenizer
from searcharray_tpu.solr import edismax


def log(m):
    print(m, flush=True)


corpus = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sleeps all day long",
    "foxes and dogs are natural enemies they say",
    "the dog barks at the quick red fox again",
    "nothing to see here just plain text",
] * 200
arr = SearchArray.index(corpus, tokenizer=std_tokenizer)
log(f"indexed {len(arr)} docs")

s = arr.score("fox")
assert s.shape == (1000,) and s[0] > 0 and s[4] == 0
log(f"score(term) ok: {float(s[0]):.3f}")

sp = arr.score(["quick", "brown"])
assert sp[0] > 0 and sp[1] > 0 and sp[3] == 0
log(f"score(phrase) ok: {float(sp[0]):.3f}")

tf = arr.termfreqs(["quick", "fox"], slop=2)
assert tf[3] > 0  # "quick red fox" within slop 2
log(f"termfreqs slop ok: {float(tf[3]):.1f}")

df = pd.DataFrame({"title": SearchArray.index(corpus[:40]),
                   "body": SearchArray.index(corpus[:40])})
sc, _expl = edismax(df, q="quick fox", qf=["title^2", "body"],
                    pf=["title"], tie=0.3)
sc = np.asarray(sc)
assert sc.shape == (40,) and sc.max() > 0
log(f"edismax ok: max {sc.max():.3f}")

view = arr[1::2]
assert float(view.score("fox")[0]) == 0.0  # doc1 has no fox
t0 = arr[0]
assert "fox" in repr(t0) or t0.termfreq("fox") >= 0
log("slicing + row scalar ok")

blob = pickle.dumps(arr)
arr2 = pickle.loads(blob)
assert np.allclose(np.asarray(arr2.score("fox")), np.asarray(s))
log("pickle round-trip ok")

scores, idx = arr.score_batch(["fox", ["quick", "brown"], "dog"], top_k=5)
assert scores.shape == (3, 5)
sc2, _ = arr.score_batch(["fox", ["quick", "brown"], "dog"], top_k=5)
assert np.allclose(np.asarray(scores), np.asarray(sc2))
log("score_batch + determinism ok")

log("DRIVE PASSED")
