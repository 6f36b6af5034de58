"""searcharray_tpu — a TPU-native lexical search engine.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
softwaredoug/searcharray: roaringish positional postings, Lucene-parity
BM25/TF-IDF scoring, exact & slop phrase matching, Solr edismax query
composition, and a pandas ExtensionArray facade — designed for
single-chip and multi-chip (sharded) TPU execution.
"""
import jax as _jax

# Posting words are stored host-side as numpy uint64 (28-bit doc key |
# 18-bit block | 18-bit bitmap); device kernels decompose them into 32-bit
# planes, so the library does NOT need jax_enable_x64 and no longer flips
# it globally (doing so silently changed dtypes of the host application's
# own JAX code).  Set SEARCHARRAY_TPU_X64=1 to restore the old behavior.
import os as _os

if _os.environ.get("SEARCHARRAY_TPU_X64") == "1":  # pragma: no cover
    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: query-kernel shapes recur across processes
# and XLA compiles are expensive (seconds each on tunneled TPUs).

_cache_dir = _os.environ.get(
    "SEARCHARRAY_TPU_CACHE",
    _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from searcharray_tpu.pandas_ext.array import SearchArray, Terms, TermsDtype  # noqa: E402,F401
from searcharray_tpu.utils.topk import SetOfResults  # noqa: E402,F401
from searcharray_tpu.solr import edismax, edismax_batch  # noqa: E402,F401

__version__ = "0.1.0"
__all__ = ["SearchArray", "Terms", "TermsDtype", "SetOfResults", "edismax",
           "edismax_batch"]
