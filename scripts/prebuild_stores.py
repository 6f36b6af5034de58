"""Pre-build the bench index stores on CPU so TPU bench runs just load.

The v3 store is platform-agnostic (numpy arrays + derived attach planes);
building it on CPU while the TPU is busy measuring another tier
parallelizes the round.  Usage:

    python scripts/prebuild_stores.py 1m 8.8m
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    tiers = sys.argv[1:] or ["1m"]
    for key in tiers:
        n = bench.SCALES[key]
        print(f"=== building {key} body store ===", flush=True)
        bench.get_index(key, n, ".bench_cache", ".bench_cache")
        print(f"=== building {key} title store ===", flush=True)
        bench.get_title_index(key, n, ".bench_cache", ".bench_cache")
    print("done", flush=True)


if __name__ == "__main__":
    main()
