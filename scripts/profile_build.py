"""Host cProfile of the index-build pipeline (VERDICT round-3 item 6).

Analog of the reference's ``Makefile profile:`` + cProfile wrapper
(`/root/reference/test/test_utils.py:22-51`, snakeviz via
`scripts/run_profile.sh`): profiles the slowest single step in the whole
system — ``build_index`` at scale — plus the two attach-time passes
(``compute_doc_freqs``, ``derive_attach_arrays``) and the v3 store save.

Usage:
    python scripts/profile_build.py --docs {100k,1m,8.8m} [--workers N]

Writes ``profiles/build_profile_<scale>.txt`` (checked in: the committed
evidence of where build time goes) and ``profiles/build_<scale>.prof``
(gitignored; load with pstats/snakeviz).

The cProfile pass runs with ``workers=1`` so worker-thread tokenisation is
visible to the profiler (cProfile only sees the calling thread); a second
un-profiled wall-clock pass uses the requested worker count for the real
end-to-end number.
"""
import argparse
import cProfile
import io
import os
import pstats
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # host-side work; TPU not needed

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SCALES, build_corpus  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", choices=list(SCALES), default="1m")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()
    n_docs = SCALES[args.docs]

    from searcharray_tpu.index.builder import (
        build_index,
        compute_doc_freqs,
    )
    from searcharray_tpu.index.device import derive_attach_arrays

    t0 = time.perf_counter()
    corpus = build_corpus(n_docs)
    log(f"corpus: {n_docs} docs in {time.perf_counter() - t0:.1f}s")

    # --- wall-clock stage breakdown at the requested worker count
    stages = {}
    t0 = time.perf_counter()
    built = build_index(corpus, workers=args.workers)
    stages[f"build_index(workers={args.workers})"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    built.doc_freqs = compute_doc_freqs(built.postings)
    stages["compute_doc_freqs"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    derive_attach_arrays(built)
    stages["derive_attach_arrays"] = time.perf_counter() - t0
    del built

    # --- profiled single-thread pass (cProfile sees only this thread)
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    built = build_index(corpus, workers=1)
    prof.disable()
    stages["build_index(workers=1, profiled)"] = time.perf_counter() - t0

    os.makedirs("profiles", exist_ok=True)
    prof.dump_stats(f"profiles/build_{args.docs}.prof")

    buf = io.StringIO()
    st = pstats.Stats(prof, stream=buf)
    st.strip_dirs().sort_stats("cumulative").print_stats(35)
    st.sort_stats("tottime").print_stats(25)

    out = [f"# build profile @ {args.docs} ({n_docs} docs), "
           f"{time.strftime('%Y-%m-%d')}", ""]
    out.append("## wall-clock stages")
    for k, v in stages.items():
        out.append(f"  {k:45s} {v:9.2f} s "
                   f"({n_docs / max(v, 1e-9):,.0f} docs/s)")
    out += ["", "## cProfile (workers=1 pass)", buf.getvalue()]
    path = f"profiles/build_profile_{args.docs}.txt"
    with open(path, "w") as f:
        f.write("\n".join(out))
    log(f"wrote {path}")
    print("\n".join(out[:12]))


if __name__ == "__main__":
    main()
