"""Render benchmark history as charts (the TPU analog of the reference's
`scripts/graph_benchmarks.py:9-60`, which plots pytest-benchmark means
over git history).

Two panels from this repo's history artifacts:

* kernel microbenchmarks over commits (`bench_history.jsonl`, written by
  `scripts/microbench.py` — TPU entries only, and entries whose
  ``noop_dispatch_ms`` marks a degraded tunnel are drawn hollow);
* headline qps over rounds (`BENCH_r*.json` driver captures plus the
  per-tier `BENCH-*.json` artifacts).

Usage: python scripts/graph_bench_history.py [-o bench_history.png]
Writes a PNG; never needs a display (Agg backend).
"""
import argparse
import glob
import json
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# a TPU entry whose noop round trip is >3x the known-good ~6-30 ms tunnel
# figure was measured through a degraded tunnel (same rule as the
# microbench regression gate) — plot it hollow, don't connect it
NOOP_HEALTHY_MS = 90.0


def load_micro():
    path = os.path.join(REPO, "bench_history.jsonl")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def load_rounds():
    rounds = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)", p)
        try:
            d = json.load(open(p))
        except Exception:
            continue
        if m and isinstance(d.get("value"), (int, float)):
            rounds.append((int(m.group(1)), d["value"]))
    tiers = {}
    for key in ("100k", "1m", "8.8m"):
        p = os.path.join(REPO, f"BENCH-{key}.json")
        if os.path.exists(p):
            d = json.load(open(p))
            if isinstance(d.get("value"), (int, float)):
                tiers[key] = d
    return sorted(rounds), tiers


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--out", default=os.path.join(
        REPO, "profiles", "bench_history.png"))
    args = ap.parse_args()

    micro = [r for r in load_micro() if "tpu" in str(r.get("device", "")).lower()
             or "TPU" in str(r.get("device", ""))]
    rounds, tiers = load_rounds()

    fig, axes = plt.subplots(1, 2, figsize=(13, 5))

    ax = axes[0]
    metrics = ["noop_dispatch_ms", "topk_exact_8.8M_ms", "align_imap_ms",
               "phrase_chain_batch_ms", "pool_fill_16x2_ms"]
    if micro:
        xs = range(len(micro))
        labels = [str(r.get("commit", "?"))[:7] for r in micro]
        healthy = [float(r.get("results", {}).get("noop_dispatch_ms", 0))
                   <= NOOP_HEALTHY_MS for r in micro]
        for m in metrics:
            ys = [r.get("results", {}).get(m) for r in micro]
            if not any(y is not None for y in ys):
                continue
            pts = [(x, y) for x, y in zip(xs, ys) if y is not None]
            ax.plot([x for x, _ in pts], [y for _, y in pts],
                    marker="o", label=m, alpha=0.85)
            for (x, y), h in zip(pts, [healthy[x] for x, _ in pts]):
                if not h:
                    ax.plot(x, y, marker="o", mfc="white", mec="red",
                            ms=10, ls="none")
        ax.set_xticks(list(xs), labels, rotation=45, ha="right")
        ax.set_yscale("log")
        ax.set_ylabel("ms (log)")
        ax.set_title("kernel microbenchmarks over commits (TPU)\n"
                     "hollow red = degraded-tunnel sample")
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.3)
    else:
        ax.text(0.5, 0.5, "no TPU entries in bench_history.jsonl",
                ha="center", va="center")

    ax = axes[1]
    if rounds:
        ax.plot([r for r, _ in rounds], [v for _, v in rounds], marker="o",
                label="driver tier (100k) qps", color="tab:blue")
    for key, color in (("100k", "tab:blue"), ("1m", "tab:orange"),
                       ("8.8m", "tab:green")):
        d = tiers.get(key)
        if d:
            ax.axhline(d["value"], ls="--", color=color, alpha=0.5,
                       label=f"latest {key}: {d['value']:.0f} qps")
    ax.set_xlabel("round")
    ax.set_ylabel("qps")
    ax.set_yscale("log")
    ax.set_title("headline throughput over rounds")
    ax.legend(fontsize=8)
    ax.grid(True, alpha=0.3)

    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
