"""Render kernel benchmark history (bench_history.jsonl) over commits.

The analog of the reference's scripts/graph_benchmarks.py (which plots
pytest-benchmark JSON over git history, reference:9-60): one series per
kernel metric, grouped by device kind so a CPU run never visually
"regresses" a TPU series.  Writes a PNG when matplotlib is available and
always prints an ASCII table to stdout.

Usage:  python scripts/graph_benchmarks.py [--out benchmarks.png]
"""
import argparse
import json
import os
import sys

HISTORY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_history.jsonl")


def load_history(path=HISTORY):
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "results" in rec:
                rows.append(rec)
    return rows


def ascii_table(rows, stream=sys.stdout):
    by_dev = {}
    for r in rows:
        by_dev.setdefault(r.get("device", "?"), []).append(r)
    for dev, recs in by_dev.items():
        metrics = sorted({k for r in recs for k in r["results"]
                          if k.endswith("_ms")})
        stream.write(f"\n== {dev} ({len(recs)} runs) ==\n")
        header = f"{'metric':30s}" + "".join(
            f"{(r.get('commit') or '?')[:9]:>12s}" for r in recs)
        stream.write(header + "\n")
        for m in metrics:
            vals = "".join(
                f"{r['results'].get(m, float('nan')):12.2f}" for r in recs)
            stream.write(f"{m:30s}{vals}\n")


def plot(rows, out):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover - matplotlib optional
        print(f"matplotlib unavailable ({e}); ASCII table only",
              file=sys.stderr)
        return False
    by_dev = {}
    for r in rows:
        by_dev.setdefault(r.get("device", "?"), []).append(r)
    fig, axes = plt.subplots(len(by_dev), 1,
                             figsize=(10, 4 * len(by_dev)), squeeze=False)
    for ax, (dev, recs) in zip(axes[:, 0], by_dev.items()):
        metrics = sorted({k for r in recs for k in r["results"]
                          if k.endswith("_ms")})
        xs = range(len(recs))
        for m in metrics:
            ys = [r["results"].get(m) for r in recs]
            ax.plot(xs, ys, marker="o", label=m)
        ax.set_yscale("log")
        ax.set_title(f"{dev} kernel latencies over runs (ms, log)")
        ax.set_xticks(list(xs))
        ax.set_xticklabels([(r.get("commit") or "?")[:9] for r in recs],
                           rotation=45, fontsize=7)
        ax.legend(fontsize=6, ncol=2)
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}", file=sys.stderr)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks.png")
    ap.add_argument("--history", default=HISTORY)
    args = ap.parse_args()
    rows = load_history(args.history)
    if not rows:
        print("no history at " + args.history, file=sys.stderr)
        sys.exit(1)
    ascii_table(rows)
    plot(rows, args.out)


if __name__ == "__main__":
    main()
