"""Observability: device traces and HBM accounting.

The reference's tooling is pytest-benchmark + cProfile + memray
(SURVEY.md §5); the TPU equivalents are the jax profiler (tensorboard
traces) and per-buffer device-memory accounting.
"""
from __future__ import annotations

import contextlib
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hbm_report(index=None) -> Dict[str, int]:
    """Byte accounting of device buffers (index-level and device-level)."""
    import jax

    report: Dict[str, int] = {}
    if index is not None:
        dev = index
        # accept SearchArray, DeviceIndex, or ShardedIndex
        sharded = getattr(getattr(dev, "_state", None), "sharded", None)
        if hasattr(dev, "dev"):
            dev = dev.dev
        for name in ("hdrs", "pays", "doc_lens", "offsets", "lengths"):
            arr = getattr(dev, name, None)
            if arr is not None and hasattr(arr, "nbytes"):
                report[f"index.{name}"] = int(arr.nbytes)
        # serving pools — the largest allocations an operator sees (the
        # plane pool's budget alone is 3 GB); residency counts alongside
        for pool, slot_map, label in (
            (getattr(dev, "plane_pool", None), getattr(dev, "plane_slot",
                                                       None), "plane_pool"),
            (getattr(dev, "tf_pool", None), getattr(dev, "tf_slot", None),
             "tf_pool"),
        ):
            if pool is not None:
                report[f"pool.{label}"] = int(pool.nbytes)
                if slot_map is not None:
                    report[f"pool.{label}.slots_used"] = len(slot_map)
                    report[f"pool.{label}.slots_total"] = int(pool.shape[0])
        if sharded is not None:
            for name in ("hdrs", "pays", "doc_lens", "plane_pool",
                         "tf_pool"):
                arr = getattr(sharded, name, None)
                if arr is not None and hasattr(arr, "nbytes"):
                    report[f"sharded.{name}"] = int(arr.nbytes)
        report["index.total"] = sum(
            v for k, v in report.items()
            if (k.startswith(("index.", "sharded.")) or
                (k.startswith("pool.") and not k.endswith(
                    ("slots_used", "slots_total"))))
        )
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if key in stats:
                    report[f"device.{key}"] = int(stats[key])
    except Exception:
        pass
    return report


def format_hbm_report(index=None) -> str:
    rep = hbm_report(index)
    lines = ["HBM report", "----------"]
    for k, v in rep.items():
        lines.append(f"{k:28s} {v / 1e6:10.2f} MB")
    return "\n".join(lines)
