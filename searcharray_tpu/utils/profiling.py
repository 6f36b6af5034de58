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
        if hasattr(dev, "dev"):
            dev = dev.dev
        for name in ("hdrs", "pays", "doc_lens", "offsets", "lengths"):
            arr = getattr(dev, name, None)
            if arr is not None and hasattr(arr, "nbytes"):
                report[f"index.{name}"] = int(arr.nbytes)
        report["index.total"] = sum(
            v for k, v in report.items() if k.startswith("index.")
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
