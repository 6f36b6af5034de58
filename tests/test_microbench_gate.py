"""Regression-gate logic of scripts/microbench.py (no device work)."""
import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "microbench", os.path.join(os.path.dirname(__file__), "..",
                               "scripts", "microbench.py"))
mb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(mb)


def _write(tmp_path, entries):
    p = tmp_path / "hist.jsonl"
    with open(p, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(p)


def test_gate_flags_same_tunnel_regression(tmp_path):
    hist = _write(tmp_path, [
        {"device": "TPU v5 lite",
         "results": {"noop_dispatch_ms": 8.0, "kernel_ms": 10.0}},
    ])
    fails = mb.check_regressions(
        {"noop_dispatch_ms": 9.0, "kernel_ms": 25.0}, "TPU v5 lite",
        history=hist)
    assert len(fails) == 1 and "kernel_ms" in fails[0]


def test_gate_skips_degraded_tunnel_baseline(tmp_path):
    """An entry with a 28 ms noop must not gate a healthy 8 ms run."""
    hist = _write(tmp_path, [
        {"device": "TPU v5 lite",
         "results": {"noop_dispatch_ms": 28.0, "kernel_ms": 1.0}},
    ])
    fails = mb.check_regressions(
        {"noop_dispatch_ms": 8.0, "kernel_ms": 10.0}, "TPU v5 lite",
        history=hist)
    assert fails == []


def test_gate_skips_cross_device(tmp_path):
    hist = _write(tmp_path, [
        {"device": "cpu",
         "results": {"noop_dispatch_ms": 0.01, "kernel_ms": 1.0}},
    ])
    fails = mb.check_regressions(
        {"noop_dispatch_ms": 8.0, "kernel_ms": 10.0}, "TPU v5 lite",
        history=hist)
    assert fails == []


def test_gate_skips_atypically_fast_baseline_symmetric(tmp_path):
    """A fast-tunnel entry must not gate a degraded run either — the
    degraded run is reported by its own noop figure, not a kernel fail."""
    hist = _write(tmp_path, [
        {"device": "TPU v5 lite",
         "results": {"noop_dispatch_ms": 8.0, "kernel_ms": 1.0}},
    ])
    fails = mb.check_regressions(
        {"noop_dispatch_ms": 30.0, "kernel_ms": 10.0}, "TPU v5 lite",
        history=hist)
    assert fails == []
