"""Upgrade saved indexes in place to the v3 store format.

v3 adds the derived device-attach arrays (tail-padded hdr32/pay32 planes
and the per-term block-word max — `index/device.py:derive_attach_arrays`)
so attaching a loaded index is pure upload instead of minutes of
single-core numpy at 8.8M docs (measured: 937 s of derivation moved from
every attach to this one-time upgrade).

Usage:  python scripts/upgrade_store_v3.py DIR [DIR ...]
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # pure host work
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searcharray_tpu.index.device import derive_attach_arrays  # noqa: E402
from searcharray_tpu.index.store import (  # noqa: E402
    _DERIVED_ARRAYS,
    FORMAT_VERSION,
    load_index,
)


def upgrade(directory: str) -> None:
    with open(os.path.join(directory, "index.json")) as f:
        meta = json.load(f)
    if meta["format_version"] >= 3:
        print(f"{directory}: already v{meta['format_version']}")
        return
    t0 = time.perf_counter()
    built = load_index(directory)
    der = derive_attach_arrays(built)
    for name in _DERIVED_ARRAYS:
        np.save(os.path.join(directory, name + ".npy"), np.asarray(der[name]))
    meta.update(
        format_version=FORMAT_VERSION,
        blk_bits=int(der["blk_bits"]),
        doc_block=int(der["doc_block"]),
        max_bucket=int(der["max_bucket"]),
    )
    with open(os.path.join(directory, "index.json"), "w") as f:
        json.dump(meta, f)
    print(f"{directory}: upgraded in {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        upgrade(d)
