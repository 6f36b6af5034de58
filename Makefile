# Developer entry points (reference parity: /root/reference/Makefile has
# test / lint / benchmark / profile / memory_profile — mapped here to the
# TPU framework's equivalents; no external lint/profiler deps are baked
# into this image, so lint = bytecode compile + import check).

PY ?= python

.PHONY: test lint benchmark benchmark-all microbench multichip all

test:
	$(PY) -m pytest tests/ -q

lint:
	$(PY) -m compileall -q searcharray_tpu tests bench.py __graft_entry__.py
	$(PY) -c "import searcharray_tpu"

# headline single-chip benchmark on the real TPU (one JSON line on stdout)
benchmark:
	$(PY) bench.py

# the reference's multi-scale tiering (test_msmarco.py: 100k / 1M / full):
# builds each corpus once into .bench_cache/ and reuses it on re-runs
benchmark-all:
	$(PY) bench.py --docs 100k --save .bench_cache
	$(PY) bench.py --docs 1m --save .bench_cache
	$(PY) bench.py --docs 8.8m --save .bench_cache

# kernel micro-benchmarks with regression history (scripts/microbench.py)
microbench:
	$(PY) scripts/microbench.py

# multi-chip dryrun on a virtual 8-device CPU mesh (what the driver checks)
multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -c "import __graft_entry__ as g; g.entry(); g.dryrun_multichip(8); print('multichip ok')"

all: lint test

# host-memory profile of an index build (reference memory_profile analog)
memory-profile:
	$(PY) scripts/memprofile.py
