# Developer entry points (reference Makefile parity: test / test-gpu ->
# test / test-tpu, plus the distributed target the reference declared but
# never implemented — here it actually runs the 8-device dry run).

.PHONY: test test-fast test-tpu test-dist bench bench-data lint audit-spmd \
	profile-step

test:
	python -m pytest tests/ -x -q

# quick signal (~4 min on the 1-core CI host): skips the multi-minute
# trainer-fit / SPMD-compile / composition tests, which `make test` covers
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

# run the suite against the real chip (drops the CPU-mesh override)
test-tpu:
	DIFFUSION_TPU_TEST_TPU=1 python -m pytest tests/ -x -q -m "not cpu_only"

# multi-device sharding validation on the virtual CPU mesh
test-dist:
	python __graft_entry__.py

bench:
	python bench.py

# host-side input-pipeline throughput (decoded img/s vs per-chip demand)
bench-data:
	BENCH_DATA=1 python bench.py

# full-geometry SPMD audit: AOT-compile the 866M train step on the 8-device
# virtual mesh for every shipped mesh family; fails on partitioner
# rematerialization fallbacks, writes assets/spmd_audit.json
audit-spmd:
	python tools/audit_spmd.py

# per-phase step timing + MFU breakdown on the real chip
profile-step:
	python tools/profile_step.py

# real lint: ruff when installed (CI installs it; [tool.ruff] in
# pyproject.toml), else the in-image AST checker — either FAILS on an
# unused import; compileall still gates syntax across every tree
lint:
	python -m compileall -q diffusion_tpu tests scripts tools bench.py run.py
	@if python -c "import ruff" 2>/dev/null; then \
		python -m ruff check diffusion_tpu tests scripts tools bench.py run.py; \
	else \
		python tools/lint.py; \
	fi
