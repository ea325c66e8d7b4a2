"""Test harness: force an 8-device virtual CPU mesh.

This is the TPU-world analogue of the reference's (vestigial) WORLD_SIZE=2
distributed CI (reference: Makefile:9-15, .github/workflows/pytest-cpu.yaml:57)
— sharding/pjit tests run against 8 simulated devices on one host.

The container's sitecustomize may eagerly register a TPU PJRT plugin at
interpreter startup and select it via jax_platforms, so plain
JAX_PLATFORMS=cpu is too late; we override the config and clear any
already-initialized backends before the first device query.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends
    clear_backends()
except Exception:
    pass

jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: compile cost dominates suite wall time on a
# 1-core host; re-runs hit the disk cache instead of recompiling
_cache_dir = os.environ.get("DIFFUSION_TPU_TEST_CACHE",
                            os.path.expanduser("~/.cache/diffusion_tpu_xla"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_raise_persistent_cache_errors", False)
except Exception:
    pass  # older jax: cache flags absent; compiles stay in-memory only

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
