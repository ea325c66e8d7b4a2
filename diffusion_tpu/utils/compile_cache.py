"""Persistent XLA compilation cache.

TPU-native operational concern with no reference counterpart (the
reference's torch stack JIT-compiles nothing): tracing + XLA-compiling the
full SD2 train step or a serving sampler takes minutes of host time, and a
restarted job (autoresume after preemption, a redeployed inference server,
a relaunched eval sweep) pays it again from scratch. JAX's persistent
compilation cache keys compiled executables by (HLO, compile options,
backend version) and replays them from disk, so every restart after the
first is trace-only.

Enabled three ways, all funnelling here:
  - yaml: top-level `compile_cache_dir: /path` (train composition)
  - serving: `python -m diffusion_tpu.inference.serve --compile-cache /path`
  - env: DIFFUSION_TPU_COMPILE_CACHE=/path (picked up by both)

The directory is shared-safe: entries are content-addressed files, so many
hosts of a pod (or trainer + server) can point at one bucket-mounted dir.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

__all__ = ["enable_compile_cache"]

_ENV_VAR = "DIFFUSION_TPU_COMPILE_CACHE"


def enable_compile_cache(cache_dir: Optional[str] = None,
                         min_compile_time_secs: float = 1.0) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir` and return
    the resolved path (None = stay disabled).

    Falls back to $DIFFUSION_TPU_COMPILE_CACHE when `cache_dir` is None, so
    production launchers can turn caching on without touching configs.
    `min_compile_time_secs` keeps trivial sub-second programs (schedule
    evals, tokenizer-side reshapes) from churning the cache; the multi-
    minute UNet step and sampler programs are the point.
    """
    cache_dir = cache_dir or os.environ.get(_ENV_VAR)
    if not cache_dir:
        return None
    cache_dir = os.path.abspath(os.path.expanduser(str(cache_dir)))
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # jax initializes its cache backend lazily ONCE; if something compiled
    # before this call (or pointed the cache elsewhere), the new dir would
    # silently never take effect — reset so the next compile re-reads config
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:  # pragma: no cover - jax internals moved
        pass
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # cache small entries too when the floor is lowered explicitly (tests,
    # tiny models); the size floor otherwise silently drops them
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logging.getLogger(__name__).info(
        "persistent XLA compilation cache at %s (min compile time %.1fs)",
        cache_dir, min_compile_time_secs)
    return cache_dir
