"""Persistent XLA compilation cache (utils/compile_cache.py).

Restart-time operational feature with no reference counterpart: compiled
executables are replayed from disk so a resumed trainer or redeployed
server skips the multi-minute XLA compile. Here: the knob is a no-op when
unset, resolves from the env var, and a jitted program actually lands
entries in the directory. tests/conftest.py already points the test
process at a cache dir, so every test restores the prior config value.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from diffusion_tpu.utils.compile_cache import enable_compile_cache


@pytest.fixture
def restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    try:  # re-point the backend at the restored dir (see compile_cache.py)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:
        pass


def test_noop_when_unset(monkeypatch, restore_cache_config):
    monkeypatch.delenv("DIFFUSION_TPU_COMPILE_CACHE", raising=False)
    before = jax.config.jax_compilation_cache_dir
    assert enable_compile_cache(None) is None
    assert jax.config.jax_compilation_cache_dir == before


def test_env_var_fallback(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.setenv("DIFFUSION_TPU_COMPILE_CACHE", str(tmp_path / "env"))
    got = enable_compile_cache(None)
    assert got == str(tmp_path / "env") and os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got


def test_cache_populates(tmp_path, restore_cache_config):
    d = enable_compile_cache(tmp_path / "cc", min_compile_time_secs=0.0)
    assert d and os.path.isdir(d)

    @jax.jit
    def f(x):
        return (x @ x).sum()

    float(f(jnp.ones((64, 64), jnp.float32)))
    assert os.listdir(d), "compiled executable was not persisted"
