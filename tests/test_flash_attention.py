"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import os

os.environ["DIFFUSION_TPU_PALLAS_INTERPRET"] = "1"  # before module import

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tpu.ops.attention import _xla_attention
from diffusion_tpu.ops.flash_attention import flash_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("sq,skv", [(256, 256), (256, 128)])
def test_forward_matches_xla(sq, skv):
    k0, k1, k2 = jax.random.split(jax.random.key(0), 3)
    q = _rand(k0, (2, sq, 2, 64))
    k = _rand(k1, (2, skv, 2, 64))
    v = _rand(k2, (2, skv, 2, 64))
    got = flash_attention(q, k, v)
    want = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_backward_matches_xla():
    k0, k1, k2 = jax.random.split(jax.random.key(1), 3)
    q = _rand(k0, (1, 128, 2, 64))
    k = _rand(k1, (1, 128, 2, 64))
    v = _rand(k2, (1, 128, 2, 64))

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=f"d{name}")


def test_bf16_forward():
    k0, k1, k2 = jax.random.split(jax.random.key(2), 3)
    q = _rand(k0, (1, 128, 1, 64), jnp.bfloat16)
    k = _rand(k1, (1, 128, 1, 64), jnp.bfloat16)
    v = _rand(k2, (1, 128, 1, 64), jnp.bfloat16)
    got = flash_attention(q, k, v).astype(jnp.float32)
    want = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)
