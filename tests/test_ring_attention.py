"""Ring (sequence-parallel) attention vs single-device attention on the
8-device CPU mesh — values AND gradients must match exactly (the merge with
a global logsumexp is mathematically exact, not an approximation)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from diffusion_tpu.ops.attention import _xla_attention
from diffusion_tpu.ops.ring_attention import ring_attention

B, S, H, D = 2, 256, 2, 64  # 32 tokens per device on the 8-device mesh


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("sp",))


def _qkv(seed=0, s=S):
    k0, k1, k2 = jax.random.split(jax.random.key(seed), 3)
    shape = (B, s, H, D)
    return (jax.random.normal(k0, shape), jax.random.normal(k1, shape),
            jax.random.normal(k2, shape))


def _ring(mesh, q, k, v):
    fn = shard_map(
        functools.partial(ring_attention, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"))
    return fn(q, k, v)


def test_forward_matches_full_attention():
    q, k, v = _qkv(0)
    with _mesh() as mesh:
        got = _ring(mesh, q, k, v)
    want = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_gradients_match_full_attention():
    q, k, v = _qkv(1)

    def loss_ring(q, k, v, mesh):
        return jnp.sum(_ring(mesh, q, k, v) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None) ** 2)

    with _mesh() as mesh:
        g_ring = jax.grad(functools.partial(loss_ring, mesh=mesh),
                          argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6, err_msg=f"d{name}")


def test_jit_under_mesh():
    q, k, v = _qkv(2)
    with _mesh() as mesh:
        fn = jax.jit(functools.partial(_ring, mesh))
        got = fn(q, k, v)
        want = _xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)


def test_uneven_not_required_128_shards():
    """Shards below the 128-token kernel tile use the XLA block path —
    still exact (S/n = 16 here)."""
    q, k, v = _qkv(3, s=128)
    with _mesh() as mesh:
        got = _ring(mesh, q, k, v)
    want = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
