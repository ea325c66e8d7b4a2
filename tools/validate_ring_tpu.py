#!/usr/bin/env python
"""One-off real-TPU validation of ring attention's kernel path.

The CPU suite validates ring attention's math through the XLA block path
(tests/test_ring_attention.py) — interpret-mode pallas_call under shard_map
hits a jax lowering-cache bug, so the *kernel* block path can only be
exercised on a real TPU. This script runs ring_attention on a 1-device mesh
(ring of one step, Pallas kernels active) and checks values + grads against
full attention.

  python tools/validate_ring_tpu.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from diffusion_tpu.ops.attention import _xla_attention
    from diffusion_tpu.ops.ring_attention import ring_attention

    assert jax.default_backend() == "tpu", jax.default_backend()
    k0, k1, k2 = jax.random.split(jax.random.key(0), 3)
    shape = (2, 1024, 2, 64)
    q = jax.random.normal(k0, shape)
    k = jax.random.normal(k1, shape)
    v = jax.random.normal(k2, shape)

    with Mesh(np.array(jax.devices()[:1]), ("sp",)) as mesh:
        fn = jax.jit(shard_map(
            functools.partial(ring_attention, axis_name="sp"),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp")))
        got = np.asarray(fn(q, k, v))
        want = np.asarray(_xla_attention(q, k, v, None))
        fdiff = np.max(np.abs(got - want))
        print(f"forward max abs diff: {fdiff:.3e}", flush=True)
        assert fdiff < 2e-3, fdiff  # TPU default-precision einsum reference (bf16 MXU passes); CPU tests pin exactness
        if os.environ.get("RING_TPU_SKIP_GRAD", "0") != "1":
            g = jax.jit(jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                                 argnums=(0, 1, 2)))(q, k, v)
            g = [np.asarray(x) for x in g]
            gx = jax.grad(lambda *a: jnp.sum(_xla_attention(*a, None) ** 2),
                          argnums=(0, 1, 2))(q, k, v)
            for a, b, nm in zip(g, gx, "qkv"):
                d = np.max(np.abs(a - np.asarray(b)))
                print(f"d{nm} max abs diff: {d:.3e}", flush=True)
                assert d < 2e-2, (nm, d)
    print("ring attention kernel path on TPU: values + grads match")


if __name__ == "__main__":
    main()
