"""Fused Pallas GroupNorm(+SiLU) vs the XLA program (interpret mode on CPU).

The kernel is the BASELINE.json north-star fused block
(ops/groupnorm.py); these tests pin it against the two-pass XLA
implementation — identical fp32-statistics math — for forward values,
all three gradients, the fused-SiLU variant, and the module-level wiring
(ResnetBlock param layout unchanged by the fusion; reference layout:
diffusers ResnetBlock2D norm1/norm2, /root/reference/diffusion/models/
stable_diffusion.py UNet import path).
"""

import os

os.environ["DIFFUSION_TPU_PALLAS_INTERPRET"] = "1"  # before module import

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tpu.ops.groupnorm import (_pallas_usable, _xla_group_norm,
                                         group_norm)


def _setup(c, seed=0, shape=(2, 6, 6)):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], (*shape, c), jnp.float32)
    scale = 1.0 + 0.2 * jax.random.normal(ks[1], (c,), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("c,g,act", [(320, 32, None), (320, 32, "silu"),
                                     (640, 32, "silu"), (64, 8, "silu")])
def test_forward_matches_xla(c, g, act):
    x, scale, bias = _setup(c)
    assert _pallas_usable(36, c, g)  # the kernel path, not the fallback
    got = group_norm(x, scale, bias, g, 1e-5, act=act)
    want = _xla_group_norm(x, scale, bias, g, 1e-5, act == "silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("act", [None, "silu"])
def test_gradients_match_xla(act):
    c, g = 320, 32
    x, scale, bias = _setup(c, seed=1, shape=(2, 4, 4))

    def f_kernel(x, s, b):
        return jnp.sum(jnp.sin(group_norm(x, s, b, g, 1e-5, act=act)))

    def f_xla(x, s, b):
        return jnp.sum(jnp.sin(_xla_group_norm(x, s, b, g, 1e-5,
                                               act == "silu")))

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(gk, gx, ("dx", "dscale", "dbias")):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


def test_bf16_input_keeps_fp32_stats():
    c, g = 320, 32
    x, scale, bias = _setup(c, seed=2)
    got = group_norm(x.astype(jnp.bfloat16), scale, bias, g, 1e-5,
                     act="silu")
    assert got.dtype == jnp.bfloat16
    want = _xla_group_norm(x.astype(jnp.bfloat16), scale, bias, g, 1e-5,
                           True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_ragged_groups_fall_back():
    # C not divisible by groups -> fallback path must still be exact
    c = 48
    x, scale, bias = _setup(c)
    assert not _pallas_usable(36, c, 32)
    got = group_norm(x, scale, bias, 8, 1e-5, act="silu")
    want = _xla_group_norm(x, scale, bias, 8, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_module_param_layout_unchanged():
    """act='silu' fusion must not move the affine params: checkpoints and
    the HF port table key on norm{1,2}/{scale,bias}."""
    from diffusion_tpu.models.layers import ResnetBlock
    blk = ResnetBlock(out_channels=64, groups=8, dtype=jnp.float32)
    x = jnp.ones((1, 4, 4, 64))
    temb = jnp.ones((1, 128))
    params = blk.init(jax.random.key(0), x, temb)
    p = params["params"]
    for norm in ("norm1", "norm2"):
        assert set(p[norm].keys()) == {"scale", "bias"}
        assert p[norm]["scale"].dtype == jnp.float32
    out = blk.apply(params, x, temb)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_unet_forward_finite_with_fused_gn():
    """Tiny UNet end-to-end through the fused path (interpret kernel)."""
    from diffusion_tpu.models.unet import UNet2DCondition, UNetConfig
    cfg = UNetConfig(block_out_channels=(64, 64), layers_per_block=1,
                     attention_head_dims=(4, 4), cross_attention_dim=32,
                     norm_num_groups=8, sample_size=8)
    net = UNet2DCondition(cfg, dtype=jnp.bfloat16)
    x = jnp.ones((2, 8, 8, 4), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 7, 32), jnp.bfloat16)
    params = net.init(jax.random.key(0), x, t, ctx)
    out = net.apply(params, x, t, ctx)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
