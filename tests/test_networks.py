"""Network shape/gradient tests at tiny geometry (the reference's own trick:
real architecture, tiny spatial size — reference tests/test_model.py:13-28)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tpu.models.clip import (CLIPTextConfig, CLIPTextModel,
                                       CLIPVisionConfig, CLIPVisionModel)
from diffusion_tpu.models.unet import UNet2DCondition, UNetConfig
from diffusion_tpu.models.vae import AutoencoderKL, DiagonalGaussian, VAEConfig

TINY_UNET = UNetConfig(in_channels=4, out_channels=4, block_out_channels=(32, 64),
                       layers_per_block=1, block_has_attention=(True, False),
                       attention_head_dim=(2, 4), cross_attention_dim=16,
                       norm_num_groups=8)
TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_num_groups=8)
TINY_TEXT = CLIPTextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=16)


def test_unet_shapes_and_grad():
    m = UNet2DCondition(TINY_UNET)
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([3, 7])
    ctx = jnp.ones((2, 5, 16))
    # jit everything: one cached executable instead of hundreds of eager
    # dispatches (compile cost dominates this 1-core host, conftest pins a
    # persistent compile cache)
    params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)
    out = jax.jit(m.apply)(params, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    assert out.dtype == jnp.float32

    def loss(p):
        return jnp.mean(m.apply(p, x, t, ctx) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)


def test_unet_remat_matches():
    m = UNet2DCondition(TINY_UNET)
    mr = UNet2DCondition(TINY_UNET, remat=True)
    x = jnp.ones((1, 8, 8, 4)) * 0.3
    t = jnp.array([5])
    ctx = jnp.ones((1, 5, 16)) * 0.1
    params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)
    a = jax.jit(m.apply)(params, x, t, ctx)
    b = jax.jit(mr.apply)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_unet_timestep_broadcast():
    m = UNet2DCondition(TINY_UNET)
    x = jnp.ones((2, 8, 8, 4))
    ctx = jnp.ones((2, 5, 16))
    params = m.init(jax.random.key(0), x, jnp.array([1, 1]), ctx)
    a = m.apply(params, x, jnp.asarray(1), ctx)       # scalar t broadcasts
    b = m.apply(params, x, jnp.array([1, 1]), ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_vae_roundtrip_shapes():
    m = AutoencoderKL(TINY_VAE)
    x = jnp.ones((2, 16, 16, 3))
    rng = jax.random.key(0)
    params = m.init(rng, x, rng)
    post = m.apply(params, x, method=m.encode)
    assert isinstance(post, DiagonalGaussian)
    assert post.mean.shape == (2, 8, 8, 4)            # 2 blocks -> /2 downsample
    z = post.sample(jax.random.key(1))
    dec = m.apply(params, z, method=m.decode)
    assert dec.shape == (2, 16, 16, 3)


def test_vae_posterior_stats():
    moments = jnp.concatenate([jnp.full((1, 2, 2, 4), 3.0),
                               jnp.zeros((1, 2, 2, 4))], axis=-1)
    post = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(post.mean), 3.0)
    np.testing.assert_allclose(np.asarray(post.std), 1.0)
    assert post.mode().shape == (1, 2, 2, 4)
    s1 = post.sample(jax.random.key(0))
    s2 = post.sample(jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))  # deterministic in key


def test_clip_text_shapes_and_pooling():
    m = CLIPTextModel(TINY_TEXT)
    ids = jnp.array([[1, 5, 9, 63, 0, 0], [1, 7, 63, 0, 0, 0]], jnp.int32)
    params = m.init(jax.random.key(0), ids)
    hidden, pooled = m.apply(params, ids)
    assert hidden.shape == (2, 6, 32)
    assert pooled.shape == (2, 32)
    # pooled = hidden at argmax(ids) (the EOT position, id 63 here)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(hidden[0, 3]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled[1]), np.asarray(hidden[1, 2]), rtol=1e-6)


def test_clip_text_causality():
    """Changing a later token must not affect earlier hidden states."""
    m = CLIPTextModel(TINY_TEXT)
    ids_a = jnp.array([[1, 5, 9, 11, 13, 63]], jnp.int32)
    ids_b = ids_a.at[0, 4].set(20)
    params = m.init(jax.random.key(0), ids_a)
    ha, _ = m.apply(params, ids_a)
    hb, _ = m.apply(params, ids_b)
    np.testing.assert_allclose(np.asarray(ha[0, :4]), np.asarray(hb[0, :4]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(ha[0, 4]), np.asarray(hb[0, 4]))


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig(image_size=16, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4)
    m = CLIPVisionModel(cfg)
    x = jnp.ones((2, 16, 16, 3))
    params = m.init(jax.random.key(0), x)
    hidden, pooled = m.apply(params, x)
    assert hidden.shape == (2, 5, 32)   # 4 patches + CLS
    assert pooled.shape == (2, 32)
