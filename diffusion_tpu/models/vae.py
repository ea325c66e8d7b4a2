"""Flax AutoencoderKL — latent codec for latent diffusion.

TPU-native equivalent of diffusers.AutoencoderKL as used by the reference
(reference: diffusion/models/models.py:80-85 loads the SD2 VAE;
stable_diffusion.py:167 `vae.encode(x)['latent_dist'].sample()`,
:174 x0.18215 scaling, :379-380 `vae.decode(latents).sample`).

SD2 geometry: encoder block channels (128,256,512,512) with 2 resnets per
block, mid res-attn-res, latent 4ch (8 moments); decoder mirrors with 3
resnets per block. NHWC layout; norms compute in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_tpu.models.layers import GroupNorm, ResnetBlock, Upsample

__all__ = ["VAEConfig", "AutoencoderKL", "DiagonalGaussian", "SD2_VAE"]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


SD2_VAE = VAEConfig()


class DiagonalGaussian:
    """Posterior q(z|x): split moments into (mean, logvar); sample/mode/kl."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(jnp.square(self.mean) + jnp.exp(self.logvar)
                             - 1.0 - self.logvar, axis=(1, 2, 3))


class _VaeAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hidden = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="group_norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(hidden)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(hidden)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(hidden)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bqk,bkc->bqc", probs, v)
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(b, h, w, c)


class _DownsampleAsym(nn.Module):
    """VAE stride-2 downsample with (0,1) right/bottom padding (diffusers parity)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VAEConfig = SD2_VAE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        n = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch, use_time_emb=False, groups=cfg.norm_num_groups,
                                epsilon=1e-6, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i < n - 1:
                h = _DownsampleAsym(out_ch, dtype=self.dtype,
                                    name=f"down_{i}_downsample")(h)
        mid = cfg.block_out_channels[-1]
        h = ResnetBlock(mid, use_time_emb=False, groups=cfg.norm_num_groups,
                        epsilon=1e-6, dtype=self.dtype, name="mid_res_0")(h)
        h = _VaeAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(mid, use_time_emb=False, groups=cfg.norm_num_groups,
                        epsilon=1e-6, dtype=self.dtype, name="mid_res_1")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype,
                      act="silu", name="conv_norm_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig = SD2_VAE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock(rev[0], use_time_emb=False, groups=cfg.norm_num_groups,
                        epsilon=1e-6, dtype=self.dtype, name="mid_res_0")(h)
        h = _VaeAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(rev[0], use_time_emb=False, groups=cfg.norm_num_groups,
                        epsilon=1e-6, dtype=self.dtype, name="mid_res_1")(h)
        n = len(rev)
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(out_ch, use_time_emb=False, groups=cfg.norm_num_groups,
                                epsilon=1e-6, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h)
            if i < n - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype,
                      act="silu", name="conv_norm_out")(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode(x) -> DiagonalGaussian over (B, H/8, W/8, 4); decode(z) -> image."""

    config: VAEConfig = SD2_VAE
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments.astype(jnp.float32))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        posterior = self.encode(x)
        return self.decode(posterior.sample(rng))
