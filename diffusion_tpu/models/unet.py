"""Flax UNet2DCondition — the denoising network, rebuilt TPU-first.

TPU-native equivalent of diffusers.UNet2DConditionModel as configured by the
reference (reference: diffusion/models/models.py:74-78 loads the SD2-base
config — 4->4ch latent UNet, block channels (320,640,1280,1280), 2 layers per
block, heads (5,10,20,20) with 64-dim heads, cross-attention dim 1024,
use_linear_projection; models.py:124-129 the pixel variant — 3->3ch,
cross-attention 768).

Design deltas from the reference stack, for TPU:
- NHWC layout end to end (XLA TPU convs want features-last).
- Attention runs through ops/attention.py (Pallas flash kernel on long
  spatial sequences, replacing xformers CUDA kernels).
- Optional per-block rematerialization (`remat`) to trade MXU FLOPs for HBM,
  enabling large micro-batches at 512^2.
- The whole forward is shape-static and jit-compiled once per resolution.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_tpu.models.layers import (Downsample, GroupNorm, ResnetBlock,
                                         TimestepEmbedding, Transformer2D,
                                         Upsample, timestep_embedding)
from diffusion_tpu.parallel.sharding import constrain_batch

__all__ = ["UNetConfig", "UNet2DCondition", "SD2_BASE_UNET", "PIXEL_UNET"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # True = cross-attention transformer in this down block (mirrored for up)
    block_has_attention: Tuple[bool, ...] = (True, True, True, False)
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)  # = num heads (diffusers naming)
    cross_attention_dim: int = 1024
    transformer_depth: int = 1
    use_linear_projection: bool = True
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    norm_num_groups: int = 32
    dropout: float = 0.0
    # LoRA adapters on every attention projection (models/layers.py
    # Attention): 0 = off (base tree identical to pre-LoRA checkpoints).
    # Pairs with StableDiffusion.train_lora_only for adapter-only finetunes.
    lora_rank: int = 0
    lora_alpha: Optional[float] = None

    @property
    def head_dim(self) -> Tuple[int, ...]:
        return tuple(c // h for c, h in zip(self.block_out_channels,
                                            self.attention_head_dim))


# SD-2.0-base geometry (reference models.py:74-78 via the HF config)
SD2_BASE_UNET = UNetConfig()

# pixel-space variant (reference models.py:124-129, 198-203)
PIXEL_UNET = UNetConfig(in_channels=3, out_channels=3, cross_attention_dim=768)


class UNet2DCondition(nn.Module):
    config: UNetConfig = SD2_BASE_UNET
    dtype: Any = jnp.float32
    remat: bool = False
    # 'full' recomputes whole blocks (max memory win); 'dots' saves MXU
    # outputs and recomputes only elementwise/VPU work (~1.1x FLOPs, still
    # drops the big norm/activation residuals from HBM)
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """sample (B,H,W,Cin) NHWC, timesteps (B,), context (B,S,cross_dim).

        `deterministic=False` activates ResnetBlock dropout (cfg.dropout);
        callers must then supply a 'dropout' rng to apply()."""
        cfg = self.config
        if self.remat:
            if self.remat_policy == "dots":
                # save MXU outputs AND the flash-attention residuals (named
                # in ops/flash_attention.py): the Pallas kernel is not a
                # dot, so without the name policy the O(S^2) attention
                # forward re-runs inside the backward pass. lax.conv is not
                # a dot_general either — DIFFUSION_TPU_SAVE_CONVS=1 also
                # saves conv outputs (more HBM, fewer recomputed FLOPs).
                # measured on v5e @512px/batch 8: saving convs 25.8 -> 26.7
                # img/s, neutral @256px/batch 24 (103 img/s both ways)
                names = ["flash_out", "flash_lse"]
                if os.environ.get("DIFFUSION_TPU_SAVE_CONVS", "1") == "1":
                    names.append("conv_out")
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(*names))
            else:
                policy = None
            Res = nn.remat(ResnetBlock, policy=policy)
            Attn = nn.remat(Transformer2D, policy=policy)
        else:
            Res, Attn = ResnetBlock, Transformer2D

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                  flip_sin_to_cos=cfg.flip_sin_to_cos,
                                  downscale_freq_shift=cfg.freq_shift)
        time_embed_dim = cfg.block_out_channels[0] * 4
        temb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(temb.astype(self.dtype))
        # anchor temb's batch sharding once here: every ResnetBlock consumes
        # it, and an unconstrained (B, 4C) tensor otherwise inherits whatever
        # the sinusoidal producer had, misaligned with the activations'
        # full batch sharding (see assets/spmd_audit.json provenance)
        temb = constrain_batch(temb)

        context = encoder_hidden_states.astype(self.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        # batch-sharding anchors after every block keep SPMD propagation
        # from wandering on the GroupNorm reshapes (multi-chip meshes would
        # otherwise compile replicate-then-repartition resharding)
        h = constrain_batch(h)

        num_blocks = len(cfg.block_out_channels)
        residuals = [h]
        # ---- down path
        for i in range(num_blocks):
            out_ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block):
                h = Res(out_ch, groups=cfg.norm_num_groups, dropout=cfg.dropout,
                        deterministic=deterministic,
                        dtype=self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                if cfg.block_has_attention[i]:
                    h = Attn(cfg.attention_head_dim[i], cfg.head_dim[i],
                             depth=cfg.transformer_depth,
                             use_linear_projection=cfg.use_linear_projection,
                             groups=cfg.norm_num_groups, dtype=self.dtype,
                             lora_rank=cfg.lora_rank,
                             lora_alpha=cfg.lora_alpha,
                             name=f"down_{i}_attn_{j}")(h, context)
                h = constrain_batch(h)
                residuals.append(h)
            if i < num_blocks - 1:
                h = Downsample(out_ch, dtype=self.dtype,
                               name=f"down_{i}_downsample")(h)
                h = constrain_batch(h)
                residuals.append(h)

        # ---- mid
        mid_ch = cfg.block_out_channels[-1]
        h = Res(mid_ch, groups=cfg.norm_num_groups, dropout=cfg.dropout,
                        deterministic=deterministic,
                dtype=self.dtype, name="mid_res_0")(h, temb)
        h = Attn(cfg.attention_head_dim[-1], cfg.head_dim[-1],
                 depth=cfg.transformer_depth,
                 use_linear_projection=cfg.use_linear_projection,
                 groups=cfg.norm_num_groups, dtype=self.dtype,
                 lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                 name="mid_attn")(h, context)
        h = Res(mid_ch, groups=cfg.norm_num_groups, dropout=cfg.dropout,
                        deterministic=deterministic,
                dtype=self.dtype, name="mid_res_1")(h, temb)
        h = constrain_batch(h)

        # ---- up path (reversed channel order; consumes 3 skips per block)
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_attention = list(reversed(cfg.block_has_attention))
        rev_heads = list(reversed(cfg.attention_head_dim))
        rev_head_dim = list(reversed(cfg.head_dim))
        for i in range(num_blocks):
            out_ch = rev_channels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = residuals.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(out_ch, groups=cfg.norm_num_groups, dropout=cfg.dropout,
                        deterministic=deterministic,
                        dtype=self.dtype, name=f"up_{i}_res_{j}")(h, temb)
                if rev_attention[i]:
                    h = Attn(rev_heads[i], rev_head_dim[i],
                             depth=cfg.transformer_depth,
                             use_linear_projection=cfg.use_linear_projection,
                             groups=cfg.norm_num_groups, dtype=self.dtype,
                             lora_rank=cfg.lora_rank,
                             lora_alpha=cfg.lora_alpha,
                             name=f"up_{i}_attn_{j}")(h, context)
                h = constrain_batch(h)
            if i < num_blocks - 1:
                h = Upsample(out_ch, dtype=self.dtype,
                             name=f"up_{i}_upsample")(h)
                h = constrain_batch(h)

        h = GroupNorm(cfg.norm_num_groups, dtype=self.dtype, act="silu",
                      name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return h.astype(jnp.float32)
