"""Shared Flax building blocks for the UNet / VAE / CLIP towers.

TPU-native re-implementations of the diffusers/transformers layers the
reference delegates to (reference: diffusion/models/models.py:10-14 imports
UNet2DConditionModel/AutoencoderKL/CLIPTextModel). Everything is NHWC —
the natural TPU conv layout — where the reference stack is NCHW; adapters
transpose at the batch boundary.

Precision policy: parameters live in fp32; `dtype` selects the compute dtype
(bf16 in production). Norms always reduce in fp32 — this *is* the reference's
`low_precision_groupnorm/layernorm` algorithm surface (reference:
diffusion/train.py:91-108): norm statistics in fp32, surrounding matmuls in
the low precision.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from diffusion_tpu.ops.attention import multi_head_attention
from diffusion_tpu.parallel.sharding import constrain_batch

__all__ = [
    "GroupNorm",
    "timestep_embedding",
    "TimestepEmbedding",
    "ResnetBlock",
    "Attention",
    "FeedForwardGEGLU",
    "BasicTransformerBlock",
    "Transformer2D",
    "Downsample",
    "Upsample",
]

Dtype = Any


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype.

    `act='silu'` fuses the following SiLU into the same op — on TPU the
    whole GroupNorm-SiLU runs as a single-HBM-read Pallas kernel
    (ops/groupnorm.py, the BASELINE.json fused-block north star); off-TPU
    it is the equivalent XLA program. The affine params live here either
    way, so checkpoints are layout-identical whichever path executes.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    # accepted for call-site uniformity with the other layers; the body
    # ALWAYS computes statistics in fp32 and returns the input's dtype
    # (the low-precision-norm policy) — this field does not change compute
    dtype: Dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from diffusion_tpu.ops.groupnorm import group_norm
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon,
                          act=self.act)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding parity).

    SD2 uses flip_sin_to_cos=True, freq_shift=0 (reference UNet config).
    Always fp32 — the embedding is tiny and feeds fp32-sensitive MLPs.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP lifting the sinusoidal embedding to time_embed_dim."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    """GroupNorm-SiLU-Conv residual block with additive time conditioning."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    epsilon: float = 1e-5
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    # training mode: set as a (static) module attribute so nn.remat wrappers
    # need no per-call static arguments; the call-time arg overrides
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 deterministic: Optional[bool] = None) -> jnp.ndarray:
        residual = x
        h = GroupNorm(self.groups, self.epsilon, dtype=self.dtype,
                      act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        # named so remat policies can save conv outputs: convs are MXU work
        # but lax.conv is not a dot_general, so the dots policy alone would
        # recompute every conv in the backward pass (unet.py opts in)
        h = checkpoint_name(h, "conv_out")
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            # pin the broadcast operand's batch sharding to h's: without it
            # the partitioner sees (B,1,1,C) carrying only the producer's
            # (weaker) batch sharding and falls back to replicate-then-
            # repartition on every block (tiny tensors, but 81 'involuntary
            # full rematerialization' warnings per step — assets/spmd_audit)
            h = h + constrain_batch(t[:, None, None, :])
        h = GroupNorm(self.groups, self.epsilon, dtype=self.dtype,
                      act="silu", name="norm2")(h)
        if self.dropout > 0.0:
            det = self.deterministic if deterministic is None else deterministic
            h = nn.Dropout(self.dropout)(h, deterministic=det)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        h = checkpoint_name(h, "conv_out")
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return residual + h


class Attention(nn.Module):
    """Multi-head attention over token sequences; optional cross-attention.

    Replaces xformers memory-efficient attention with the Pallas/XLA dispatch
    in ops/attention.py.

    `lora_rank > 0` adds LoRA branches (Hu et al. 2021) to each projection:
    y = Wx + (alpha/r)·B(A(x)), A random-init, B zero-init, so a freshly
    added adapter is exactly the base model. LoRA params live as sibling
    scopes (`to_q_lora_a`/`to_q_lora_b` next to `to_q`), keeping the base
    kernel paths identical to the rank-0 tree — ported HF checkpoints and
    the golden-parity fixtures load unchanged (models/lora.py partitions
    and folds these trees).
    """

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None

    def _lora(self, name: str, inp: jnp.ndarray, features: int) -> jnp.ndarray:
        scale = ((self.lora_alpha if self.lora_alpha is not None
                  else float(self.lora_rank)) / float(self.lora_rank))
        a = nn.Dense(self.lora_rank, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02),
                     name=f"{name}_lora_a")(inp)
        b = nn.Dense(features, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name=f"{name}_lora_b")(a)
        return b * scale

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        q = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_v")(ctx)
        if self.lora_rank > 0:
            q = q + self._lora("to_q", x, inner)
            k = k + self._lora("to_k", ctx, inner)
            v = v + self._lora("to_v", ctx, inner)
        b, sq = q.shape[:2]
        sk = k.shape[1]
        # tp_dim: with an active tensor-parallel axis the head dim (and the
        # head-major flattened inner dim) stay tp-sharded from the
        # column-parallel q/k/v kernels through attention into the
        # row-parallel to_out (parallel/sharding.py Megatron table).
        # tp_groups=num_heads: head shards must not split a head, so stages
        # whose head count doesn't divide by tp (SD2's 5-head top stage at
        # tp=2) stay feature-replicated — matching param_spec's head gate
        # and the q.shape[2] % tp dispatch check in ops/attention.py.
        q = constrain_batch(q.reshape(b, sq, self.num_heads, self.head_dim),
                            tp_dim=2, tp_groups=self.num_heads)
        k = constrain_batch(k.reshape(b, sk, self.num_heads, self.head_dim),
                            tp_dim=2, tp_groups=self.num_heads)
        v = constrain_batch(v.reshape(b, sk, self.num_heads, self.head_dim),
                            tp_dim=2, tp_groups=self.num_heads)
        o = multi_head_attention(q, k, v, mask=mask)
        o = constrain_batch(o.reshape(b, sq, inner), tp_dim=-1,
                            tp_groups=self.num_heads)
        out = nn.Dense(out_dim, use_bias=True, dtype=self.dtype,
                       name="to_out")(o)
        if self.lora_rank > 0:
            out = out + self._lora("to_out", o, out_dim)
        return out


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward: a*gelu(b) -> Dense (diffusers FF parity).

    The value (`proj_in`) and gate (`proj_gate`) projections are SEPARATE
    Dense modules rather than diffusers' fused 2*inner Linear: under tensor
    parallelism both kernels are column-parallel, so every tp shard holds
    ALIGNED slices of a and b and the product is local. (A fused kernel
    sharded contiguously over tp=2 puts all of `a` on rank 0 and all of `b`
    on rank 1, forcing a reshard of both halves every block, fwd+bwd.)
    port_hf.py splits diffusers' fused `ff.net.0.proj` weight into the two
    halves: value = columns [:inner], gate = columns [inner:] (diffusers
    GEGLU chunks (hidden, gate) in that order)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        # tp_dim: the GEGLU hidden is the column-parallel half of the
        # Megatron FF pair — with an active tp axis it stays feature-sharded
        # through the GELU into the row-parallel proj_out
        a = constrain_batch(nn.Dense(inner, dtype=self.dtype,
                                     name="proj_in")(x), tp_dim=-1)
        b = constrain_batch(nn.Dense(inner, dtype=self.dtype,
                                     name="proj_gate")(x), tp_dim=-1)
        h = a * nn.gelu(b, approximate=False)  # diffusers GEGLU uses erf GELU
        # anchor h too: its cotangent (dout @ W^T with W fsdp-sharded) is
        # the last place SPMD otherwise resorts to full rematerialization
        h = constrain_batch(h, tp_dim=-1)
        return constrain_batch(
            nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h))


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, all residual (pre-LN)."""

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dim = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype,
                          lora_rank=self.lora_rank,
                          lora_alpha=self.lora_alpha,
                          name="attn1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype,
                          lora_rank=self.lora_rank,
                          lora_alpha=self.lora_alpha,
                          name="attn2")(h, context=context)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(x.dtype)
        x = x + FeedForwardGEGLU(dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> N blocks over HW tokens -> proj_out.

    use_linear_projection=True (SD2) uses Dense projections on flattened
    tokens; False uses 1x1 convs (SD1 geometry).
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    use_linear_projection: bool = True
    groups: int = 32
    dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            hidden = constrain_batch(hidden.reshape(b, h * w, c))
            hidden = nn.Dense(c, dtype=self.dtype, name="proj_in")(hidden)
        else:
            hidden = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(hidden)
            hidden = constrain_batch(hidden.reshape(b, h * w, c))
        for i in range(self.depth):
            hidden = BasicTransformerBlock(self.num_heads, self.head_dim,
                                           dtype=self.dtype,
                                           lora_rank=self.lora_rank,
                                           lora_alpha=self.lora_alpha,
                                           name=f"blocks_{i}")(hidden, context)
            hidden = constrain_batch(hidden)
        if self.use_linear_projection:
            hidden = nn.Dense(c, dtype=self.dtype, name="proj_out")(hidden)
            hidden = hidden.reshape(b, h, w, c)
        else:
            hidden = hidden.reshape(b, h, w, c)
            hidden = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(hidden)
        return hidden + residual


class Downsample(nn.Module):
    """Stride-2 3x3 conv (diffusers Downsample2D with conv)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv (diffusers Upsample2D)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)
