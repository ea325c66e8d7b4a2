"""Faithful torch reimplementation of the diffusers UNet2DConditionModel /
AutoencoderKL forward semantics, at arbitrary (tiny) geometry.

diffusers is not installed in this zero-egress image, but torch is — same
technique as tools/make_metric_goldens.py: re-derive the published reference
network in torch, and use it to (a) capture golden fixtures for
tests/test_hf_parity.py and (b) drive the pretrained-weight round-trip test.
Module names mirror diffusers' exactly, so `state_dict()` feeds
tools/port_weights.py:port_unet/port_vae unchanged — the same porters a real
`stabilityai/stable-diffusion-2-base` checkpoint goes through (reference:
diffusion/models/models.py:74-85 loads these networks via from_pretrained).

Semantics pinned here (diffusers >= 0.11 behavior, as the reference's
pyproject requires):
- ResnetBlock2D: GN -> SiLU -> conv1 -> (+time proj) -> GN -> SiLU -> conv2,
  1x1 conv_shortcut when channels change, output (skip + h) / 1.0.
- Transformer2DModel with use_linear_projection: GN(eps 1e-6) -> flatten ->
  Linear proj_in -> BasicTransformerBlocks (pre-LN self-attn, cross-attn,
  GEGLU FF with erf-GELU) -> Linear proj_out -> + residual.
- `attention_head_dim` is the NUMBER of heads (diffusers' naming quirk);
  per-head dim = channels // heads.
- Timesteps embedding with flip_sin_to_cos=True, freq_shift=0.
- UNet norm eps 1e-5; VAE resnet/norm eps 1e-6; VAE mid attention is
  single-head with q/k/v/out biases and a residual add; VAE encoder
  downsample pads (0,1,0,1) then convs stride-2 VALID.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_timestep_embedding(timesteps: torch.Tensor, dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    emb = torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, time_embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_ch: Optional[int],
                 groups: int, eps: float):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return skip + h


class Attention(nn.Module):
    """diffusers Attention (transformer-block flavor: no qkv biases)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 cross_dim: Optional[int] = None):
        super().__init__()
        inner = heads * dim_head
        ctx = cross_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim),
                                     nn.Dropout(0.0)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, sq, _ = x.shape
        sk = ctx.shape[1]
        q = self.to_q(x).view(b, sq, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).view(b, sk, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).view(b, sk, self.heads, self.dim_head).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.dim_head ** -0.5,
                             dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Dropout(0.0),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, cross_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, cross_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context=context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, channels: int, heads: int, cross_dim: int,
                 groups: int, depth: int, use_linear_projection: bool):
        super().__init__()
        dim_head = channels // heads
        self.use_linear_projection = use_linear_projection
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(channels, channels)
            self.proj_out = nn.Linear(channels, channels)
        else:
            self.proj_in = nn.Conv2d(channels, channels, 1)
            self.proj_out = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(channels, heads, dim_head, cross_dim)
            for _ in range(depth)])

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        hidden = self.norm(x)
        if self.use_linear_projection:
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
            hidden = self.proj_in(hidden)
        else:
            hidden = self.proj_in(hidden)
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for block in self.transformer_blocks:
            hidden = block(hidden, context)
        if self.use_linear_projection:
            hidden = self.proj_out(hidden)
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
            hidden = self.proj_out(hidden)
        return hidden + residual


class Downsample2D(nn.Module):
    def __init__(self, ch: int, asymmetric_pad: bool = False):
        super().__init__()
        self.asymmetric_pad = asymmetric_pad
        self.conv = nn.Conv2d(ch, ch, 3, stride=2,
                              padding=0 if asymmetric_pad else 1)

    def forward(self, x):
        if self.asymmetric_pad:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Block(nn.Module):
    """Generic down/up/mid block container matching diffusers child names."""


class TorchUNet2DCondition(nn.Module):
    """UNet2DConditionModel-parity network built from the shared tiny spec
    (tools/capture_goldens.py TINY_UNET_SPEC or any compatible dict)."""

    def __init__(self, spec: dict):
        super().__init__()
        self.spec = dict(spec)
        chans: Sequence[int] = spec["block_out_channels"]
        layers = spec["layers_per_block"]
        has_attn: Sequence[bool] = spec["block_has_attention"]
        heads: Sequence[int] = spec["attention_head_dim"]  # = num heads
        cross = spec["cross_attention_dim"]
        groups = spec["norm_num_groups"]
        depth = spec.get("transformer_depth", 1)
        linear_proj = spec.get("use_linear_projection", True)
        eps = 1e-5
        temb_dim = chans[0] * 4

        self.conv_in = nn.Conv2d(spec["in_channels"], chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(chans[0], temb_dim)

        n = len(chans)
        skip_chans = [chans[0]]
        self.down_blocks = nn.ModuleList()
        cur = chans[0]
        for i, out_ch in enumerate(chans):
            block = _Block()
            block.resnets = nn.ModuleList()
            if has_attn[i]:
                block.attentions = nn.ModuleList()
            for _ in range(layers):
                block.resnets.append(
                    ResnetBlock2D(cur, out_ch, temb_dim, groups, eps))
                if has_attn[i]:
                    block.attentions.append(Transformer2DModel(
                        out_ch, heads[i], cross, groups, depth, linear_proj))
                cur = out_ch
                skip_chans.append(cur)
            if i < n - 1:
                block.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
                skip_chans.append(out_ch)
            self.down_blocks.append(block)

        mid = _Block()
        mid.resnets = nn.ModuleList([
            ResnetBlock2D(cur, cur, temb_dim, groups, eps),
            ResnetBlock2D(cur, cur, temb_dim, groups, eps)])
        mid.attentions = nn.ModuleList([Transformer2DModel(
            cur, heads[-1], cross, groups, depth, linear_proj)])
        self.mid_block = mid

        self.up_blocks = nn.ModuleList()
        rev_chans = list(reversed(chans))
        rev_attn = list(reversed(has_attn))
        rev_heads = list(reversed(heads))
        for i, out_ch in enumerate(rev_chans):
            block = _Block()
            block.resnets = nn.ModuleList()
            if rev_attn[i]:
                block.attentions = nn.ModuleList()
            for _ in range(layers + 1):
                skip = skip_chans.pop()
                block.resnets.append(
                    ResnetBlock2D(cur + skip, out_ch, temb_dim, groups, eps))
                if rev_attn[i]:
                    block.attentions.append(Transformer2DModel(
                        out_ch, rev_heads[i], cross, groups, depth,
                        linear_proj))
                cur = out_ch
            if i < n - 1:
                block.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
            self.up_blocks.append(block)

        self.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=eps)
        self.conv_out = nn.Conv2d(chans[0], spec["out_channels"], 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states):
        temb = get_timestep_embedding(
            timesteps, self.spec["block_out_channels"][0],
            flip_sin_to_cos=self.spec.get("flip_sin_to_cos", True),
            downscale_freq_shift=self.spec.get("freq_shift", 0.0))
        temb = self.time_embedding(temb)
        h = self.conv_in(sample)
        residuals = [h]
        for block in self.down_blocks:
            attns = getattr(block, "attentions", None)
            for j, resnet in enumerate(block.resnets):
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[j](h, encoder_hidden_states)
                residuals.append(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
                residuals.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, encoder_hidden_states)
        h = self.mid_block.resnets[1](h, temb)
        for block in self.up_blocks:
            attns = getattr(block, "attentions", None)
            for j, resnet in enumerate(block.resnets):
                h = torch.cat([h, residuals.pop()], dim=1)
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[j](h, encoder_hidden_states)
            if hasattr(block, "upsamplers"):
                h = block.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class VaeAttention(nn.Module):
    """VAE mid-block single-head attention (diffusers Attention with
    residual_connection=True, biased projections)."""

    def __init__(self, ch: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        hidden = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
        o = self.to_out[0](attn @ v)
        return x + o.transpose(1, 2).view(b, c, h, w)


class _Encoder(nn.Module):
    def __init__(self, spec: dict):
        super().__init__()
        chans = spec["block_out_channels"]
        layers = spec["layers_per_block"]
        groups = spec["norm_num_groups"]
        self.conv_in = nn.Conv2d(spec["in_channels"], chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cur = chans[0]
        n = len(chans)
        for i, out_ch in enumerate(chans):
            block = _Block()
            block.resnets = nn.ModuleList()
            for _ in range(layers):
                block.resnets.append(
                    ResnetBlock2D(cur, out_ch, None, groups, 1e-6))
                cur = out_ch
            if i < n - 1:
                block.downsamplers = nn.ModuleList(
                    [Downsample2D(out_ch, asymmetric_pad=True)])
            self.down_blocks.append(block)
        mid = _Block()
        mid.resnets = nn.ModuleList([
            ResnetBlock2D(cur, cur, None, groups, 1e-6),
            ResnetBlock2D(cur, cur, None, groups, 1e-6)])
        mid.attentions = nn.ModuleList([VaeAttention(cur, groups)])
        self.mid_block = mid
        self.conv_norm_out = nn.GroupNorm(groups, cur, eps=1e-6)
        self.conv_out = nn.Conv2d(cur, 2 * spec["latent_channels"], 3,
                                  padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for block in self.down_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class _Decoder(nn.Module):
    def __init__(self, spec: dict):
        super().__init__()
        rev = list(reversed(spec["block_out_channels"]))
        layers = spec["layers_per_block"]
        groups = spec["norm_num_groups"]
        self.conv_in = nn.Conv2d(spec["latent_channels"], rev[0], 3, padding=1)
        mid = _Block()
        mid.resnets = nn.ModuleList([
            ResnetBlock2D(rev[0], rev[0], None, groups, 1e-6),
            ResnetBlock2D(rev[0], rev[0], None, groups, 1e-6)])
        mid.attentions = nn.ModuleList([VaeAttention(rev[0], groups)])
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        cur = rev[0]
        n = len(rev)
        for i, out_ch in enumerate(rev):
            block = _Block()
            block.resnets = nn.ModuleList()
            for _ in range(layers + 1):
                block.resnets.append(
                    ResnetBlock2D(cur, out_ch, None, groups, 1e-6))
                cur = out_ch
            if i < n - 1:
                block.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
            self.up_blocks.append(block)
        self.conv_norm_out = nn.GroupNorm(groups, cur, eps=1e-6)
        self.conv_out = nn.Conv2d(cur, spec["out_channels"], 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for block in self.up_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "upsamplers"):
                h = block.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchAutoencoderKL(nn.Module):
    """AutoencoderKL-parity codec built from the shared tiny spec."""

    def __init__(self, spec: dict):
        super().__init__()
        self.spec = dict(spec)
        lat = spec["latent_channels"]
        self.encoder = _Encoder(spec)
        self.decoder = _Decoder(spec)
        self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)
        self.post_quant_conv = nn.Conv2d(lat, lat, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def encode_mean(self, x):
        mean, _ = self.encode_moments(x).chunk(2, dim=1)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
