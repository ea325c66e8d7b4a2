"""Flax CLIP text/vision transformers.

TPU-native equivalent of transformers.CLIPTextModel used for conditioning
(reference: diffusion/models/models.py:82-87 loads the SD2 OpenCLIP-ViT/H
text tower — hidden 1024, 23 layers; models.py:130-132 the ViT-L/14 tower for
pixel models) and of the CLIP image+text towers behind torchmetrics.CLIPScore
(reference: diffusion/models/stable_diffusion.py:251-255).

Pre-LN transformer with causal masking for text; ViT with class token for
vision. The text forward is pure and jit-safe so caption encoding fuses into
the training step when latents aren't precomputed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from diffusion_tpu.ops.attention import multi_head_attention

__all__ = [
    "CLIPTextConfig", "CLIPVisionConfig", "CLIPTextModel", "CLIPVisionModel",
    "CLIPModel", "SD2_TEXT_CONFIG", "VIT_L14_TEXT_CONFIG", "VIT_L14_VISION_CONFIG",
]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768


# stabilityai/stable-diffusion-2-base text_encoder config (reference models.py:82-87)
SD2_TEXT_CONFIG = CLIPTextConfig()
# openai/clip-vit-large-patch14 (reference models.py:115,130-132)
VIT_L14_TEXT_CONFIG = CLIPTextConfig(hidden_size=768, intermediate_size=3072,
                                     num_hidden_layers=12, num_attention_heads=12,
                                     hidden_act="quick_gelu", projection_dim=768)
VIT_L14_VISION_CONFIG = CLIPVisionConfig()


def _act(name: str):
    if name == "gelu":
        # exact erf GELU: transformers ACT2FN['gelu'] is torch.nn.GELU()
        # (erf form); flax nn.gelu defaults to the tanh approximation,
        # which diverges ~1e-3 and breaks parity with ported weights.
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {name!r}")


class _CLIPLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(x.dtype)
        b, s, d = h.shape
        head_dim = self.hidden_size // self.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)
        o = multi_head_attention(q, k, v, mask=mask, backend="xla")
        o = nn.Dense(d, dtype=self.dtype, name="out_proj")(o.reshape(b, s, d))
        x = x + o
        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(x.dtype)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Causal text transformer; returns (last_hidden_state, pooled)."""

    config: CLIPTextConfig = SD2_TEXT_CONFIG
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        x = tok + pos[None, :s].astype(self.dtype)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]  # (1,1,S,S) for (B,H,Q,K)
        for i in range(cfg.num_hidden_layers):
            x = _CLIPLayer(cfg.hidden_size, cfg.num_attention_heads,
                           cfg.intermediate_size, cfg.hidden_act,
                           cfg.layer_norm_eps, dtype=self.dtype,
                           name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(x).astype(jnp.float32)
        # pooled = hidden state at the EOT token (highest token id in CLIP vocab)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        return x, pooled


class CLIPVisionModel(nn.Module):
    """ViT with class token; returns (last_hidden_state, pooled post-LN CLS)."""

    config: CLIPVisionConfig = VIT_L14_VISION_CONFIG
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixel_values: (B, H, W, 3) NHWC, CLIP-normalized."""
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, padding="VALID", dtype=self.dtype,
                          name="patch_embedding")(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        n = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="pre_layrnorm")(x).astype(self.dtype)
        for i in range(cfg.num_hidden_layers):
            x = _CLIPLayer(cfg.hidden_size, cfg.num_attention_heads,
                           cfg.intermediate_size, cfg.hidden_act,
                           cfg.layer_norm_eps, dtype=self.dtype,
                           name=f"layers_{i}")(x, None)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="post_layernorm")(x[:, 0]).astype(jnp.float32)
        return x.astype(jnp.float32), pooled


class CLIPModel(nn.Module):
    """Both towers + projections; powers CLIPScore (metrics/clip_score.py)."""

    text_config: CLIPTextConfig = VIT_L14_TEXT_CONFIG
    vision_config: CLIPVisionConfig = VIT_L14_VISION_CONFIG
    dtype: Any = jnp.float32

    def setup(self):
        self.text_model = CLIPTextModel(self.text_config, dtype=self.dtype)
        self.vision_model = CLIPVisionModel(self.vision_config, dtype=self.dtype)
        self.text_projection = nn.Dense(self.text_config.projection_dim,
                                        use_bias=False, dtype=jnp.float32)
        self.visual_projection = nn.Dense(self.vision_config.projection_dim,
                                          use_bias=False, dtype=jnp.float32)

    def get_text_features(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self.text_model(input_ids)
        return self.text_projection(pooled)

    def get_image_features(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self.vision_model(pixel_values)
        return self.visual_projection(pooled)

    def __call__(self, input_ids: jnp.ndarray,
                 pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.get_text_features(input_ids), self.get_image_features(pixel_values)
