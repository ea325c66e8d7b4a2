"""Feature towers for generation metrics: jitted InceptionV3 + CLIP applies.

Weight loading is local-path only (zero-egress): point the env vars
DIFFUSION_TPU_INCEPTION_WEIGHTS / DIFFUSION_TPU_CLIP_WEIGHTS (or the explicit
args) at .npz/.msgpack files produced by tools/port_weights.py. Randomly
initialized towers still exercise every accumulation/shape path, which is
what the tests validate (torchmetrics-value validation is a weight-port
concern, SURVEY.md §7 hard-part 6).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from diffusion_tpu.models.clip import (CLIPModel, VIT_L14_TEXT_CONFIG,
                                       VIT_L14_VISION_CONFIG)
from diffusion_tpu.models.inception import (InceptionV3, load_inception_params,
                                            preprocess_images)

__all__ = ["inception_feature_fn", "inception_logits_fn", "clip_embed_fn"]


def _inception_params(weights_path: Optional[str]):
    path = weights_path or os.environ.get("DIFFUSION_TPU_INCEPTION_WEIGHTS")
    model = InceptionV3()
    if path and os.path.exists(path):
        return model, load_inception_params(path)
    params = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)),
                        return_logits=True)
    return model, params


def inception_feature_fn(weights_path: Optional[str] = None) -> Callable:
    model, params = _inception_params(weights_path)

    @jax.jit
    def fn(images):
        return model.apply(params, preprocess_images(images))

    return fn


def inception_logits_fn(weights_path: Optional[str] = None) -> Callable:
    model, params = _inception_params(weights_path)

    @jax.jit
    def fn(images):
        return model.apply(params, preprocess_images(images), return_logits=True)

    return fn


# CLIP image normalization constants (OpenAI CLIP preprocessing)
_CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
_CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def clip_embed_fn(weights_path: Optional[str] = None) -> Callable:
    path = weights_path or os.environ.get("DIFFUSION_TPU_CLIP_WEIGHTS")
    model = CLIPModel(VIT_L14_TEXT_CONFIG, VIT_L14_VISION_CONFIG)
    if path and os.path.exists(path):
        params = load_inception_params(path)  # same pytree container format
    else:
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, 77), jnp.int32),
                            jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def fn(images, input_ids):
        size = model.vision_config.image_size
        b, h, w, c = images.shape
        if (h, w) != (size, size):
            images = jax.image.resize(images, (b, size, size, c), "bilinear")
        images = (images - _CLIP_MEAN) / _CLIP_STD
        txt, img = model.apply(params, input_ids, images)
        return img, txt

    return fn
