"""Feature towers for generation metrics: jitted InceptionV3 + CLIP applies.

Weight loading is local-path or object-store (zero-egress beyond the bucket):
point DIFFUSION_TPU_INCEPTION_WEIGHTS / DIFFUSION_TPU_CLIP_WEIGHTS (or the
explicit args) at .npz files produced by tools/port_weights.py — a plain
path or an `s3://`/`gs://` URL (fetched through
diffusion_tpu.data.object_store with backoff, like the reference pulls
checkpoints from OCI buckets, reference: diffusion/inference/
inference_model.py:19-22).

A tower with NO weights refuses to run by default: FID/IS/CLIPScore on
randomly initialized Inception/CLIP are noise, and the reference's
torchmetrics towers always carry pretrained weights (reference:
diffusion/models/models.py:61-72). Tests that only exercise
accumulation/shape paths opt in with allow_random_weights=True (or the
DIFFUSION_TPU_ALLOW_RANDOM_TOWERS=1 env var).
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from diffusion_tpu.models.clip import (CLIPModel, VIT_L14_TEXT_CONFIG,
                                       VIT_L14_VISION_CONFIG)
from diffusion_tpu.models.inception import (InceptionV3, load_inception_params,
                                            preprocess_images)

__all__ = ["inception_feature_fn", "inception_logits_fn", "clip_embed_fn",
           "resolve_weights_path"]

_ENV_ALLOW_RANDOM = "DIFFUSION_TPU_ALLOW_RANDOM_TOWERS"


def resolve_weights_path(path: Optional[str], env_var: str) -> Optional[str]:
    """Resolve a weights location to a local file, downloading object-store
    URLs (s3://, gs://) into a cache dir. Returns None only when nothing is
    configured; an explicitly configured path that does not exist raises
    (silent fallback to random towers would hide a typo'd path)."""
    path = path or os.environ.get(env_var)
    if not path:
        return None
    if "://" in path:
        from diffusion_tpu.data.object_store import ObjectStore
        cache = os.path.join(tempfile.gettempdir(), "diffusion_tpu_towers")
        os.makedirs(cache, exist_ok=True)
        local = os.path.join(cache, os.path.basename(path))
        if not os.path.exists(local):
            ObjectStore().download(path, local)
        return local
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"metric tower weights path {path!r} (from arg or {env_var}) "
            f"does not exist")
    return path


def _random_allowed(allow_random_weights: bool) -> bool:
    return allow_random_weights or os.environ.get(_ENV_ALLOW_RANDOM) == "1"


def _refuse(tower: str, env_var: str):
    raise RuntimeError(
        f"No pretrained weights for the {tower} metric tower: set {env_var} "
        f"(or the explicit weights arg) to an .npz produced by "
        f"tools/port_weights.py — a local path or s3://gs:// URL. Metric "
        f"values from randomly initialized towers are noise; pass "
        f"allow_random_weights=True (or {_ENV_ALLOW_RANDOM}=1) only in "
        f"tests that exercise shapes, not values.")


def _inception_params(weights_path: Optional[str], allow_random_weights: bool):
    path = resolve_weights_path(weights_path, "DIFFUSION_TPU_INCEPTION_WEIGHTS")
    model = InceptionV3()
    if path:
        return model, load_inception_params(path)
    if not _random_allowed(allow_random_weights):
        _refuse("InceptionV3", "DIFFUSION_TPU_INCEPTION_WEIGHTS")
    params = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)),
                        return_logits=True)
    return model, params


def inception_feature_fn(weights_path: Optional[str] = None,
                         allow_random_weights: bool = False) -> Callable:
    model, params = _inception_params(weights_path, allow_random_weights)

    @jax.jit
    def fn(images):
        return model.apply(params, preprocess_images(images))

    return fn


def inception_logits_fn(weights_path: Optional[str] = None,
                        allow_random_weights: bool = False) -> Callable:
    model, params = _inception_params(weights_path, allow_random_weights)

    @jax.jit
    def fn(images):
        return model.apply(params, preprocess_images(images), return_logits=True)

    return fn


# CLIP image normalization constants (OpenAI CLIP preprocessing)
_CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
_CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def clip_embed_fn(weights_path: Optional[str] = None,
                  allow_random_weights: bool = False) -> Callable:
    path = resolve_weights_path(weights_path, "DIFFUSION_TPU_CLIP_WEIGHTS")
    model = CLIPModel(VIT_L14_TEXT_CONFIG, VIT_L14_VISION_CONFIG)
    if path:
        params = load_inception_params(path)  # same pytree container format
    else:
        if not _random_allowed(allow_random_weights):
            _refuse("CLIP", "DIFFUSION_TPU_CLIP_WEIGHTS")
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
