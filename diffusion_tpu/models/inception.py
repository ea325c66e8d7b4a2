"""Flax InceptionV3 (FID variant) — feature tower for FID / InceptionScore.

TPU-native equivalent of the InceptionV3 network inside
torchmetrics.image.fid.FrechetInceptionDistance and InceptionScore, which the
reference instantiates from yaml (reference: diffusion/models/models.py:11-13,
62-64; stable_diffusion.py:244-249 feeds real/fake uint8-ish images).

Architecture matches the standard FID network ("pt_inception-2015-12-05"):
stem convs -> 3x InceptionA -> InceptionB -> 4x InceptionC -> InceptionD ->
2x InceptionE (second E uses max-pool in its pool branch, the FID tweak) ->
global average pool -> 2048-d features -> (optional) 1008-way logits.

Weights load from a local .npz via `load_inception_params` (zero-egress
environment — random init still exercises all metric math; tests validate the
mean/cov/Frechet machinery against closed forms, SURVEY.md §7 hard-part 6).

Input: (B, 299, 299, 3) NHWC in [-1, 1].
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["InceptionV3", "preprocess_images", "load_inception_params"]


class BasicConv(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _maxpool(x, k=3, s=2, pad="VALID"):
    return nn.max_pool(x, (k, k), strides=(s, s), padding=pad)


def _avgpool3(x):
    # count_include_pad=False is the FID ("pt_inception") variant's patch to
    # torchvision's pool branches; with flax's default (True) the border
    # pixels divide by 9 instead of the real window size and every
    # InceptionA/C/E pool branch is silently wrong at the edges
    # (caught by tests/test_inception_parity.py)
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, dtype=self.dtype,
                       name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), dtype=self.dtype,
                       name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3dbl_3")(bd)
        bp = _maxpool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), dtype=self.dtype,
                       name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch7x7x3_4")(b7)
        bp = _maxpool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # FID variant: second E block uses max
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            pooled = _avgpool3(x)
        else:
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1008
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 return_logits: bool = False) -> jnp.ndarray:
        """x: (B, 299, 299, 3) in [-1, 1] -> (B, 2048) features or logits."""
        x = BasicConv(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, dtype=self.dtype,
                      name="Conv2d_2b_3x3")(x)
        x = _maxpool(x)
        x = BasicConv(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _maxpool(x)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=self.dtype, name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        if not return_logits:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(feats)


def preprocess_images(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[0,1] NHWC images -> bilinear 299x299 -> [-1,1] (torchmetrics
    normalize=True path, reference models.py:63 FID(normalize=True))."""
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), "bilinear")
    return images * 2.0 - 1.0


def load_inception_params(path: str) -> Any:
    """Load a Flax param/batch-stats pytree from a local .npz/.msgpack file."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        tree: dict = {}
        for key, value in flat.items():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(value)
        return tree
    import flax.serialization
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
