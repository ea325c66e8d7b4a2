"""Load ported HF weights into (trainable, frozen) param pytrees.

TPU-native equivalent of the reference's `pretrained=True` path (reference:
diffusion/models/models.py:74-89 — UNet/VAE/CLIP `from_pretrained`): the
checkpoint directory holds either the msgpack files written by
tools/port_weights.py (`unet.msgpack` / `vae.msgpack` /
`text_encoder.msgpack`) or the original HF safetensors subdirectories
(`unet/`, `vae/`, `text_encoder/`), which are ported on the fly through the
same models/port_hf.py converters.

The loader returns HOST numpy pytrees, validated leaf-by-leaf against the
model's own `init_params` shapes and cast to its dtypes (an fp16 HF
checkpoint must not silently become fp16 master weights); callers (train/trainer.py init,
inference/inference_model.py) device_put them under whatever shardings the
mesh calls for — so `pretrained: true` works identically on one chip and on
an FSDP pod slice (every host reads the file; XLA shards at transfer).
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["load_pretrained_params", "load_component"]


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _validate(name: str, got: Dict, want_abstract: Any) -> None:
    got_flat = {k: tuple(np.shape(v)) for k, v in _flatten(got).items()}
    want_flat = {k: tuple(v.shape)
                 for k, v in _flatten(want_abstract).items()}
    problems = []
    for k in sorted(want_flat.keys() - got_flat.keys()):
        problems.append(f"missing {k} (want shape {want_flat[k]})")
    for k in sorted(got_flat.keys() - want_flat.keys()):
        problems.append(f"unexpected {k} (shape {got_flat[k]})")
    for k in sorted(want_flat.keys() & got_flat.keys()):
        if want_flat[k] != got_flat[k]:
            problems.append(f"shape mismatch {k}: checkpoint {got_flat[k]} "
                            f"vs model {want_flat[k]}")
    if problems:
        shown = "\n  ".join(problems[:10])
        more = f"\n  ... and {len(problems) - 10} more" if len(problems) > 10 else ""
        raise ValueError(
            f"pretrained {name} weights do not match the model geometry "
            f"({len(problems)} problems):\n  {shown}{more}")


def _cast_like(got: Any, want_abstract: Any) -> Any:
    """Cast loaded leaves to the dtypes the model's own init would produce.

    HF ships fp16 revisions of SD2; without this an fp16 checkpoint would
    silently become fp16 master weights (and fp16 AdamW moments / EMA state)
    where a random init gives fp32. Structure already validated to match."""
    if isinstance(want_abstract, Mapping):
        return {k: _cast_like(got[k], want_abstract[k]) for k in want_abstract}
    want_dtype = want_abstract.dtype
    arr = np.asarray(got)
    return arr if arr.dtype == want_dtype else arr.astype(want_dtype)


def load_component(path: str, name: str, porter) -> Dict:
    """One subtree from `<path>/<name>.msgpack`, else port `<path>/<name>/`
    safetensors through `porter`."""
    msgpack_path = os.path.join(path, f"{name}.msgpack")
    if os.path.exists(msgpack_path):
        import flax.serialization
        with open(msgpack_path, "rb") as f:
            return flax.serialization.msgpack_restore(f.read())
    subdir = os.path.join(path, name)
    if os.path.isdir(subdir):
        from diffusion_tpu.models.port_hf import load_safetensors_dir
        return porter(load_safetensors_dir(subdir))
    raise FileNotFoundError(
        f"no pretrained weights for {name!r} under {path}: expected "
        f"{name}.msgpack (from tools/port_weights.py) or a {name}/ "
        f"safetensors subdirectory")


def load_pretrained_params(model: Any,
                           want_frozen: Optional[bool] = None,
                           image_size: int = 256) -> Tuple[Dict, Dict]:
    """(trainable, frozen) numpy pytrees for a model with `pretrained_path`.

    `want_frozen=None` resolves exactly like `init_params`: towers are
    loaded unless the model is on the precomputed-latent path with no
    generation eval. Shapes are validated against `jax.eval_shape` of the
    model's own init, so a geometry/checkpoint mismatch fails loudly here
    rather than as a cryptic apply-time error.
    """
    from diffusion_tpu.models.port_hf import (port_clip_text, port_unet,
                                              port_vae)

    path = getattr(model, "pretrained_path", None)
    if not path:
        raise ValueError("model has no pretrained_path (build it with "
                         "pretrained=True, model_name=<checkpoint dir>)")
    if want_frozen is None:
        want_frozen = getattr(model, "init_frozen_towers", None)
    if want_frozen is None:
        want_frozen = not (getattr(model, "precomputed_latents", False)
                           and not getattr(model, "val_guidance_scales", ()))

    abstract = jax.eval_shape(
        lambda r: model.init_params(r, image_size=image_size),
        jax.random.key(0))

    unet_np = load_component(path, "unet", port_unet)
    extra_frozen: Dict[str, Dict] = {}
    if getattr(model, "train_lora_only", False):
        # HF checkpoints carry only base weights: they become the frozen
        # base (same split init_params makes) and the trainable adapter
        # initializes fresh — A random, B zero, so step 0 IS the pretrained
        # model (models/lora.py)
        base_abstract = abstract[1]["unet_base"]
        _validate("unet", unet_np, base_abstract)
        extra_frozen["unet_base"] = _cast_like(unet_np, base_abstract)
        params = _init_lora_numpy(abstract[0])
    else:
        _validate("unet", unet_np, abstract[0])
        params = _cast_like(unet_np, abstract[0])
    if not want_frozen:
        return params, extra_frozen

    frozen: Dict[str, Dict] = {}
    if hasattr(model, "vae"):
        frozen["vae"] = load_component(path, "vae", port_vae)
    frozen["text_encoder"] = load_component(path, "text_encoder",
                                            port_clip_text)
    abstract_frozen = dict(abstract[1])
    if abstract_frozen:
        for key, tree in frozen.items():
            _validate(key, tree, abstract_frozen[key])
            frozen[key] = _cast_like(tree, abstract_frozen[key])
    return params, {**frozen, **extra_frozen}


def _init_lora_numpy(abstract: Any, seed: int = 0) -> Any:
    """Fresh host-side LoRA adapter matching `abstract`'s shapes/dtypes:
    `*_lora_a` kernels ~ N(0, 0.02), `*_lora_b` zeros (layers.py Attention
    init). B=0 makes the adapter's delta exactly zero whatever A holds, so
    the numpy-vs-jax PRNG difference from a device init is immaterial; the
    fixed seed keeps every pod host bit-identical without a collective."""
    rng = np.random.default_rng(seed)

    def leaf(path: str, sds: Any) -> np.ndarray:
        if "_lora_b" in path:
            return np.zeros(sds.shape, sds.dtype)
        return rng.normal(0.0, 0.02, sds.shape).astype(sds.dtype)

    flat = _flatten(abstract)
    out = {k: leaf(k, v) for k, v in flat.items()}
    # rebuild nesting from the flat '/'-joined paths
    tree: Dict[str, Any] = {}
    for k, v in out.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
