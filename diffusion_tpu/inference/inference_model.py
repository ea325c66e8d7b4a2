"""Text-to-image serving endpoint.

TPU-native equivalent of the reference's inference handler (reference:
diffusion/inference/inference_model.py): builds an un-pretrained SD2
(ref :28-34), loads a training checkpoint — weights only, metric state
ignored (ref :35-39 strips `val_metrics.*` keys; here metrics aren't in the
checkpoint at all) — then `predict(**inputs)` parses prompt/negative_prompt/
ints/floats (ref :49-58), generates (ref :64-65), and returns base64 PNGs
(ref :67-76).

TPU-first: `__init__` jit-compiles one sampling program per (steps, size)
configuration; `predict` calls are pure dispatches. The checkpoint can come
from any orbax directory (local or mounted bucket path).
"""

from __future__ import annotations

import base64
import functools
import io
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tpu.models.models import stable_diffusion_2

__all__ = ["StableDiffusionInference", "image_to_base64_png"]


def image_to_base64_png(image01: np.ndarray) -> str:
    """float [0,1] HWC -> base64 PNG string (reference :67-76)."""
    from PIL import Image
    arr = (np.clip(np.asarray(image01), 0, 1) * 255).round().astype(np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


class StableDiffusionInference:
    def __init__(self, checkpoint_path: Optional[str] = None,
                 model_name: Optional[str] = None,
                 pretrained: bool = False,
                 default_size: int = 512, seed: int = 0,
                 pad_to_bucket: bool = True,
                 allow_random_frozen: bool = False,
                 builder: Any = None, **model_kwargs: Any):
        self.pad_to_bucket = pad_to_bucket
        builder = builder or stable_diffusion_2
        self.model = builder(model_name=model_name, pretrained=pretrained,
                             fsdp=False, **model_kwargs)
        self.default_size = default_size
        self.seed = seed
        if getattr(self.model, "pretrained_path", None):
            # serve the ported HF weights directly (reference inference
            # builds un-pretrained and loads a training checkpoint,
            # inference_model.py:28-41; both paths work here)
            from diffusion_tpu.models.pretrained import load_pretrained_params
            params, frozen = load_pretrained_params(
                self.model, image_size=default_size)
            params = jax.device_put(params)
            frozen = jax.device_put(frozen)
        else:
            params, frozen = self.model.init_params(jax.random.key(seed),
                                                    image_size=default_size)
            if checkpoint_path and not allow_random_frozen:
                # trainer checkpoints carry only the TRAINABLE params —
                # never the frozen VAE/CLIP towers. Restoring a checkpoint
                # over randomly initialized towers decodes every request
                # through a random VAE conditioned on a random text encoder:
                # silent garbage. Real deployments must pair the checkpoint
                # with ported pretrained weights for the frozen towers.
                raise RuntimeError(
                    "checkpoint_path given but the frozen VAE/text-encoder "
                    "towers are randomly initialized (the checkpoint only "
                    "restores the trainable UNet params). Pass "
                    "pretrained=True with model_name=<ported-weights dir> "
                    "(tools/port_weights.py), or allow_random_frozen=True "
                    "for CI/smoke serving where garbage images are fine.")
        if checkpoint_path:
            from diffusion_tpu.train.checkpoint import (fetch_checkpoint_dir,
                                                        load_checkpoint)
            # bucket-hosted checkpoints (s3://, gs://, file://) are mirrored
            # to a local cache first (reference endpoint downloads from its
            # bucket, reference inference_model.py:19-22); unsupported
            # schemes fail with a clear message instead of an orbax error
            checkpoint_path = fetch_checkpoint_dir(checkpoint_path)
            dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=dev),
                params)
            try:
                # partial restore of the params subtree — works whatever
                # opt/EMA state the trainer checkpoint carries (same path
                # as Trainer load_weights_only, train/trainer.py)
                restored, _ = load_checkpoint(
                    checkpoint_path, {"params": abstract}, partial=True)
                params = restored["params"]
            except Exception as train_state_err:
                # weights-only checkpoints store the bare param pytree; if
                # that ALSO fails, surface both errors instead of silently
                # serving random weights
                import orbax.checkpoint as ocp
                import os
                try:
                    restored = ocp.StandardCheckpointer().restore(
                        os.path.abspath(checkpoint_path), abstract)
                except Exception as weights_err:
                    raise RuntimeError(
                        f"checkpoint {checkpoint_path} is neither a trainer "
                        f"checkpoint ({train_state_err}) nor a weights-only "
                        f"param pytree ({weights_err})") from weights_err
                params = restored
        self.params = params
        self.frozen = frozen
        self._gen_cache: Dict[tuple, Any] = {}

    def _gen_fn(self, steps: int, height: int, width: int, scale: float,
                n_per: int = 1, scheduler: Optional[str] = None,
                strength: Optional[float] = None,
                guidance_rescale: float = 0.0):
        key = (steps, height, width, scale, n_per, scheduler, strength,
               guidance_rescale)
        if key not in self._gen_cache:
            model = self.model
            if scheduler:
                # per-request sampler: same weights, different denoise
                # program (scheduler=dpm++2m measured 1.9x serving
                # throughput at matched quality; schedulers/dpm.py). One
                # compile per (config, sampler), cached like every other key
                # element. `like=` carries the served model's noise-schedule
                # and prediction config into the new sampler, so a
                # v_prediction or custom-beta deployment keeps its schedule.
                import dataclasses

                from diffusion_tpu.models.models import \
                    _make_inference_scheduler
                model = dataclasses.replace(
                    model,
                    inference_scheduler=_make_inference_scheduler(
                        scheduler, like=model.inference_scheduler))
            kwargs = {}
            if strength is not None:   # img2img program (static strength)
                kwargs["strength"] = strength
            if guidance_rescale:
                kwargs["guidance_rescale"] = guidance_rescale
            self._gen_cache[key] = jax.jit(functools.partial(
                model.generate, height=height, width=width,
                guidance_scale=scale, num_inference_steps=steps,
                num_images_per_prompt=n_per, **kwargs))
        return self._gen_cache[key]

    def _parse(self, inputs: Dict[str, Any], default_size: int,
               default_seed: int):
        """-> (prompts, negatives_or_None, images_and_masks, config_key).
        `images_and_masks` is None or (init_b64s, mask_b64s_or_None). The
        key is what must match for two requests to share one device program
        invocation."""
        prompt = inputs.get("prompt")
        if not prompt:
            raise ValueError("prompt required")
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negative = inputs.get("negative_prompt")
        negatives = ([negative] * len(prompts) if isinstance(negative, str)
                     else (list(negative) if negative else None))  # [] = none
        if negatives is not None and len(negatives) != len(prompts):
            raise ValueError("negative_prompt count != prompt count")
        steps = int(inputs.get("num_inference_steps", 50))
        g_rescale = float(inputs.get("guidance_rescale", 0.0))
        if not 0.0 <= g_rescale <= 1.0:
            # range-check at parse time (a client error) — and note a
            # negative/zero value would otherwise still key a brand-new
            # multi-minute XLA compile of a byte-identical program
            raise ValueError(
                f"guidance_rescale must be in [0, 1], got {g_rescale}")
        image = inputs.get("image")
        init_images = None
        masks = None
        strength = None
        if image:
            # img2img: base64 PNG/JPEG, one per prompt (a single image is
            # broadcast across the request's prompts)
            b64s = [image] * len(prompts) if isinstance(image, str) \
                else list(image)
            if len(b64s) != len(prompts):
                raise ValueError("image count != prompt count")
            init_images = b64s
            strength = float(inputs.get("strength", 0.8))
            if not 0.0 < strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            # canonicalize: the device program depends on strength only
            # through init_timestep = int(steps * strength) (generate's
            # t_start), so fold equivalent floats (0.8 vs 0.801 at 50 steps)
            # into ONE batch bucket and ONE multi-minute XLA compile —
            # same rule _normalize_scheduler applies to sampler names.
            # (k + 0.5)/steps round-trips: int(steps * that) == k.
            init_t = min(int(steps * strength), steps)
            strength = min(1.0, (init_t + 0.5) / steps)
            m = inputs.get("mask")
            if m:
                # inpainting: grayscale base64, white = regenerate
                masks = [m] * len(prompts) if isinstance(m, str) else list(m)
                if len(masks) != len(prompts):
                    raise ValueError("mask count != prompt count")
        elif "strength" in inputs:
            raise ValueError("strength requires an image (img2img)")
        elif inputs.get("mask"):
            raise ValueError("mask (inpainting) requires an image")
        key = (steps,
               int(inputs.get("height", default_size)),
               int(inputs.get("width", default_size)),
               float(inputs.get("guidance_scale", 7.5)),
               int(inputs.get("seed", default_seed)),
               int(inputs.get("num_images_per_prompt", 1)),
               negatives is not None,
               self._normalize_scheduler(inputs.get("scheduler")),
               strength,   # None = text-to-image program
               masks is not None,  # inpainting program takes a mask arg
               g_rescale)
        return prompts, negatives, (
            (init_images, masks) if init_images else None), key

    def _normalize_scheduler(self, requested) -> Optional[str]:
        """Canonical per-request sampler name, or None for 'the model's
        own'. Normalizing here (lowercase, alias 'dpm', and folding an
        explicit request for the model's configured sampler to None) keeps
        equivalent requests in ONE batch bucket and ONE compiled program —
        an uncanonicalized string would fragment batching and duplicate
        multi-minute XLA compiles. Unknown names raise ValueError at parse
        time (a client error), not inside the device dispatch."""
        if not requested:
            return None
        from diffusion_tpu.models.models import (_make_inference_scheduler,
                                                 canonical_scheduler_name)
        name = canonical_scheduler_name(str(requested))
        if name == canonical_scheduler_name(self.model.inference_scheduler):
            return None
        # construct it NOW (pure dataclass, cheap): an incompatible request
        # — e.g. dpm++2m/euler against a rescale_betas_zero_snr deployment —
        # must fail here as a client error, not inside the batch worker
        _make_inference_scheduler(name, like=self.model.inference_scheduler)
        return name

    def batch_key(self, inputs: Dict[str, Any]) -> tuple:
        """Requests with equal keys are mergeable into one generate call
        (same sampling program AND same RNG seed — merging across seeds
        would silently change which noise stream each sample draws)."""
        return self._parse(inputs, self.default_size, self.seed)[3]

    @staticmethod
    def _decode_image(b64: str, height: int, width: int) -> np.ndarray:
        """base64 PNG/JPEG -> float32 (H, W, 3) in [0, 1], resized to the
        request geometry (clients need not pre-resize)."""
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if img.size != (width, height):
            img = img.resize((width, height), Image.BICUBIC)
        return np.asarray(img, np.float32) / 255.0

    @staticmethod
    def _decode_mask(b64: str, height: int, width: int) -> np.ndarray:
        """base64 PNG/JPEG -> float32 (H, W) in [0, 1] (grayscale; white =
        regenerate), resized to the request geometry."""
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("L")
        if img.size != (width, height):
            img = img.resize((width, height), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    def predict_many(self, requests: List[Dict[str, Any]]) -> List[List[str]]:
        """One device dispatch for several /predict requests (server-side
        dynamic batching — beyond the reference's one-request-at-a-time
        handler, inference_model.py:49-76). All requests must share
        `batch_key`; prompts are concatenated, padded up to the next
        power-of-two bucket so distinct request counts reuse the same
        compiled program (a recompile costs tens of seconds on TPU, padding
        costs one extra row of MXU work), generated in one call, and sliced
        back per request. Note: samples draw from the batch's RNG stream,
        so a request's images depend on the co-batched batch shape — byte
        stability across different batchings is not promised (seed is)."""
        if not requests:
            return []
        parsed = [self._parse(r, self.default_size, self.seed)
                  for r in requests]
        keys = {p[3] for p in parsed}
        if len(keys) > 1:
            # sort by repr: keys can mix None and str in some slots
            raise ValueError(
                f"unmergeable requests: {sorted(keys, key=repr)}")
        (steps, height, width, scale, seed, n_per, has_neg, sched,
         strength, has_mask, g_rescale) = parsed[0][3]
        prompts = [p for pr, _, _, _ in parsed for p in pr]
        negatives = ([n for _, ng, _, _ in parsed for n in ng]
                     if has_neg else None)
        n = len(prompts)
        padded = max(1, 1 << (n - 1).bit_length()) if self.pad_to_bucket else n
        tok = self.model.tokenizer
        prompt_ids = jnp.asarray(
            tok(prompts + [prompts[-1]] * (padded - n))["input_ids"])
        negative_ids = (jnp.asarray(
            tok(negatives + [negatives[-1]] * (padded - n))["input_ids"])
            if has_neg else None)
        gen_kwargs: Dict[str, Any] = {}
        if strength is not None:       # img2img batch
            b64s = [b for _, _, im, _ in parsed for b in im[0]]
            arrs = [self._decode_image(b, height, width) for b in b64s]
            arrs += [arrs[-1]] * (padded - n)
            gen_kwargs["image"] = jnp.asarray(np.stack(arrs))
            if has_mask:               # inpainting batch
                mb64s = [b for _, _, im, _ in parsed for b in im[1]]
                marrs = [self._decode_mask(b, height, width) for b in mb64s]
                marrs += [marrs[-1]] * (padded - n)
                gen_kwargs["mask"] = jnp.asarray(np.stack(marrs))
        images = self._gen_fn(steps, height, width, scale, n_per, sched,
                              strength, g_rescale)(
            self.params, self.frozen, prompt_ids, negative_ids=negative_ids,
            seed=seed, **gen_kwargs)
        # jnp.repeat keeps prompt-major order: prompt i's copies occupy
        # rows [i*n_per, (i+1)*n_per); padded prompts trail and are dropped
        encoded = [image_to_base64_png(img)
                   for img in np.asarray(images[:n * n_per])]
        out, i = [], 0
        for pr, _, _, _ in parsed:
            out.append(encoded[i:i + len(pr) * n_per])
            i += len(pr) * n_per
        return out

    def predict(self, **inputs: Any) -> List[str]:
        """Inputs (reference :49-58): prompt (str|list), negative_prompt,
        height, width, num_inference_steps, guidance_scale, seed; plus,
        beyond the reference's fixed-DDIM text-only handler:
        `scheduler` (ddim | dpm++2m | euler) picks the sampler per request,
        and `image` (base64 PNG/JPEG, str or list) + `strength` (0, 1]
        switch to img2img (SDEdit) — the image is encoded, noised
        `strength` of the way to pure noise, and denoised from there.
        Adding `mask` (grayscale base64, white = regenerate, str or list)
        switches to inpainting: only the white region is re-synthesized,
        the rest is preserved from the input image (use strength=1.0 to
        fully free the masked region)."""
        return self.predict_many([inputs])[0]
