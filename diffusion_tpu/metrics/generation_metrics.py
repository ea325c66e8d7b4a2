"""Per-guidance-scale generation metric fan-out for eval.

TPU-native equivalent of the reference's eval_forward + update_metric wiring
(reference: diffusion/models/stable_diffusion.py:114-134 builds one metric
copy per guidance scale named '<Metric>-scale-<g>'; :189-208 generates one
image batch per scale with the fixed val_seed; :241-257 routes real/fake
images into FID, fakes into IS, fakes+detokenized captions into CLIPScore).

This hook plugs into Trainer.eval (trainer.metric_hooks): per eval batch it
runs the jitted CFG-DDIM generation once per scale and updates each scale's
metric copies; eval_end computes + resets.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np

from diffusion_tpu.metrics.base import scale_suffix
from diffusion_tpu.metrics.clip_score import CLIPScore
from diffusion_tpu.metrics.fid import FrechetInceptionDistance
from diffusion_tpu.metrics.inception_score import InceptionScore

__all__ = ["GenerationMetricsHook"]


class GenerationMetricsHook:
    def __init__(self, model: Any, frozen: Any,
                 guidance_scales: Sequence[float],
                 metric_names: Sequence[str] = ("FrechetInceptionDistance",),
                 height: int = 256, width: int = 256,
                 num_inference_steps: int = 50,
                 inception_weights: Optional[str] = None,
                 clip_weights: Optional[str] = None,
                 allow_random_weights: bool = False):
        self.model = model
        self.frozen = frozen
        self.guidance_scales = [float(g) for g in guidance_scales]
        self.height, self.width = height, width
        self.num_inference_steps = num_inference_steps
        # consulted by Trainer.eval to skip the sampling pass on evaluators
        # whose metric_names don't include any generation metric
        self.metric_names = tuple(metric_names)

        want = set(metric_names)
        self._feature_fn = None
        self._logits_fn = None
        self._embed_fn = None
        self.metrics: Dict[float, Dict[str, Any]] = {}
        from diffusion_tpu.metrics import towers
        if "FrechetInceptionDistance" in want:
            self._feature_fn = towers.inception_feature_fn(
                inception_weights, allow_random_weights=allow_random_weights)
        if "InceptionScore" in want:
            self._logits_fn = towers.inception_logits_fn(
                inception_weights, allow_random_weights=allow_random_weights)
        if "CLIPScore" in want:
            self._embed_fn = towers.clip_embed_fn(
                clip_weights, allow_random_weights=allow_random_weights)
        for g in self.guidance_scales:
            copies: Dict[str, Any] = {}
            if self._feature_fn:
                copies["FrechetInceptionDistance"] = FrechetInceptionDistance(
                    self._feature_fn)
            if self._logits_fn:
                copies["InceptionScore"] = InceptionScore(self._logits_fn)
            if self._embed_fn:
                copies["CLIPScore"] = CLIPScore(self._embed_fn)
            self.metrics[g] = copies
        self._gen_fns: Dict[float, Callable] = {}

    def _gen_fn(self, scale: float) -> Callable:
        if scale not in self._gen_fns:
            self._gen_fns[scale] = jax.jit(functools.partial(
                self.model.generate, height=self.height, width=self.width,
                guidance_scale=scale,
                num_inference_steps=self.num_inference_steps))
        return self._gen_fns[scale]

    # ---- Trainer.eval protocol -----------------------------------------
    def eval_batch(self, trainer, evaluator, state, batch, rng) -> None:
        if not self.guidance_scales:
            return
        real = batch.get("image")
        captions = batch.get("captions")
        valid = batch.get("_valid")
        if valid is not None:
            # drop padded rows (padding is appended; real rows come first)
            n = int(np.asarray(valid).sum())
            real = None if real is None else np.asarray(real)[:n]
            captions = np.asarray(captions)[:n]
        params = state.train_state.params
        for g in self.guidance_scales:
            copies = self.metrics[g]
            fake = self._gen_fn(g)(params, self.frozen, captions,
                                   rng=jax.random.key(self.model.val_seed))
            if "FrechetInceptionDistance" in copies and real is not None:
                copies["FrechetInceptionDistance"].update(real, real=True)
                copies["FrechetInceptionDistance"].update(fake, real=False)
            if "InceptionScore" in copies:
                copies["InceptionScore"].update(fake)
            if "CLIPScore" in copies:
                copies["CLIPScore"].update(fake, captions)

    def eval_end(self, trainer, evaluator, state) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for g, copies in self.metrics.items():
            for name, metric in copies.items():
                key = f"metrics/{evaluator.label}/{scale_suffix(name, g)}"
                out[key] = metric.compute()
                metric.reset()
        return out
