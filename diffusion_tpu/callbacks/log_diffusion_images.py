"""LogDiffusionImages callback: sample fixed prompts during eval, log images.

TPU-native equivalent of the reference callback (reference:
diffusion/callbacks/log_diffusion_images.py): fires on the first eval batch
only (ref :54), tokenizes a fixed prompt list once (ref :62-69), generates
with the model's sampler (ref :72-80), and sends one image per prompt to
every logger destination (ref :83-84). The generation itself is the jitted
`model.generate` lax.scan loop; no DDP unwrap is needed (ref :57-60) because
there is no module wrapper — params are explicit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

from diffusion_tpu.train.events import Callback

__all__ = ["LogDiffusionImages"]


class LogDiffusionImages(Callback):
    def __init__(self, prompts: Sequence[str] = ("a majestic lion",),
                 size: int = 256, guidance_scale: float = 0.0,
                 num_inference_steps: int = 50, seed: int = 1138):
        self.prompts = list(prompts)
        self.size = size
        self.guidance_scale = guidance_scale
        self.num_inference_steps = num_inference_steps
        self.seed = seed
        self._tokenized = None
        self._gen_fn = None

    def eval_batch_end(self, state, logger):
        if state.eval_batch_idx != 0:       # first eval batch only (ref :54)
            return
        model = state.model
        if self._tokenized is None:
            import jax.numpy as jnp
            self._tokenized = jnp.asarray(
                model.tokenizer(self.prompts)["input_ids"])
        if self._gen_fn is None:
            import functools
            self._gen_fn = jax.jit(functools.partial(
                model.generate, height=self.size, width=self.size,
                guidance_scale=self.guidance_scale,
                num_inference_steps=self.num_inference_steps, seed=self.seed))
        images = self._gen_fn(state.train_state.params, state.frozen,
                              self._tokenized)
        images = np.asarray(images)
        for prompt, img in zip(self.prompts, images):
            logger.log_images(img, name=prompt, step=state.timestamp.batch)
