"""PixelDiffusion model adapter: pixel-space diffusion, discrete or continuous.

TPU-native equivalent of the reference's PixelDiffusion ComposerModel
(reference: diffusion/models/pixel_diffusion.py): prediction_type in
{sample, epsilon, v_prediction} with targets inputs/noise/velocity
(ref :86-94); `continuous_time` samples t ~ U(0, t_max) instead of randint
(ref :75-81); generate has no VAE — rescale to [0,1] only (ref :214-241);
eval uses a fixed val_seed generator (ref :104-108).

The sampling loop supports both the DDIM scheduler and the continuous-time
VP-SDE scheduler (SDE noise injected per-step with keys threaded through the
`lax.scan` carry).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diffusion_tpu.models.clip import CLIPTextModel
from diffusion_tpu.models.unet import UNet2DCondition
from diffusion_tpu.schedulers import ContinuousTimeScheduler

__all__ = ["PixelDiffusion"]


@dataclasses.dataclass(frozen=True)
class PixelDiffusion:
    unet: UNet2DCondition
    text_encoder: CLIPTextModel
    tokenizer: Any
    noise_scheduler: Any            # DDPMScheduler or ContinuousTimeScheduler
    inference_scheduler: Any        # DDIMScheduler or ContinuousTimeScheduler
    prediction_type: str = "epsilon"
    continuous_time: bool = False
    image_key: str = "image"
    caption_key: str = "captions"
    val_seed: int = 1138
    val_guidance_scales: Tuple[float, ...] = ()

    def init_params(self, rng: jax.Array, image_size: int = 64,
                    text_len: int = 77) -> Tuple[Dict, Dict]:
        r_unet, r_text = jax.random.split(rng)
        ctx_dim = self.unet.config.cross_attention_dim
        unet_params = self.unet.init(
            r_unet, jnp.zeros((1, image_size, image_size,
                               self.unet.config.in_channels)),
            jnp.zeros((1,), jnp.float32 if self.continuous_time else jnp.int32),
            jnp.zeros((1, text_len, ctx_dim)))
        text_params = self.text_encoder.init(
            r_text, jnp.zeros((1, text_len), jnp.int32))
        return unet_params, {"text_encoder": text_params}

    def encode_text(self, frozen: Dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        hidden, _ = self.text_encoder.apply(frozen["text_encoder"], input_ids)
        return hidden

    def forward(self, params: Dict, frozen: Dict, batch: Dict,
                rng: jax.Array, train: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        inputs = batch[self.image_key].astype(jnp.float32)
        conditioning = self.encode_text(frozen, batch[self.caption_key])
        use_dropout = train and getattr(self.unet.config, "dropout", 0.0) > 0
        if use_dropout:
            r_t, r_noise, r_drop = jax.random.split(rng, 3)
        else:
            r_t, r_noise = jax.random.split(rng)
        bsz = inputs.shape[0]
        if self.continuous_time:
            timesteps = jax.random.uniform(
                r_t, (bsz,), jnp.float32, 0.0, self.noise_scheduler.t_max)
        else:
            timesteps = jax.random.randint(
                r_t, (bsz,), 0, self.noise_scheduler.num_train_timesteps)
        noise = jax.random.normal(r_noise, inputs.shape, jnp.float32)
        noised = self.noise_scheduler.add_noise(inputs, noise, timesteps)
        pred = self.unet.apply(params, noised, timesteps, conditioning,
                               deterministic=not use_dropout,
                               rngs={"dropout": r_drop} if use_dropout
                               else None)
        if self.prediction_type == "sample":
            target = inputs
        elif self.prediction_type == "epsilon":
            target = noise
        elif self.prediction_type == "v_prediction":
            target = self.noise_scheduler.get_velocity(inputs, noise, timesteps)
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type!r}")
        return pred, target, timesteps

    @staticmethod
    def loss(outputs: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        pred, target = outputs[0], outputs[1]
        return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - target.astype(jnp.float32)))

    def loss_fn(self, params: Dict, frozen: Dict, batch: Dict,
                rng: jax.Array) -> jnp.ndarray:
        return self.loss(self.forward(params, frozen, batch, rng))

    def embed_prompts(self, frozen: Dict, prompt_ids: jnp.ndarray,
                      negative_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if negative_ids is None:
            pad = getattr(self.tokenizer, "pad_token_id", 0)
            bos = getattr(self.tokenizer, "bos_token_id", 0)
            eos = getattr(self.tokenizer, "eos_token_id", 0)
            negative_ids = jnp.full_like(prompt_ids, pad)
            negative_ids = negative_ids.at[:, 0].set(bos).at[:, 1].set(eos)
        cond = self.encode_text(frozen, prompt_ids)
        uncond = self.encode_text(frozen, negative_ids)
        return jnp.concatenate([uncond, cond], axis=0)

    def generate(self, params: Dict, frozen: Dict, prompt_ids: jnp.ndarray,
                 negative_ids: Optional[jnp.ndarray] = None,
                 height: int = 64, width: int = 64,
                 guidance_scale: float = 3.0, num_inference_steps: int = 50,
                 seed: Optional[int] = None,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if rng is None:
            rng = jax.random.key(self.val_seed if seed is None else seed)
        sched = self.inference_scheduler
        is_sde = isinstance(sched, ContinuousTimeScheduler) and not sched.use_ode
        r_init, r_loop = jax.random.split(rng)
        bsz = prompt_ids.shape[0]
        embeddings = self.embed_prompts(frozen, prompt_ids, negative_ids)
        shape = (bsz, height, width, self.unet.config.out_channels)
        latents = jax.random.normal(r_init, shape, jnp.float32) * sched.init_noise_sigma
        ts, tps = sched.timesteps(num_inference_steps)

        def body(carry, t_pair):
            lat, key = carry
            t, tp = t_pair
            model_in = jnp.concatenate([lat, lat], axis=0)
            model_in = sched.scale_model_input(model_in, t)
            tt = jnp.broadcast_to(t, (model_in.shape[0],))
            pred = self.unet.apply(params, model_in, tt, embeddings)
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
            if is_sde:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, lat.shape, jnp.float32)
                lat = sched.step(pred, t, tp, lat, noise=noise)
            else:
                lat = sched.step(pred, t, tp, lat)
            return (lat, key), None

        (latents, _), _ = jax.lax.scan(body, (latents, r_loop),
                                       (jnp.asarray(ts), jnp.asarray(tps)))
        return jnp.clip(latents * 0.5 + 0.5, 0.0, 1.0)

    def eval_forward(self, params: Dict, frozen: Dict, batch: Dict,
                     rng: jax.Array, num_inference_steps: int = 50,
                     height: int = 64, width: int = 64) -> Dict[str, Any]:
        outputs = self.forward(params, frozen, batch, rng)
        generated = {}
        for scale in self.val_guidance_scales:
            generated[float(scale)] = self.generate(
                params, frozen, batch[self.caption_key],
                height=height, width=width, guidance_scale=float(scale),
                num_inference_steps=num_inference_steps, seed=self.val_seed)
        return {"pred": outputs[0], "target": outputs[1],
                "timesteps": outputs[2], "generated": generated}
