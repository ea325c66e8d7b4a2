"""StableDiffusion model adapter: training forward/loss + CFG DDIM generation.

TPU-native equivalent of the reference's ComposerModel adapter (reference:
diffusion/models/stable_diffusion.py). Same semantics, functional style:

- `forward(params, batch, rng)`: precomputed-latent fast path (ref :157-158)
  else VAE-encode + CLIP-encode (ref :160-172), x0.18215 latent scale
  (ref :174), uniform timesteps (ref :177), DDPM `add_noise` (ref :179-180),
  UNet predicts noise (ref :183). Returns (pred, target, timesteps).
- `loss`: MSE(pred, target) (ref :185-187).
- `generate`: classifier-free-guidance DDIM sampling with the 2x-batched CFG
  trick (ref :336-375), VAE decode /0.18215 and [0,1] clamp (ref :379-382) —
  but the 50-step denoise loop is a single `jax.lax.scan` compiled once,
  instead of 50 Python-dispatched scheduler calls.

Everything is a pure function of an explicit param pytree: `params` carries
only the trainable UNet; the frozen VAE/text-encoder live in `frozen`
(reference freezes them via requires_grad_(False), ref :143-144 — here they
are simply never given to the optimizer, and the fp16-cast option maps to
bf16 compute, the TPU-native low precision).

Batch contract (NHWC, features-last):
  image            (B, H, W, 3) in [-1, 1]
  captions         (B, 77) int32 token ids
  image_latents    (B, H/8, W/8, 4) optional precomputed VAE latents
  caption_latents  (B, 77, D) optional precomputed CLIP states
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diffusion_tpu.models.clip import CLIPTextModel
from diffusion_tpu.models.unet import UNet2DCondition
from diffusion_tpu.models.vae import AutoencoderKL
from diffusion_tpu.schedulers import DDPMScheduler

__all__ = ["StableDiffusion"]


@dataclasses.dataclass(frozen=True)
class StableDiffusion:
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    tokenizer: Any
    noise_scheduler: DDPMScheduler
    # Any scheduler following the repo protocol (schedulers/): DDIM by
    # default; DPM-Solver++(2M)/Euler via the builder's inference_scheduler
    # knob. Multistep solvers additionally expose init_state/step_with_state.
    inference_scheduler: Any
    prediction_type: str = "epsilon"
    # Min-SNR loss weighting (Hang et al. 2023, arXiv:2303.09556; beyond the
    # reference's plain MSE, models/stable_diffusion.py:185-187): per-sample
    # weight clamps the effective SNR at gamma so easy low-noise timesteps
    # stop dominating the gradient. None = plain MSE (reference parity).
    min_snr_gamma: Optional[float] = None
    latent_scale: float = 0.18215
    precomputed_latents: bool = False
    image_key: str = "image"
    caption_key: str = "captions"
    image_latents_key: str = "image_latents"
    caption_latents_key: str = "caption_latents"
    val_seed: int = 1138
    val_guidance_scales: Tuple[float, ...] = ()
    loss_bins: Tuple[Tuple[float, float], ...] = ((0, 1),)
    num_images_per_prompt: int = 1
    train_metric_names: Tuple[str, ...] = ("MeanSquaredError",)
    val_metric_names: Tuple[str, ...] = ("MeanSquaredError",)
    fsdp: bool = True
    # When set, Trainer init and StableDiffusionInference load ported HF
    # weights from this directory via models/pretrained.py instead of
    # random-initializing (reference models.py:74-89 from_pretrained).
    pretrained_path: Optional[str] = None
    # generation-metric tower weights (.npz from tools/port_weights.py;
    # local path or s3://gs:// URL). Random towers are refused unless
    # explicitly allowed — see metrics/towers.py.
    inception_weights: Optional[str] = None
    clip_metric_weights: Optional[str] = None
    allow_random_tower_weights: bool = False
    # LoRA finetuning (models/lora.py): when True, only the UNet's LoRA
    # adapter params (requires unet.config.lora_rank > 0) are trainable;
    # the base UNet weights live in frozen["unet_base"] — same freezing
    # mechanism as the VAE/CLIP towers, so optimizer state, EMA, and
    # checkpoints cover just the ~MB-scale adapter.
    train_lora_only: bool = False
    # Skip materializing the frozen VAE/CLIP towers entirely. The reference
    # always moves them to the device (models.py:80-85, fp16); on the
    # precomputed-latent training path they are never applied, and ~1.7 GB
    # of HBM matters on a 16 GB chip. None -> auto: skip iff
    # precomputed_latents and no generation eval (val_guidance_scales=()).
    init_frozen_towers: Optional[bool] = None

    # ---------------- init ----------------
    def init_params(self, rng: jax.Array, image_size: int = 256,
                    text_len: int = 77) -> Tuple[Dict, Dict]:
        """Initialize (trainable, frozen) param pytrees at a given resolution.

        Param shapes are resolution-independent; image_size only sets the
        tracing shapes.
        """
        r_unet, r_vae, r_text = jax.random.split(rng, 3)
        latent = image_size // 8
        ctx_dim = self.unet.config.cross_attention_dim
        unet_params = self.unet.init(
            r_unet, jnp.zeros((1, latent, latent, self.unet.config.in_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, text_len, ctx_dim)))
        extra_frozen = {}
        if self.train_lora_only:
            from diffusion_tpu.models.lora import split_lora
            unet_params, extra_frozen["unet_base"] = split_lora(unet_params)
        want_frozen = self.init_frozen_towers
        if want_frozen is None:
            want_frozen = not (self.precomputed_latents
                               and not self.val_guidance_scales)
        if not want_frozen:
            return unet_params, extra_frozen
        vae_params = self.vae.init(
            r_vae, jnp.zeros((1, image_size, image_size, 3)), r_vae)
        text_params = self.text_encoder.init(
            r_text, jnp.zeros((1, text_len), jnp.int32))
        return unet_params, {"vae": vae_params, "text_encoder": text_params,
                             **extra_frozen}

    def unet_variables(self, params: Dict, frozen: Dict) -> Dict:
        """The full UNet variables tree for unet.apply: `params` as-is for
        full training, base+adapter merge when train_lora_only split the
        tree (pure pytree ops — traced once, free at runtime)."""
        if "unet_base" in frozen:
            from diffusion_tpu.models.lora import merge_lora
            return merge_lora(frozen["unet_base"], params)
        return params

    # ---------------- training ----------------
    def encode_images(self, frozen: Dict, images: jnp.ndarray,
                      rng: jax.Array) -> jnp.ndarray:
        """VAE-encode to scaled latents (reference :160-174)."""
        if "vae" not in frozen:
            raise RuntimeError(
                "batch carries raw images but the frozen VAE/CLIP towers "
                "were not initialized (init_frozen_towers resolved False — "
                "precomputed_latents=True with no guidance scales). Either "
                "feed precomputed-latent batches to every dataloader "
                "(including eval) or set init_frozen_towers=True.")
        posterior = self.vae.apply(frozen["vae"], images, method=self.vae.encode)
        return posterior.sample(rng) * self.latent_scale

    def encode_text(self, frozen: Dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        hidden, _ = self.text_encoder.apply(frozen["text_encoder"], input_ids)
        return hidden

    def forward(self, params: Dict, frozen: Dict, batch: Dict[str, jnp.ndarray],
                rng: jax.Array, train: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Diffusion forward pass -> (prediction, target, timesteps).

        `train=True` activates UNet dropout when cfg.dropout > 0 (the eval
        loop passes train=False, Composer model.eval() semantics)."""
        use_dropout = train and getattr(self.unet.config, "dropout", 0.0) > 0
        if use_dropout:
            r_enc, r_t, r_noise, r_drop = jax.random.split(rng, 4)
        else:
            r_enc, r_t, r_noise = jax.random.split(rng, 3)
        if self.precomputed_latents and self.image_latents_key in batch:
            latents = batch[self.image_latents_key].astype(jnp.float32)
            conditioning = batch[self.caption_latents_key].astype(jnp.float32)
        else:
            latents = self.encode_images(frozen, batch[self.image_key], r_enc)
            conditioning = self.encode_text(frozen, batch[self.caption_key])

        bsz = latents.shape[0]
        num_t = self.noise_scheduler.num_train_timesteps
        timesteps = jax.random.randint(r_t, (bsz,), 0, num_t)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noised = self.noise_scheduler.add_noise(latents, noise, timesteps)
        pred = self.unet.apply(
            self.unet_variables(params, frozen), noised, timesteps,
            conditioning, deterministic=not use_dropout,
            rngs={"dropout": r_drop} if use_dropout else None)
        if self.prediction_type == "epsilon":
            target = noise
        elif self.prediction_type == "sample":
            target = latents
        elif self.prediction_type == "v_prediction":
            target = self.noise_scheduler.get_velocity(latents, noise, timesteps)
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type!r}")
        return pred, target, timesteps

    def loss(self, outputs: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        """MSE(pred, target) (ref :185-187), optionally min-SNR-weighted.

        With `min_snr_gamma` set, each sample's squared error is scaled by
        the prediction-space min-SNR weight (arXiv:2303.09556 tbl. 1):
        epsilon: min(SNR, g)/SNR; v: min(SNR, g)/(SNR+1); sample (x0-space
        loss is 1/SNR of the epsilon-space one): min(SNR, g)."""
        pred, target = outputs[0], outputs[1]
        se = jnp.square(pred.astype(jnp.float32)
                        - target.astype(jnp.float32))
        if self.min_snr_gamma is None:
            return jnp.mean(se)
        t = outputs[2]
        abar = self.noise_scheduler.alphas_cumprod[t]           # (B,)
        snr = abar / jnp.maximum(1.0 - abar, 1e-12)
        g = float(self.min_snr_gamma)
        if self.prediction_type == "epsilon":
            w = jnp.minimum(snr, g) / snr
        elif self.prediction_type == "v_prediction":
            w = jnp.minimum(snr, g) / (snr + 1.0)
        elif self.prediction_type == "sample":
            w = jnp.minimum(snr, g)
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type!r}")
        per_sample = jnp.mean(se, axis=tuple(range(1, se.ndim)))
        return jnp.mean(w * per_sample)

    def loss_fn(self, params: Dict, frozen: Dict, batch: Dict,
                rng: jax.Array) -> jnp.ndarray:
        """Scalar training loss; the function handed to jax.grad."""
        return self.loss(self.forward(params, frozen, batch, rng))

    # ---------------- generation ----------------
    def _empty_prompt_ids(self, batch: int, length: int) -> jnp.ndarray:
        """Token ids of the empty prompt: BOS + EOS + padding (the CFG
        unconditional row when no negative prompt is given)."""
        pad = getattr(self.tokenizer, "pad_token_id", 0)
        bos = getattr(self.tokenizer, "bos_token_id", 0)
        eos = getattr(self.tokenizer, "eos_token_id", 0)
        ids = jnp.full((batch, length), pad, jnp.int32)
        return ids.at[:, 0].set(bos).at[:, 1].set(eos)

    def embed_prompts(self, frozen: Dict, prompt_ids: jnp.ndarray,
                      negative_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(uncond, cond) embeddings stacked 2x-batch for CFG (ref :336-345)."""
        if negative_ids is None:
            negative_ids = self._empty_prompt_ids(prompt_ids.shape[0],
                                                  prompt_ids.shape[1])
        cond = self.encode_text(frozen, prompt_ids)
        uncond = self.encode_text(frozen, negative_ids)
        return jnp.concatenate([uncond, cond], axis=0)

    def denoise_loop(self, params: Dict, latents: jnp.ndarray,
                     text_embeddings: jnp.ndarray, guidance_scale: float,
                     num_inference_steps: int, t_start: int = 0,
                     inpaint: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]] = None,
                     guidance_rescale: float = 0.0) -> jnp.ndarray:
        """CFG denoise loop under lax.scan (ref :359-375, one compile).

        Works with any scheduler following the repo protocol. Multistep
        solvers (schedulers/dpm.py DPM-Solver++(2M)) expose `init_state`;
        their per-step state is carried through the scan alongside the
        latents so the whole loop still compiles to one XLA while-loop.
        `t_start` (static) skips the first grid entries — the img2img/SDEdit
        path enters mid-trajectory with latents already noised to
        `timesteps(n)[0][t_start]`.

        `inpaint = (lat0, mask, noise)` masks the denoise (inpainting):
        after every step the region where mask==0 is replaced by the clean
        latents `lat0` re-noised to the step's destination noise level in
        the sampler's own working space (`noise_to`), so only mask==1 evolves
        freely. The terminal step (t_prev < 0) pastes `lat0` exactly."""
        sched = self.inference_scheduler
        ts, tps = sched.timesteps(num_inference_steps)
        ts, tps = ts[t_start:], tps[t_start:]
        n = len(ts)
        if n == 0:
            return latents

        if inpaint is not None:
            lat0, mask, ip_noise = inpaint

            def blend(lat, tp):
                keep = jnp.where(
                    tp >= 0,
                    sched.noise_to(lat0, ip_noise, jnp.maximum(tp, 0)),
                    lat0)
                return mask * lat + (1.0 - mask) * keep
        else:
            blend = None

        def cfg_pred(lat, t):
            model_in = jnp.concatenate([lat, lat], axis=0)
            model_in = sched.scale_model_input(model_in, t)
            tt = jnp.broadcast_to(t, (model_in.shape[0],))
            pred = self.unet.apply(params, model_in, tt, text_embeddings)
            uncond, cond = jnp.split(pred, 2, axis=0)
            out = uncond + guidance_scale * (cond - uncond)
            if guidance_rescale > 0.0:
                # Lin et al. 2023 (arXiv:2305.08891 §3.4): CFG inflates the
                # prediction's std; rescale toward the conditional branch's
                # std to fix the resulting over-exposure (essential with
                # zero-terminal-SNR v_prediction models, useful generally)
                axes = tuple(range(1, out.ndim))
                std_cond = jnp.std(cond, axis=axes, keepdims=True)
                std_cfg = jnp.maximum(jnp.std(out, axis=axes, keepdims=True),
                                      1e-12)
                out = (guidance_rescale * (out * std_cond / std_cfg)
                       + (1.0 - guidance_rescale) * out)
            return out

        if hasattr(sched, "init_state"):
            def body(carry, xs):
                lat, state = carry
                i, t, tp = xs
                pred = cfg_pred(lat, t)
                lat, state = sched.step_with_state(pred, t, tp, lat, state,
                                                   i, n)
                if blend is not None:
                    lat = blend(lat, tp)
                return (lat, state), None

            (latents, _), _ = jax.lax.scan(
                body, (latents, sched.init_state(latents)),
                (jnp.arange(n), jnp.asarray(ts), jnp.asarray(tps)))
        else:
            def body(lat, t_pair):
                t, tp = t_pair
                pred = cfg_pred(lat, t)
                lat = sched.step(pred, t, tp, lat)
                if blend is not None:
                    lat = blend(lat, tp)
                return lat, None

            latents, _ = jax.lax.scan(body, latents,
                                      (jnp.asarray(ts), jnp.asarray(tps)))
        return latents

    def generate(self, params: Dict, frozen: Dict,
                 prompt_ids: Optional[jnp.ndarray] = None,
                 negative_ids: Optional[jnp.ndarray] = None,
                 prompt_embeds: Optional[jnp.ndarray] = None,
                 negative_prompt_embeds: Optional[jnp.ndarray] = None,
                 height: int = 256, width: int = 256,
                 guidance_scale: float = 3.0, num_inference_steps: int = 50,
                 num_images_per_prompt: int = 1,
                 seed: Optional[int] = None,
                 rng: Optional[jax.Array] = None,
                 image: Optional[jnp.ndarray] = None,
                 strength: float = 0.8,
                 mask: Optional[jnp.ndarray] = None,
                 guidance_rescale: float = 0.0,
                 output_type: str = "image") -> jnp.ndarray:
        """Text -> images in [0, 1], (B, H, W, 3). Same seed => same images
        (reference seeds a torch Generator, ref :322-326; here a jax key).

        Pre-computed `prompt_embeds`/`negative_prompt_embeds` (B, 77, D)
        bypass the text encoder (reference generate's prompt_embeds surface,
        ref :266-267); `num_images_per_prompt` repeats each conditioning
        (ref :272).

        img2img (SDEdit; beyond the reference's text-only generate): pass
        `image` (B, H, W, 3) in [0, 1] and a static `strength` in (0, 1] —
        the image is VAE-encoded, noised to the grid point `strength` of the
        way back toward pure noise (diffusers Img2Img semantics:
        init_timestep = int(steps * strength)), and only the remaining tail
        of the denoise loop runs, so cost scales with strength too.

        Inpainting (works with any SD2 checkpoint — masked denoising, no
        9-channel UNet needed): additionally pass `mask` in [0, 1] with
        1 = regenerate and 0 = preserve, shaped (B, H, W), (B, H, W, 1) or
        already at latent resolution (B, H/8, W/8[, 1]). Image-resolution
        masks are 8x8 average-pooled, so soft edges blend smoothly. After
        every denoise step the preserved region is re-imposed from the
        original latents at the step's noise level; `strength=1.0` frees
        the masked region completely.

        `guidance_rescale` (0 = off) applies Lin et al. 2023's CFG std
        rescale — pair with `rescale_betas_zero_snr` v-prediction models
        (the paper recommends ~0.7)."""
        if rng is None:
            rng = jax.random.key(self.val_seed if seed is None else seed)
        if prompt_embeds is not None:
            cond = jnp.asarray(prompt_embeds)
            if negative_prompt_embeds is not None:
                uncond = jnp.asarray(negative_prompt_embeds)
            else:
                uncond = self.encode_text(
                    frozen, self._empty_prompt_ids(cond.shape[0],
                                                   cond.shape[1]))
            embeddings = jnp.concatenate([uncond, cond], axis=0)
            bsz = cond.shape[0]
        else:
            if prompt_ids is None:
                raise ValueError("need prompt_ids or prompt_embeds")
            if "text_encoder" not in frozen:
                raise ValueError(
                    "generation requires the frozen VAE/CLIP towers, but "
                    "they were not initialized (init_frozen_towers resolved "
                    "False on the precomputed-latent path). Pass "
                    "init_frozen_towers=true to the model builder.")
            bsz = prompt_ids.shape[0]
            embeddings = self.embed_prompts(frozen, prompt_ids, negative_ids)
        if num_images_per_prompt > 1:
            uncond, cond = jnp.split(embeddings, 2, axis=0)
            embeddings = jnp.concatenate(
                [jnp.repeat(uncond, num_images_per_prompt, axis=0),
                 jnp.repeat(cond, num_images_per_prompt, axis=0)], axis=0)
            bsz = bsz * num_images_per_prompt
        sched = self.inference_scheduler
        lat_shape = (bsz, height // 8, width // 8,
                     self.vae.config.latent_channels)
        if mask is not None and image is None:
            raise ValueError("mask (inpainting) requires an init image")
        inpaint = None
        if image is not None:
            if not hasattr(sched, "noise_to"):
                raise ValueError(
                    f"img2img needs a scheduler with noise_to; "
                    f"{type(sched).__name__} has none")
            if not 0.0 < strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            rng, enc_rng = jax.random.split(rng)
            img = jnp.asarray(image, jnp.float32) * 2.0 - 1.0
            lat0 = self.encode_images(frozen, img, enc_rng)
            if num_images_per_prompt > 1:
                lat0 = jnp.repeat(lat0, num_images_per_prompt, axis=0)
            # diffusers Img2Img: keep the last init_timestep grid entries
            init_timestep = min(int(num_inference_steps * strength),
                                num_inference_steps)
            t_start = num_inference_steps - init_timestep
            ts, _ = sched.timesteps(num_inference_steps)
            noise = jax.random.normal(rng, lat_shape, jnp.float32)
            if init_timestep == 0:
                # strength rounds to zero grid entries: nothing to denoise,
                # the output is the VAE reconstruction of the input
                latents = lat0
            else:
                latents = sched.noise_to(lat0, noise,
                                         jnp.asarray(ts[t_start]))
            if mask is not None:
                m = jnp.asarray(mask, jnp.float32)
                if m.ndim == 3:
                    m = m[..., None]                       # (B, H, W, 1)
                lh, lw = lat_shape[1], lat_shape[2]
                if m.shape[1] != lh or m.shape[2] != lw:
                    if m.shape[1] % lh or m.shape[2] % lw:
                        raise ValueError(
                            f"mask spatial dims {m.shape[1:3]} are neither "
                            f"latent-resolution ({lh}, {lw}) nor an integer "
                            f"multiple of it")
                    fh, fw = m.shape[1] // lh, m.shape[2] // lw
                    # average-pool to latent resolution (soft edges blend)
                    m = m.reshape(m.shape[0], lh, fh, lw, fw, 1).mean((2, 4))
                if num_images_per_prompt > 1:
                    m = jnp.repeat(m, num_images_per_prompt, axis=0)
                inpaint = (lat0, m, noise)
        else:
            t_start = 0
            # sigma-space samplers (Euler) scale x_T by the *inference
            # grid's* top sigma, not the full-grid one (dpm.py init_sigma)
            init_scale = (sched.init_sigma(num_inference_steps)
                          if hasattr(sched, "init_sigma")
                          else sched.init_noise_sigma)
            latents = jax.random.normal(rng, lat_shape,
                                        jnp.float32) * init_scale
        latents = self.denoise_loop(self.unet_variables(params, frozen),
                                    latents, embeddings,
                                    guidance_scale, num_inference_steps,
                                    t_start=t_start, inpaint=inpaint,
                                    guidance_rescale=guidance_rescale)
        if output_type == "latent":
            # model-space latents (still x latent_scale) — diffusers'
            # output_type="latent" surface; with prompt_embeds this path
            # never touches the frozen towers (convergence/latent evals)
            return latents
        if output_type != "image":
            raise ValueError(f"output_type must be 'image' or 'latent', "
                             f"got {output_type!r}")
        images = self.vae.apply(frozen["vae"], latents / self.latent_scale,
                                method=self.vae.decode)
        return jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)

    # ---------------- eval ----------------
    def eval_forward(self, params: Dict, frozen: Dict, batch: Dict,
                     rng: jax.Array,
                     num_inference_steps: int = 50,
                     height: int = 256, width: int = 256) -> Dict[str, Any]:
        """Forward MSE inputs + one generation per val guidance scale
        (reference :189-208; fixed val_seed => deterministic images)."""
        outputs = self.forward(params, frozen, batch, rng)
        generated = {}
        for scale in self.val_guidance_scales:
            generated[float(scale)] = self.generate(
                params, frozen, batch[self.caption_key],
                height=height, width=width, guidance_scale=float(scale),
                num_inference_steps=num_inference_steps, seed=self.val_seed)
        return {"pred": outputs[0], "target": outputs[1],
                "timesteps": outputs[2], "generated": generated}
