"""Model builders — the `_target_`s referenced from yaml configs.

TPU-native equivalent of the reference's constructor registry (reference:
diffusion/models/models.py): `stable_diffusion_2` (ref :28-112),
`discrete_pixel_diffusion` (ref :115-174), `continuous_pixel_diffusion`
(ref :177-228). Differences by design:

- `encode_latents_in_fp16` maps to **bfloat16** compute — the TPU-native low
  precision (fp16 autocast is a CUDA idiom; bf16 needs no loss scaling).
- xformers enablement (ref :107-111) is replaced by the Pallas flash-attention
  dispatch, on by default on TPU (ops/attention.py).
- `pretrained` loads from a local checkpoint directory instead of the
  network hub (this environment is zero-egress): either tools/port_weights.py
  msgpack output or raw HF safetensors subdirs, ported through
  models/port_hf.py and consumed by models/pretrained.py at Trainer/
  inference init. pretrained=False (the production configs' setting,
  yamls/hydra-yamls/SD-2-base-256.yaml:16) initializes from config geometry.
- metric construction (`val_metrics` names, per-guidance-scale fan-out) is
  resolved by the trainer's evaluator (metrics/), not baked into the model.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Tuple

import jax.numpy as jnp

from diffusion_tpu.models.clip import (CLIPTextModel, SD2_TEXT_CONFIG,
                                       VIT_L14_TEXT_CONFIG)
from diffusion_tpu.models.pixel_diffusion import PixelDiffusion
from diffusion_tpu.models.stable_diffusion import StableDiffusion
from diffusion_tpu.models.unet import PIXEL_UNET, SD2_BASE_UNET, UNet2DCondition
from diffusion_tpu.models.vae import SD2_VAE, AutoencoderKL
from diffusion_tpu.schedulers import (ContinuousTimeScheduler, DDIMScheduler,
                                      DDPMScheduler,
                                      DPMSolverMultistepScheduler,
                                      EulerDiscreteScheduler)
from diffusion_tpu.text.tokenizer import CLIPTokenizer, tiny_tokenizer

__all__ = ["stable_diffusion_2", "discrete_pixel_diffusion",
           "continuous_pixel_diffusion"]


def _load_tokenizer(path: Optional[str]) -> CLIPTokenizer:
    if path and os.path.exists(path):
        return CLIPTokenizer.from_pretrained(path)
    return tiny_tokenizer()


# Samplers selectable from yaml (`model.inference_scheduler:`). All share the
# SD2 noise schedule defaults (0.00085->0.012 scaled_linear); 'dpm++2m' is the
# beyond-reference fast sampler (schedulers/dpm.py), ~2-3x fewer UNet evals
# for 50-step-DDIM quality.
_INFERENCE_SCHEDULERS = {
    "ddim": DDIMScheduler,
    "dpm++2m": DPMSolverMultistepScheduler,
    "dpm": DPMSolverMultistepScheduler,
    "euler": EulerDiscreteScheduler,
}


def canonical_scheduler_name(name_or_sched) -> Optional[str]:
    """Canonical sampler name: 'dpm' aliases to 'dpm++2m', case-folded.
    Accepts a name or a scheduler instance (reverse lookup); returns None
    for schedulers outside the selectable set (e.g. continuous-time)."""
    if not isinstance(name_or_sched, str):
        for name in ("ddim", "dpm++2m", "euler"):
            if type(name_or_sched) is _INFERENCE_SCHEDULERS[name]:
                return name
        return None
    name = name_or_sched.lower()
    if name == "dpm":
        return "dpm++2m"
    if name not in _INFERENCE_SCHEDULERS:
        raise ValueError(
            f"unknown inference_scheduler {name_or_sched!r}; choose from "
            f"{sorted(_INFERENCE_SCHEDULERS)}")
    return name


def _make_inference_scheduler(name: str, like=None):
    """Build the named sampler. With `like` (an existing scheduler), carry
    over its noise-schedule/prediction config so switching samplers on a
    non-default model (different betas or v_prediction) keeps the schedule
    the model was trained for instead of resetting to SD2 defaults."""
    cls = _INFERENCE_SCHEDULERS[canonical_scheduler_name(name)]
    kwargs = {}
    if like is not None:
        for field in ("num_train_timesteps", "beta_start", "beta_end",
                      "beta_schedule", "prediction_type", "steps_offset",
                      "rescale_betas_zero_snr", "timestep_spacing"):
            value = getattr(like, field, None)
            if value is not None:
                kwargs[field] = value
    return cls(**kwargs)


def stable_diffusion_2(
    model_name: Optional[str] = None,
    pretrained: bool = False,
    train_metrics: Optional[List[str]] = None,
    val_metrics: Optional[List[Any]] = None,
    val_guidance_scales: Optional[List[float]] = None,
    val_seed: int = 1138,
    loss_bins: Optional[List] = None,
    precomputed_latents: bool = False,
    encode_latents_in_fp16: bool = True,
    fsdp: bool = True,
    remat: bool = False,
    inception_weights: Optional[str] = None,
    clip_metric_weights: Optional[str] = None,
    allow_random_tower_weights: bool = False,
    init_frozen_towers: Optional[bool] = None,
    inference_scheduler: str = "ddim",
    lora_rank: int = 0,
    lora_alpha: Optional[float] = None,
    train_lora_only: Optional[bool] = None,
    min_snr_gamma: Optional[float] = None,
    prediction_type: str = "epsilon",
    rescale_betas_zero_snr: bool = False,
    timestep_spacing: Optional[str] = None,
) -> StableDiffusion:
    """SD-2.0-base training setup (reference models.py:28-112).

    Args mirror the reference's builder; `model_name` is a *local* HF
    checkpoint dir when `pretrained=True` (zero-egress environment).
    `fsdp` is recorded on the model for the trainer's sharder (the reference
    sets _fsdp_wrap flags, stable_diffusion.py:148-152; here sharding is a
    pjit partition-spec decision in parallel/sharding.py).

    `lora_rank > 0` adds LoRA adapters to every attention projection and
    (by default) trains ONLY them — pair with `pretrained: true` for the
    classic adapter finetune; see models/lora.py. `train_lora_only: false`
    keeps the whole UNet trainable with the adapters as extra capacity.
    """
    dtype = jnp.bfloat16 if encode_latents_in_fp16 else jnp.float32
    if train_lora_only is None:
        train_lora_only = lora_rank > 0
    unet_cfg = SD2_BASE_UNET
    if lora_rank:
        import dataclasses as _dc
        unet_cfg = _dc.replace(unet_cfg, lora_rank=int(lora_rank),
                               lora_alpha=lora_alpha)
    unet = UNet2DCondition(unet_cfg, dtype=dtype, remat=remat)
    vae = AutoencoderKL(SD2_VAE, dtype=dtype)
    text_encoder = CLIPTextModel(SD2_TEXT_CONFIG, dtype=dtype)
    tokenizer = _load_tokenizer(model_name)
    # SD2: 0.00085->0.012 scaled_linear betas. prediction_type=v_prediction
    # gives the SD2.1-768-style velocity target; _make_inference_scheduler's
    # `like=` carries it into the sampler so generate() converts correctly.
    if timestep_spacing is None:
        # the zero-terminal-SNR recipe's two halves ship together
        # (arXiv:2305.08891): rescaled schedule + trailing spacing
        timestep_spacing = ("trailing" if rescale_betas_zero_snr
                            else "leading")
    noise_scheduler = DDPMScheduler(
        prediction_type=prediction_type,
        rescale_betas_zero_snr=rescale_betas_zero_snr,
        timestep_spacing=timestep_spacing)
    inference_scheduler = _make_inference_scheduler(inference_scheduler,
                                                    like=noise_scheduler)

    if pretrained and not (model_name and os.path.isdir(model_name)):
        raise FileNotFoundError(
            "pretrained=True requires model_name to be a local HF "
            "checkpoint directory (no network in this environment)")
    return StableDiffusion(
        unet=unet, vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
        noise_scheduler=noise_scheduler, inference_scheduler=inference_scheduler,
        precomputed_latents=precomputed_latents,
        val_seed=val_seed,
        val_guidance_scales=tuple(val_guidance_scales or ()),
        loss_bins=tuple(tuple(b) for b in (loss_bins or [(0, 1)])),
        train_metric_names=tuple(train_metrics or ("MeanSquaredError",)),
        val_metric_names=tuple(val_metrics or ("MeanSquaredError",
                                               "FrechetInceptionDistance")),
        fsdp=bool(fsdp),
        pretrained_path=model_name if pretrained else None,
        inception_weights=inception_weights,
        clip_metric_weights=clip_metric_weights,
        allow_random_tower_weights=bool(allow_random_tower_weights),
        init_frozen_towers=init_frozen_towers,
        train_lora_only=bool(train_lora_only),
        min_snr_gamma=min_snr_gamma,
        prediction_type=prediction_type,
    )


def stable_diffusion_tiny(val_guidance_scales: Optional[List[float]] = None,
                          precomputed_latents: bool = False,
                          model_name: Optional[str] = None,
                          pretrained: bool = False,
                          val_metrics: Optional[List[Any]] = None,
                          allow_random_tower_weights: bool = False,
                          inference_scheduler: str = "ddim",
                          lora_rank: int = 0,
                          lora_alpha: Optional[float] = None,
                          train_lora_only: Optional[bool] = None,
                          min_snr_gamma: Optional[float] = None,
                          prediction_type: str = "epsilon",
                          rescale_betas_zero_snr: bool = False,
                          timestep_spacing: Optional[str] = None,
                          **_: Any) -> StableDiffusion:
    """Tiny-geometry StableDiffusion for smoke tests / CI / CPU runs —
    real architecture, small channels (the reference's own test strategy,
    tests/test_model.py, applied as a first-class builder). Supports the
    same `pretrained`/`model_name` contract as `stable_diffusion_2`, so the
    pretrained-loading path is testable end-to-end at tiny geometry."""
    from diffusion_tpu.models.clip import CLIPTextConfig
    from diffusion_tpu.models.unet import UNetConfig
    from diffusion_tpu.models.vae import VAEConfig
    if train_lora_only is None:
        train_lora_only = lora_rank > 0
    unet = UNet2DCondition(UNetConfig(
        in_channels=4, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, block_has_attention=(True, False),
        attention_head_dim=(2, 4), cross_attention_dim=32, norm_num_groups=8,
        lora_rank=int(lora_rank), lora_alpha=lora_alpha))
    vae = AutoencoderKL(VAEConfig(block_out_channels=(8, 8, 8, 8),
                                  layers_per_block=1, norm_num_groups=4))
    text_encoder = CLIPTextModel(CLIPTextConfig(
        vocab_size=514, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2))
    if pretrained and not (model_name and os.path.isdir(model_name)):
        raise FileNotFoundError(
            "pretrained=True requires model_name to be a local checkpoint "
            "directory (no network in this environment)")
    return StableDiffusion(
        unet=unet, vae=vae, text_encoder=text_encoder,
        tokenizer=tiny_tokenizer(),
        noise_scheduler=DDPMScheduler(
            prediction_type=prediction_type,
            rescale_betas_zero_snr=rescale_betas_zero_snr,
            timestep_spacing=(timestep_spacing or (
                "trailing" if rescale_betas_zero_snr else "leading"))),
        inference_scheduler=_make_inference_scheduler(
            inference_scheduler,
            like=DDPMScheduler(
                prediction_type=prediction_type,
                rescale_betas_zero_snr=rescale_betas_zero_snr,
                timestep_spacing=(timestep_spacing or (
                    "trailing" if rescale_betas_zero_snr else "leading")))),
        prediction_type=prediction_type,
        precomputed_latents=precomputed_latents,
        pretrained_path=model_name if pretrained else None,
        val_metric_names=tuple(val_metrics or ("MeanSquaredError",)),
        allow_random_tower_weights=bool(allow_random_tower_weights),
        val_guidance_scales=tuple(val_guidance_scales or ()), fsdp=True,
        train_lora_only=bool(train_lora_only), min_snr_gamma=min_snr_gamma)


def _pixel_schedulers(prediction_type: str) -> Tuple[DDPMScheduler, DDIMScheduler]:
    """Hard-coded pixel schedulers (reference models.py:133-158)."""
    train = DDPMScheduler(num_train_timesteps=1000, beta_start=0.00085,
                          beta_end=0.012, beta_schedule="scaled_linear",
                          variance_type="fixed_small", clip_sample=False,
                          prediction_type=prediction_type)
    infer = DDIMScheduler(num_train_timesteps=1000, beta_start=0.00085,
                          beta_end=0.012, beta_schedule="scaled_linear",
                          clip_sample=False, set_alpha_to_one=False,
                          steps_offset=1, prediction_type=prediction_type)
    return train, infer


def discrete_pixel_diffusion(clip_model_name: Optional[str] = None,
                             prediction_type: str = "epsilon",
                             encode_in_bf16: bool = True) -> PixelDiffusion:
    """Pixel-space diffusion with discrete DDPM/DDIM (reference models.py:115-174):
    3->3ch UNet, heads (5,10,20,20), cross-attention 768, CLIP-ViT-L/14 text."""
    dtype = jnp.bfloat16 if encode_in_bf16 else jnp.float32
    unet = UNet2DCondition(PIXEL_UNET, dtype=dtype)
    text_encoder = CLIPTextModel(VIT_L14_TEXT_CONFIG, dtype=dtype)
    tokenizer = _load_tokenizer(clip_model_name)
    noise_scheduler, inference_scheduler = _pixel_schedulers(prediction_type)
    return PixelDiffusion(unet=unet, text_encoder=text_encoder,
                          tokenizer=tokenizer, noise_scheduler=noise_scheduler,
                          inference_scheduler=inference_scheduler,
                          prediction_type=prediction_type)


def continuous_pixel_diffusion(clip_model_name: Optional[str] = None,
                               prediction_type: str = "epsilon",
                               use_ode: bool = False,
                               train_t_max: float = 1.570795,
                               inference_t_max: float = 1.56,
                               encode_in_bf16: bool = True) -> PixelDiffusion:
    """Continuous-time VP diffusion in pixel space (reference models.py:177-228):
    same UNet/CLIP; tangent-schedule scheduler for train and inference, with
    optional probability-flow-ODE sampling."""
    dtype = jnp.bfloat16 if encode_in_bf16 else jnp.float32
    unet = UNet2DCondition(PIXEL_UNET, dtype=dtype)
    text_encoder = CLIPTextModel(VIT_L14_TEXT_CONFIG, dtype=dtype)
    tokenizer = _load_tokenizer(clip_model_name)
    noise_scheduler = ContinuousTimeScheduler(t_max=train_t_max,
                                              prediction_type=prediction_type)
    inference_scheduler = ContinuousTimeScheduler(t_max=inference_t_max,
                                                  prediction_type=prediction_type,
                                                  use_ode=use_ode)
    return PixelDiffusion(unet=unet, text_encoder=text_encoder,
                          tokenizer=tokenizer, noise_scheduler=noise_scheduler,
                          inference_scheduler=inference_scheduler,
                          prediction_type=prediction_type, continuous_time=True)
