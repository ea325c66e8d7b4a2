"""Shared tiny-model builders for tests (reference strategy: real architecture
at tiny spatial size, reference tests/test_model.py:13-28)."""

from diffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from diffusion_tpu.models.pixel_diffusion import PixelDiffusion
from diffusion_tpu.models.stable_diffusion import StableDiffusion
from diffusion_tpu.models.unet import UNet2DCondition, UNetConfig
from diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_tpu.schedulers import (ContinuousTimeScheduler, DDIMScheduler,
                                      DDPMScheduler)
from diffusion_tpu.text.tokenizer import tiny_tokenizer

TINY_TEXT = CLIPTextConfig(vocab_size=514, hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           max_position_embeddings=77)


def tiny_stable_diffusion(precomputed_latents=False, val_guidance_scales=(),
                          prediction_type="epsilon"):
    unet_cfg = UNetConfig(in_channels=4, out_channels=4,
                          block_out_channels=(16, 32), layers_per_block=1,
                          block_has_attention=(True, False),
                          attention_head_dim=(2, 4), cross_attention_dim=16,
                          norm_num_groups=8)
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                        norm_num_groups=4)
    return StableDiffusion(
        unet=UNet2DCondition(unet_cfg),
        vae=AutoencoderKL(vae_cfg),
        text_encoder=CLIPTextModel(TINY_TEXT),
        tokenizer=tiny_tokenizer(),
        noise_scheduler=DDPMScheduler(prediction_type=prediction_type),
        inference_scheduler=DDIMScheduler(prediction_type=prediction_type),
        prediction_type=prediction_type,
        precomputed_latents=precomputed_latents,
        val_guidance_scales=tuple(val_guidance_scales),
        allow_random_tower_weights=True,  # tests exercise shapes, not values
    )


def tiny_pixel_diffusion(continuous_time=False, prediction_type="epsilon",
                         use_ode=False):
    unet_cfg = UNetConfig(in_channels=3, out_channels=3,
                          block_out_channels=(16, 32), layers_per_block=1,
                          block_has_attention=(True, False),
                          attention_head_dim=(2, 4), cross_attention_dim=16,
                          norm_num_groups=8)
    if continuous_time:
        noise_sched = ContinuousTimeScheduler(t_max=1.570795,
                                              prediction_type=prediction_type)
        infer_sched = ContinuousTimeScheduler(t_max=1.56, use_ode=use_ode,
                                              prediction_type=prediction_type)
    else:
        noise_sched = DDPMScheduler(prediction_type=prediction_type)
        infer_sched = DDIMScheduler(prediction_type=prediction_type)
    return PixelDiffusion(
        unet=UNet2DCondition(unet_cfg),
        text_encoder=CLIPTextModel(TINY_TEXT),
        tokenizer=tiny_tokenizer(),
        noise_scheduler=noise_sched,
        inference_scheduler=infer_sched,
        prediction_type=prediction_type,
        continuous_time=continuous_time,
    )
