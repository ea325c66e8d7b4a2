"""Capture diffusers golden fixtures for UNet/VAE forward parity.

Run this in an environment WITH diffusers installed (e.g. the reference's
image) — this repo's image is zero-egress and has no diffusers, so the
fixtures are captured once elsewhere and committed under tests/fixtures/.
The specs below are the single source of truth for the tiny geometries:
tests/test_hf_parity.py builds our Flax models from the same spec, so the
fixture and the test can never drift apart.

Usage (in a diffusers env):
    python tools/capture_goldens.py --out tests/fixtures/

Produces unet_golden.npz / vae_golden.npz, each carrying the torch
state_dict tensors (prefixed 'w:'), the inputs, and the expected outputs —
all float32, NCHW (the test transposes to our NHWC).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# tiny but structurally complete: two down/up blocks, one with cross-attn,
# GroupNorm groups that divide the channels, SD2-style linear projections.
TINY_UNET_SPEC = dict(
    in_channels=4,
    out_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=1,
    block_has_attention=(True, False),
    attention_head_dim=(2, 4),
    cross_attention_dim=16,
    norm_num_groups=8,
    use_linear_projection=True,
)

TINY_VAE_SPEC = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=(8, 8, 8, 8),
    layers_per_block=1,
    norm_num_groups=4,
)


def unet_config_from_spec(spec: dict):
    """Our UNetConfig from the shared spec (importable without diffusers)."""
    from diffusion_tpu.models.unet import UNetConfig
    return UNetConfig(**spec)


def vae_config_from_spec(spec: dict):
    from diffusion_tpu.models.vae import VAEConfig
    return VAEConfig(**spec)


def _diffusers_unet(spec: dict):
    from diffusers import UNet2DConditionModel
    has = spec["block_has_attention"]
    down = tuple("CrossAttnDownBlock2D" if a else "DownBlock2D" for a in has)
    up = tuple("CrossAttnUpBlock2D" if a else "UpBlock2D" for a in reversed(has))
    return UNet2DConditionModel(
        sample_size=8,
        in_channels=spec["in_channels"],
        out_channels=spec["out_channels"],
        down_block_types=down,
        up_block_types=up,
        block_out_channels=spec["block_out_channels"],
        layers_per_block=spec["layers_per_block"],
        attention_head_dim=spec["attention_head_dim"],
        cross_attention_dim=spec["cross_attention_dim"],
        norm_num_groups=spec["norm_num_groups"],
        use_linear_projection=spec["use_linear_projection"],
    )


def _diffusers_vae(spec: dict):
    from diffusers import AutoencoderKL
    n = len(spec["block_out_channels"])
    return AutoencoderKL(
        in_channels=spec["in_channels"],
        out_channels=spec["out_channels"],
        latent_channels=spec["latent_channels"],
        down_block_types=("DownEncoderBlock2D",) * n,
        up_block_types=("UpDecoderBlock2D",) * n,
        block_out_channels=spec["block_out_channels"],
        layers_per_block=spec["layers_per_block"],
        norm_num_groups=spec["norm_num_groups"],
    )


def capture_unet(out_dir: str) -> str:
    import torch

    torch.manual_seed(0)
    unet = _diffusers_unet(TINY_UNET_SPEC).eval()
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    timesteps = np.asarray([10, 500], np.int64)
    ehs = rng.normal(size=(2, 7, TINY_UNET_SPEC["cross_attention_dim"])
                     ).astype(np.float32)
    with torch.no_grad():
        expected = unet(torch.from_numpy(sample),
                        torch.from_numpy(timesteps),
                        torch.from_numpy(ehs)).sample.numpy()
    blob = {f"w:{k}": v.detach().numpy() for k, v in unet.state_dict().items()}
    blob.update(sample=sample, timesteps=timesteps,
                encoder_hidden_states=ehs, expected=expected)
    path = os.path.join(out_dir, "unet_golden.npz")
    np.savez_compressed(path, **blob)
    return path


def capture_vae(out_dir: str) -> str:
    import torch

    torch.manual_seed(0)
    vae = _diffusers_vae(TINY_VAE_SPEC).eval()
    rng = np.random.default_rng(0)
    image = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    latent = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)  # 32px / 2^3
    with torch.no_grad():
        posterior = vae.encode(torch.from_numpy(image)).latent_dist
        latent_mean = posterior.mean.numpy()
        decoded = vae.decode(torch.from_numpy(latent)).sample.numpy()
    blob = {f"w:{k}": v.detach().numpy() for k, v in vae.state_dict().items()}
    blob.update(image=image, latent=latent, latent_mean=latent_mean,
                decoded=decoded)
    path = os.path.join(out_dir, "vae_golden.npz")
    np.savez_compressed(path, **blob)
    return path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    print("wrote", capture_unet(args.out))
    print("wrote", capture_vae(args.out))


if __name__ == "__main__":
    main()
