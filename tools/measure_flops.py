#!/usr/bin/env python
"""Measure train-step FLOPs per batch for SpeedMonitor's MFU reporting.

Prints the XLA-cost-analysis FLOPs of one loss+grad step at the given
geometry (no compile, no device execution — safe on any host). Paste the
number into the yaml:

    callbacks:
      speed_monitor:
        _target_: diffusion_tpu.callbacks.monitors.SpeedMonitor
        flops_per_batch: <printed value>

Usage:
    python tools/measure_flops.py --batch 24 --size 256 \
        [--builder diffusion_tpu.models.models.stable_diffusion_tiny]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--builder",
                   default="diffusion_tpu.models.models.stable_diffusion_2")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from diffusion_tpu.config.loader import _import_target
    from diffusion_tpu.utils.flops import lowered_flops

    model = _import_target(args.builder)(
        pretrained=False, precomputed_latents=True, fsdp=False)
    params, frozen = model.init_params(jax.random.key(0),
                                       image_size=args.size)
    latent = args.size // 8
    ctx_dim = model.unet.config.cross_attention_dim
    batch = {
        "image_latents": jax.ShapeDtypeStruct(
            (args.batch, latent, latent, 4), jnp.bfloat16),
        "caption_latents": jax.ShapeDtypeStruct(
            (args.batch, 77, ctx_dim), jnp.bfloat16),
    }

    def loss_and_grad(params, batch, rng):
        return jax.value_and_grad(
            lambda p: model.loss_fn(p, frozen, batch, rng))(params)

    flops = lowered_flops(loss_and_grad, params, batch, jax.random.key(1))
    print(f"flops_per_batch: {flops:.6e}  "
          f"(batch {args.batch} @ {args.size}px -> "
          f"{flops / args.batch:.4e} per sample)")


if __name__ == "__main__":
    main()
