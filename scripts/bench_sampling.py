#!/usr/bin/env python
"""Sampling benchmark: 50-step CFG-DDIM text-to-image throughput.

The second first-class metric from BASELINE.md ("50-step DDIM samples/min").
Measures the full serving path — jitted `lax.scan` denoise loop (2x-batched
CFG) + VAE decode — on the SD2 flagship.

  python scripts/bench_sampling.py [--size 256] [--batch 4] [--steps 50]

Prints one JSON line (separate from bench.py's training headline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--scheduler", default="ddim",
                   choices=["ddim", "dpm++2m", "euler"],
                   help="sampler; dpm++2m matches 50-step DDIM quality in "
                        "~20 steps (schedulers/dpm.py)")
    p.add_argument("--tiny", action="store_true",
                   help="CI smoke: stable_diffusion_tiny instead of SD2")
    args = p.parse_args(argv)

    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_tpu.models.models import (stable_diffusion_2,
                                             stable_diffusion_tiny)

    if args.tiny:
        model = stable_diffusion_tiny(inference_scheduler=args.scheduler)
    else:
        model = stable_diffusion_2(pretrained=False,
                                   encode_latents_in_fp16=True, fsdp=False,
                                   inference_scheduler=args.scheduler)
    params, frozen = model.init_params(jax.random.key(0), image_size=args.size)
    prompt_ids = jnp.asarray(
        model.tokenizer(["a majestic lion"] * args.batch)["input_ids"])

    gen = jax.jit(functools.partial(
        model.generate, height=args.size, width=args.size,
        guidance_scale=7.5, num_inference_steps=args.steps))

    out = gen(params, frozen, prompt_ids, seed=0)
    float(np.asarray(out).mean())  # serialize (block_until_ready may no-op)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = gen(params, frozen, prompt_ids, seed=i)
        float(np.asarray(out).mean())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    per_min = args.batch / dt * 60.0
    tag = args.scheduler.replace("+", "p")  # metric names stay [a-z0-9_]
    result = {
        "metric": f"{tag}{args.steps}_samples_per_min_{args.size}px",
        "value": round(per_min, 2),
        "unit": "samples/min",
        "sec_per_batch": round(dt, 3),
        "batch": args.batch,
        "n_devices": jax.device_count(),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
