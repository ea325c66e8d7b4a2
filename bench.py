#!/usr/bin/env python
"""Headline benchmark: SD2-base UNet training throughput @256^2, precomputed
latents — the reference's own headline metric (reference README.md:54-60;
BASELINE.md). Prints ONE JSON line.

Measures the full fused train step (fwd + bwd + AdamW + bf16 compute) on the
available chip(s) and reports img/s and img/s-per-chip against the v4-32
north-star of 2300 img/s (= 71.9 img/s/chip), BASELINE.json.
"""

from __future__ import annotations

import functools
import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffusion_tpu.models.models import stable_diffusion_2
    from diffusion_tpu.parallel.mesh import create_mesh
    from diffusion_tpu.parallel.sharding import (batch_sharding,
                                                 param_shardings)

    n_dev = jax.device_count()
    mesh = create_mesh(fsdp=1, data=n_dev)  # single-chip: pure DP degenerate
    per_chip_batch = int(float(__import__("os").environ.get(
        "BENCH_BATCH_PER_CHIP", "16")))  # = reference's per-GPU microbatch
    bsz = per_chip_batch * n_dev

    # remat: on one chip the full fp32 AdamW state (10.4 GB for the 866M
    # UNet) + grads leaves <3 GB for activations; per-block remat trades
    # ~30% recompute FLOPs for fitting the reference's 16/chip microbatch.
    # On a pod the fsdp axis shards the optimizer state and remat turns off.
    remat = __import__("os").environ.get("BENCH_REMAT", "1") == "1"
    model = stable_diffusion_2(pretrained=False, precomputed_latents=True,
                               encode_latents_in_fp16=True, fsdp=False,
                               remat=remat)
    rng = jax.random.key(0)
    p_sh = None

    abstract = jax.eval_shape(lambda r: model.init_params(r, image_size=256),
                              rng)
    p_sh = param_shardings(abstract[0], mesh, shard=False)
    params, _ = jax.jit(lambda r: model.init_params(r, image_size=256),
                        out_shardings=(p_sh, None))(rng)
    frozen = None  # precomputed-latent path never touches VAE/CLIP

    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, batch, r):
        return model.loss_fn(p, {}, batch, r)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, o, batch, r):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, r)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    b_sh = batch_sharding(mesh)
    batch = {
        "image_latents": jax.device_put(
            np.random.default_rng(0).normal(size=(bsz, 32, 32, 4))
            .astype(np.float16).astype(jnp.bfloat16), b_sh),
        "caption_latents": jax.device_put(
            np.random.default_rng(1).normal(size=(bsz, 77, 1024))
            .astype(np.float16).astype(jnp.bfloat16), b_sh),
    }

    # warmup / compile
    params, opt_state, loss = train_step(params, opt_state, batch, rng)
    jax.block_until_ready(loss)

    steps = 10
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jax.random.fold_in(rng, i))
        # serialize dispatches: without backpressure the async queue stacks
        # per-step transients and can exhaust HBM through the runtime
        jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    img_per_sec = bsz * steps / dt
    per_chip = img_per_sec / n_dev
    baseline_per_chip = 2300.0 / 32.0  # v4-32 north-star, BASELINE.json
    print(json.dumps({
        "metric": "unet_train_throughput_256px_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / baseline_per_chip, 4),
        "total_img_per_sec": round(img_per_sec, 2),
        "n_devices": n_dev,
        "batch_per_chip": per_chip_batch,
        "loss": float(np.asarray(loss)),
    }))


if __name__ == "__main__":
    main()
