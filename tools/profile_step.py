#!/usr/bin/env python
"""Phase profile of the 256px SD2 train step on the real chip: where does
the non-MXU time go?

BENCH_r04 carried step MFU 0.319 against the chip's measured 0.61 matmul
ceiling with no artifact saying where the rest of the time sits. The axon
relay exposes no xprof, so this tool splits the step the way a trace
would, by TIMING SUB-PROGRAMS (each its own jit, serialized by a scalar
fetch, median of N):

  fwd        — loss only (the UNet forward)
  fwd+bwd    — value_and_grad (adds the backward)
  step       — fwd+bwd + global-norm clip + AdamW(bf16 mu) + param update
  opt        — the optimizer alone on captured grads (HBM-bound: reads
               params+grads+mu+nu, writes params+mu+nu)

and prices each phase's MXU work from the traced jaxpr (dot / conv / flash
split, utils/flops.py), giving per-phase MFU and an HBM-traffic estimate
for the optimizer. Writes assets/step_profile_<res>.json.

Run ON THE CHIP: python tools/profile_step.py [--res 256] [--batch 24]
(defaults mirror bench.py's measured-fastest single-chip config).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=0, help="0 = bench default")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", default=None, choices=[None, "0", "1"])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import bench_remat, default_batch_per_chip
    from diffusion_tpu.models.models import stable_diffusion_2
    from diffusion_tpu.utils.flops import (device_peak_flops,
                                           jaxpr_flops_by_class)

    res = args.res
    lat = res // 8
    bsz = args.batch or default_batch_per_chip(res)
    remat = bench_remat(res) if args.remat is None else args.remat == "1"

    model = stable_diffusion_2(pretrained=False, precomputed_latents=True,
                               encode_latents_in_fp16=True, fsdp=False,
                               remat=remat)
    ctx = model.unet.config.cross_attention_dim
    rng = jax.random.key(0)

    def init_unet(r):
        return model.unet.init(r, jnp.zeros((1, lat, lat, 4)),
                               jnp.zeros((1,), jnp.int32),
                               jnp.zeros((1, 77, ctx)))

    params = jax.jit(init_unet)(rng)
    tx = optax.adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    gen = np.random.default_rng(0)
    batch = {
        "image_latents": jnp.asarray(gen.normal(size=(bsz, lat, lat, 4))
                                     .astype(np.float16), jnp.bfloat16),
        "caption_latents": jnp.asarray(gen.normal(size=(bsz, 77, ctx))
                                       .astype(np.float16), jnp.bfloat16),
    }

    def loss_fn(p, b, r):
        return model.loss_fn(p, {}, b, r)

    def grad_fn(p, b, r):
        return jax.value_and_grad(loss_fn)(p, b, r)

    def step_fn(p, o, b, r):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, r)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    def opt_fn(p, o, grads):
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o

    def timeit(f, fetch, *fargs, steps=args.steps, reassign=None):
        """(median time, final args). `reassign(out) -> new fargs-prefix`
        for donated phases (the returned state feeds the next call, as the
        bench/trainer do — donation keeps HBM flat)."""
        fargs = list(fargs)
        out = f(*fargs)
        float(np.asarray(fetch(out)))  # compile + sync
        if reassign:
            fargs[:len(reassign(out))] = reassign(out)
        out = None  # free the result tree BEFORE the next dispatch — the
        # old grads (3.5 GB) alive alongside the new call's OOMs the chip
        ts = []
        for _ in range(steps):
            t0 = time.perf_counter()
            out = f(*fargs)
            float(np.asarray(fetch(out)))
            ts.append(time.perf_counter() - t0)
            if reassign:
                fargs[:len(reassign(out))] = reassign(out)
            out = None
        return float(np.median(ts)), fargs

    report = {"res": res, "batch": bsz, "remat": remat,
              "device": jax.local_devices()[0].device_kind}

    # MXU-work composition per phase first (host-only tracing — the arrays
    # get donated away during the timed phases below). Traced jaxprs
    # include remat recompute, i.e. EXECUTED flops.
    opt_abs = jax.eval_shape(tx.init, params)
    fl_fwd = jaxpr_flops_by_class(jax.make_jaxpr(loss_fn)(params, batch, rng))
    fl_bwd = jaxpr_flops_by_class(jax.make_jaxpr(grad_fn)(params, batch, rng))
    fl_step = jaxpr_flops_by_class(
        jax.make_jaxpr(step_fn)(params, opt_abs, batch, rng))
    peak = device_peak_flops() or 0.0
    n_params = sum(x.size for x in jax.tree.leaves(params))

    # phase order bounds residency on the 16 GB chip: fwd/bwd run before
    # the optimizer state exists; the fused step and opt-only phases donate
    # (params, opt) exactly like the production step (bench.py/trainer)
    t_fwd, _ = timeit(jax.jit(loss_fn), lambda o: o, params, batch, rng)
    t_bwd, _ = timeit(jax.jit(grad_fn), lambda o: o[0], params, batch, rng)
    opt_state = jax.jit(tx.init)(params)
    t_step, fin = timeit(jax.jit(step_fn, donate_argnums=(0, 1)),
                         lambda o: o[2], params, opt_state, batch, rng,
                         reassign=lambda o: [o[0], o[1]])
    params, opt_state = fin[0], fin[1]  # live post-donation state
    del fin
    # grads for the opt-only phase from a 4-row batch: grad SHAPES are
    # batch-independent, and the full-batch backward no longer fits next
    # to the live optimizer state (params 3.5 + opt 5.25 + grads 3.5 +
    # full activations ~3.5 = the whole 15.75 GB)
    small = {k: v[:4] for k, v in batch.items()}
    loss_g, grads = jax.jit(grad_fn)(params, small, rng)
    # drain the grad program fully before the opt dispatch: the relay's
    # async queue otherwise overlaps its workspace with the opt compile
    float(np.asarray(loss_g))
    float(np.asarray(jax.tree.leaves(grads)[0].ravel()[0]))
    try:
        t_opt, _ = timeit(jax.jit(opt_fn, donate_argnums=(0, 1)),
                          lambda o: jax.tree.leaves(o[0])[0].ravel()[0],
                          params, opt_state, grads,
                          reassign=lambda o: [o[0], o[1]])
    except Exception as exc:  # noqa: BLE001 — keep the 3 main phases
        sys.stderr.write(f"opt-only phase failed: {exc}\n")
        t_opt = 0.0

    def phase(name, t, fl):
        tot = sum(fl.values())
        report[name] = {
            "time_s": round(t, 4),
            "tflops": round(tot / 1e12, 2),
            "flops_split": {k: round(v / 1e12, 2) for k, v in fl.items()},
            "mfu": round(tot / t / peak, 4) if peak and t else None,
        }

    phase("fwd", t_fwd, fl_fwd)
    phase("bwd_incremental", t_bwd - t_fwd,
          {k: fl_bwd[k] - fl_fwd[k] for k in fl_bwd})
    phase("fwd_bwd", t_bwd, fl_bwd)
    phase("full_step", t_step, fl_step)
    # optimizer HBM traffic: read p(f32)+g(f32)+mu(bf16)+nu(f32),
    # write p+mu+nu — 18 bytes/param read + 10 written
    report["optimizer"] = {
        "time_s": round(t_opt, 4),
        "hbm_gb_moved": round(n_params * 28 / 2 ** 30, 2),
        "implied_hbm_gbps": round(n_params * 28 / 2 ** 30 / t_opt, 1)
        if t_opt else None,
        "overlap_gap_s": round(t_step - t_bwd, 4),
    }
    report["params_m"] = round(n_params / 1e6, 1)
    report["img_per_s_serialized"] = round(bsz / t_step, 1)
    report["dispatch_overhead_s"] = round(
        t_step - (t_bwd + max(t_opt - 0.0, 0.0)), 4)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", f"step_profile_{res}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
