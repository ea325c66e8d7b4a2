#!/usr/bin/env python
"""Localize the forward pass's non-MXU time by component knockout.

assets/step_profile_256.json says the fwd phase runs at MFU 0.27 while the
incremental backward hits 0.46 — ~33 ms of the 81 ms fwd is unexplained by
matmul/conv work at the chip's measured ceiling. The axon relay exposes no
xprof, so this measures the old-fashioned way: re-time the SAME UNet
forward with one component knocked out at a time, at the exact bench
geometry (256px latents, batch 24, bf16). Knockouts patch FUNCTION seams
(the flax module metaclass wraps `__call__` at class creation, so method
monkeypatching cannot declare params):

  full            fused Pallas GroupNorm-SiLU (ops/groupnorm.py) — default
  gn_xla          DIFFUSION_TPU_GN=xla two-pass XLA GroupNorm (pre-kernel)
  gn_affine_only  group_norm -> x*scale+bias (+silu): statistics cost bound
  attn_skip       multi_head_attention -> broadcast mean(v): flash cost
  convs_only      gn_affine_only + attn_skip: conv/dense skeleton floor

The deltas don't sum exactly (fusion boundaries move when a component
disappears) but they rank the slices and bound each one's cost.

Run ON THE CHIP: python tools/knockout_fwd.py [--res 256] [--batch 24]
Writes assets/knockout_fwd_<res>.json.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def patched(obj, name, value):
    old = getattr(obj, name)
    setattr(obj, name, value)
    try:
        yield
    finally:
        setattr(obj, name, old)


@contextlib.contextmanager
def env(name, value):
    old = os.environ.get(name)
    os.environ[name] = value
    try:
        yield
    finally:
        if old is None:
            del os.environ[name]
        else:
            os.environ[name] = old


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import default_batch_per_chip
    from diffusion_tpu.models import layers as L
    from diffusion_tpu.models.models import stable_diffusion_2
    from diffusion_tpu.ops import groupnorm as GN

    res = args.res
    lat = res // 8
    bsz = args.batch or default_batch_per_chip(res)
    gen = np.random.default_rng(0)
    sample = jnp.asarray(gen.normal(size=(bsz, lat, lat, 4)), jnp.bfloat16)
    ts = jnp.zeros((bsz,), jnp.int32) + 500
    ctx = jnp.asarray(gen.normal(size=(bsz, 77, 1024)), jnp.bfloat16)
    rng = jax.random.key(0)

    unet = stable_diffusion_2(pretrained=False, precomputed_latents=True,
                              encode_latents_in_fp16=True, fsdp=False,
                              remat=False).unet
    params = jax.jit(unet.init)(rng, sample[:1], ts[:1], ctx[:1])

    def timeit(steps=args.steps):
        f = jax.jit(lambda p: unet.apply(p, sample, ts, ctx))
        out = f(params)
        jax.block_until_ready(out)
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(params))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # --- knockout seams ------------------------------------------------

    def gn_affine_only(x, scale, bias, num_groups=32, epsilon=1e-5,
                       act=None):
        y = x.astype(jnp.float32) * scale + bias
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)

    def attn_skip(q, k, v, mask=None, **kw):
        return jnp.broadcast_to(jnp.mean(v, axis=1, keepdims=True), q.shape
                                ).astype(q.dtype)

    runs = {}
    runs["full"] = timeit()
    with env("DIFFUSION_TPU_GN", "xla"):
        runs["gn_xla"] = timeit()
    with patched(GN, "group_norm", gn_affine_only):
        runs["gn_affine_only"] = timeit()
    with patched(L, "multi_head_attention", attn_skip):
        runs["attn_skip"] = timeit()
    with patched(GN, "group_norm", gn_affine_only), \
            patched(L, "multi_head_attention", attn_skip):
        runs["convs_only"] = timeit()

    report = {"res": res, "batch": bsz,
              "device": jax.local_devices()[0].device_kind,
              "times_s": {k: round(v, 4) for k, v in runs.items()},
              "delta_ms_vs_full": {
                  k: round((runs["full"] - v) * 1e3, 1)
                  for k, v in runs.items() if k != "full"}}
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", f"knockout_fwd_{res}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
