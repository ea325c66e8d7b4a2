#!/usr/bin/env python
"""Full-geometry SPMD audit: AOT-compile (never execute) the REAL SD2-base
train step at production shapes over an 8-virtual-device CPU mesh and check
the partitioned program is clean.

What the toy-geometry pins (tests/test_sharding.py) can't see: on the real
866M UNet at 256px the GSPMD partitioner may fall back to replicate-then-
reshard ("involuntary full rematerialization") or insert unexpected
collectives — exactly where multi-chip surprises live. This tool:

  1. abstract-inits the full SD2-base parameter tree (jax.eval_shape — no
     3.5 GB of real weights needed),
  2. builds the production train step (value_and_grad -> global-norm clip ->
     AdamW with bf16 first moments -> EMA update, the same component stack
     train/trainer.py fuses),
  3. jit-lowers and compiles it for each mesh family the yamls ship —
     dcn x fsdp x data (SD-2-base-256.yaml), + sp ring attention
     (SD-2-base-1024-sp.yaml), + tp Megatron (SD-2-base-512-tp.yaml),
  4. parses the post-partitioning optimized HLO for collective ops
     (all-reduce / all-gather / reduce-scatter / collective-permute /
     all-to-all), counting ops and summing payload bytes per step,
  5. scans the compiler's stderr for the GSPMD rematerialization warning
     and FAILS (exit 1) if it fired,
  6. writes the machine-readable report to assets/spmd_audit.json.

Run: python tools/audit_spmd.py [--res 256] [--batch-per-chip 8]
     [--mesh fsdp|sp|tp|all]
(CPU-only; takes minutes per mesh on one core — the XLA pipeline really
runs. Re-run after any sharding/layers change; tests/test_sharding.py keeps
the fast toy-geometry version in CI.)

Reference contract this must equal: torch-FSDP SHARD_GRAD_OP on the UNet
(reference yamls/hydra-yamls/SD-2-base-256.yaml:95-96,
diffusion/models/stable_diffusion.py:148-152).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must precede the jax import: force the virtual CPU mesh (the axon TPU
# plugin would otherwise claim the backend and offer one real chip)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the axon TPU plugin registers at interpreter start (sitecustomize); env
# alone doesn't displace it — force the virtual CPU mesh the way
# tests/conftest.py does
if jax.device_count() < 8:
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends
        clear_backends()
    except Exception:  # noqa: BLE001
        pass
jax.config.update("jax_threefry_partitionable", True)
assert jax.device_count() >= 8, jax.devices()

REMAT_WARNING = "full rematerialization"
_COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


@contextlib.contextmanager
def capture_fd_stderr(path: str):
    """Capture C++-level stderr (GSPMD warnings bypass sys.stderr)."""
    fd = sys.stderr.fileno()
    saved = os.dup(fd)
    with open(path, "w") as f:
        os.dup2(f.fileno(), fd)
        try:
            yield
        finally:
            sys.stderr.flush()
            os.dup2(saved, fd)
            os.close(saved)


def collect_collectives(hlo_text: str) -> dict:
    """Count collective ops and their payload bytes from optimized HLO.
    Handles tuple-shaped variadic collectives ("%all-reduce.3 = (f32[16],
    f32[16,64], ...) all-reduce(") by summing every result shape."""
    out: dict = {}
    for line in hlo_text.splitlines():
        eq = line.find(" = ")
        if eq < 0:
            continue
        hit = None
        for op in _COLLECTIVE_OPS:
            p = line.find(f" {op}(", eq)
            if p < 0:
                p = line.find(f" {op}-start(", eq)
            if p >= 0 and (hit is None or p < hit[1]):
                hit = (op, p)
        if hit is None:
            continue
        op, p = hit
        byt = 0
        for m in _SHAPE_RE.finditer(line[eq:p]):
            elems = 1
            for d in m.group(2).split(","):
                if d.strip():
                    elems *= int(d)
            byt += elems * _DTYPE_BYTES.get(m.group(1), 4)
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += byt
    return out


def build_step(model, mesh, batch_per_chip: int, res: int):
    """The production step at abstract shapes: returns (jitted_fn, args)."""
    import optax

    from diffusion_tpu.parallel.sharding import (activation_mesh,
                                                 batch_sharding,
                                                 model_tp_head_dim,
                                                 param_shardings)
    from diffusion_tpu.ops.attention import sequence_parallel, tensor_parallel

    lat = res // 8
    ctx = model.unet.config.cross_attention_dim
    rows = 1
    for a, s in mesh.shape.items():
        if a not in ("sp", "tp"):
            rows *= s
    bsz = batch_per_chip * rows

    rng = jax.random.key(0)
    abstract = jax.eval_shape(
        lambda r: model.init_params(r, image_size=res), rng)
    p_sh = param_shardings(abstract[0], mesh, shard=True,
                           tp_head_dim=model_tp_head_dim(model))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16))
    opt_abstract = jax.eval_shape(tx.init, abstract[0])
    o_sh = param_shardings(opt_abstract, mesh, shard=True,
                           tp_head_dim=model_tp_head_dim(model))
    b_sh = batch_sharding(mesh)

    def sds(tree, sh):
        return jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            tree, sh)

    params = sds(abstract[0], p_sh)
    opt_state = sds(opt_abstract, o_sh)
    ema = params
    batch_abs = {
        "image_latents": jax.ShapeDtypeStruct((bsz, lat, lat, 4),
                                              jnp.bfloat16, sharding=b_sh),
        "caption_latents": jax.ShapeDtypeStruct((bsz, 77, ctx),
                                                jnp.bfloat16, sharding=b_sh),
    }

    sp_ctx = (sequence_parallel(mesh, min_seq=256)
              if mesh.shape.get("sp", 1) > 1 else contextlib.nullcontext())
    tp_ctx = (tensor_parallel(mesh)
              if mesh.shape.get("tp", 1) > 1 else contextlib.nullcontext())

    def step(p, o, e, batch, r):
        loss, grads = jax.value_and_grad(model.loss_fn)(p, {}, batch, r)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        e = jax.tree.map(lambda ev, pv: ev * 0.9999 + pv * 0.0001, e, p)
        return p, o, e, loss

    fn = jax.jit(step, donate_argnums=(0, 1, 2),
                 out_shardings=(p_sh, o_sh, p_sh, None))
    with activation_mesh(mesh), sp_ctx, tp_ctx:
        lowered = fn.lower(params, opt_state, ema, batch_abs, rng)
    return lowered


def audit_mesh(name: str, mesh, model, batch_per_chip: int, res: int) -> dict:
    t0 = time.time()
    lowered = build_step(model, mesh, batch_per_chip, res)
    errlog = os.path.join(tempfile.gettempdir(), f"spmd_audit_{name}.stderr")
    with capture_fd_stderr(errlog):
        compiled = lowered.compile()
    warnings = open(errlog, errors="replace").read()
    remat_hits = warnings.lower().count(REMAT_WARNING)
    hlo = compiled.as_text()
    colls = collect_collectives(hlo)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k] = int(v)
    except Exception:  # noqa: BLE001 — backend-optional API
        pass
    report = {
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "batch_per_chip": batch_per_chip,
        "res": res,
        "collectives": colls,
        "collective_bytes_total": sum(c["bytes"] for c in colls.values()),
        "involuntary_rematerialization_warnings": remat_hits,
        "compile_s": round(time.time() - t0, 1),
        "memory_analysis": mem,
    }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--mesh", default="all",
                    choices=["fsdp", "sp", "tp", "all"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "spmd_audit.json"))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-geometry smoke of the tool itself")
    args = ap.parse_args()

    from diffusion_tpu.parallel.mesh import create_mesh

    if args.tiny:
        from tests.common import tiny_stable_diffusion
        model = tiny_stable_diffusion(precomputed_latents=True)
    else:
        from diffusion_tpu.models.models import stable_diffusion_2
        model = stable_diffusion_2(pretrained=False, precomputed_latents=True,
                                   encode_latents_in_fp16=True, fsdp=True,
                                   remat=True)

    meshes = {
        # the SD-2-base-256.yaml production family (ZeRO-ish param shard)
        "fsdp": create_mesh(dcn=2, fsdp=2, data=2),
        # + ring attention (SD-2-base-1024-sp.yaml regime)
        "sp": create_mesh(dcn=1, fsdp=2, data=2, sp=2),
        # + Megatron heads/GEGLU (SD-2-base-512-tp.yaml regime)
        "tp": create_mesh(dcn=1, fsdp=2, data=2, tp=2),
    }
    if args.mesh != "all":
        meshes = {args.mesh: meshes[args.mesh]}

    reports = {}
    clean = True
    for name, mesh in meshes.items():
        print(f"[audit] {name}: compiling res={args.res} "
              f"batch/chip={args.batch_per_chip} "
              f"mesh={dict(mesh.shape)} ...", flush=True)
        rep = audit_mesh(name, mesh, model, args.batch_per_chip, args.res)
        reports[name] = rep
        ok = rep["involuntary_rematerialization_warnings"] == 0
        clean &= ok
        print(f"[audit] {name}: {'CLEAN' if ok else 'REMAT WARNINGS'} — "
              f"collectives: "
              + json.dumps(rep["collectives"])
              + f" ({rep['collective_bytes_total'] / 2 ** 20:.1f} MiB/step, "
                f"compile {rep['compile_s']}s)", flush=True)

    out = {
        "tool": "tools/audit_spmd.py",
        "model": "tiny" if args.tiny else "stable_diffusion_2 (866M UNet)",
        "n_devices": jax.device_count(),
        "reports": reports,
        "clean": clean,
    }
    if not args.tiny:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[audit] wrote {args.out}")
    print(json.dumps({"spmd_audit_clean": clean}))
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
