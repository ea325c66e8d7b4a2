"""Fused GroupNorm(+SiLU) Pallas kernel.

The reference leans on torch's cudnn GroupNorm + eager SiLU
(`/root/reference/diffusion/models/layers.py` via diffusers' ResnetBlock2D
GroupNorm/F.silu); on TPU the XLA lowering of the same math is a two-pass
program per call — one HBM read for the mean/var reduction, a second read
fused with normalize-affine-act, plus the output write. The BASELINE.json
north star names "GroupNorm-SiLU-conv blocks compile to fused Pallas
kernels": this kernel does the whole thing in ONE HBM read and ONE write by
keeping the per-image slab resident in VMEM — stats, normalize, affine, and
SiLU all happen on-chip before anything goes back to HBM.

Design (NHWC, the package-wide layout):
  * caller folds (B, H, W, C) -> (B, L, C); grid = (B,) so each grid step
    owns one image slab (L, C) in VMEM. SD2 slabs are small — at 256px the
    largest is 1024x320 (0.6 MB bf16) and at 512px 4096x320 (2.6 MB) — far
    under the ~16 MB VMEM budget; `_pallas_usable` falls back to the XLA
    path for slabs that would not fit (1024px pixel-space models).
  * statistics are fp32 regardless of compute dtype (the package's
    low-precision-norm policy, models/layers.py GroupNorm): per-CHANNEL
    sum/sumsq reduce over the sublane (row) axis first — clean VPU
    reductions — then the tiny (C -> G) group fold and (G -> C) broadcast
    run as one-hot matmuls (Mosaic has no ragged cross-lane reshape for
    C=320, but a (1,C)x(C,G) dot is native).
  * backward is the standard analytic GN(+SiLU) VJP as a second kernel:
    recomputes xhat from the saved input + (mean, rstd) per group (the
    slab is re-read once; dscale/dbias come out as per-image partials that
    XLA sums over batch — a (B, C) reduction, microscopic next to the dx
    slab write).

Numerics match the XLA path to fp32-reduction tolerance (same fp32 stats,
var as E[x^2]-E[x]^2 over the same element count); tests/test_groupnorm.py
pins kernel-vs-XLA forward AND gradients in interpret mode on CPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

from diffusion_tpu.parallel.sharding import constrain_batch

__all__ = ["group_norm"]


def _interpret() -> bool:
    # read per call, not at import: tests toggle this after import
    return os.environ.get("DIFFUSION_TPU_PALLAS_INTERPRET", "0") == "1"


# largest per-image slab the kernel will take on: input slab + fp32 working
# copy resident at once; beyond this the XLA path wins anyway because the
# two-pass program streams instead of paging VMEM
_VMEM_SLAB_BYTES = 8 * 2 ** 20


def _pallas_usable(l: int, c: int, groups: int) -> bool:
    # escape hatch, same shape as DIFFUSION_TPU_ATTN_BACKEND: sweeps and
    # the knockout profiler A/B the kernel against the XLA program
    if os.environ.get("DIFFUSION_TPU_GN", "") == "xla":
        return False
    if c % groups:
        return False
    if l * c * 4 * 2 > _VMEM_SLAB_BYTES:
        return False
    return jax.default_backend() == "tpu" or _interpret()


def _group_maps(c: int, groups: int):
    """(C,G) one-hot fold matrix and its transpose, built in-kernel.

    fold[ch, g] = 1 if ch belongs to group g. `sums @ fold` folds
    per-channel stats to per-group; `stats_g @ fold.T` broadcasts group
    stats back to channels. Tiny MXU work, avoids ragged lane reshapes.
    """
    cg = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // cg == gr).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel: one grid step = one (L, C) image slab
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, rstd_ref, *,
                groups: int, eps: float, act: bool):
    x = x_ref[0].astype(jnp.float32)                     # (L, C)
    l, c = x.shape
    fold = _group_maps(c, groups)                        # (C, G)
    s1 = jnp.sum(x, axis=0, keepdims=True)               # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    n = float(l * (c // groups))
    mean_g = jnp.dot(s1, fold, preferred_element_type=jnp.float32) / n
    ex2_g = jnp.dot(s2, fold, preferred_element_type=jnp.float32) / n
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)                  # (1, G)
    mean_ref[0] = mean_g
    rstd_ref[0] = rstd_g
    mean_c = jnp.dot(mean_g, fold.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, fold.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c * scale_ref[...] + bias_ref[...]
    if act:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _fwd(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
         groups: int, eps: float, act: bool):
    b, l, c = x.shape
    kern = functools.partial(_fwd_kernel, groups=groups, eps=eps, act=act)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            # (b, 1, G) keeps the block's trailing dims Mosaic-legal (the
            # second-to-last block dim must divide 8 or equal the array's)
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, scale, bias)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, dscale_ref, dbias_ref, *,
                groups: int, act: bool):
    x = x_ref[0].astype(jnp.float32)                     # (L, C)
    l, c = x.shape
    fold = _group_maps(c, groups)                        # (C, G)
    scale = scale_ref[...]                               # (1, C)
    mean_c = jnp.dot(mean_ref[0], fold.T,
                     preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd_ref[0], fold.T,
                     preferred_element_type=jnp.float32)
    xhat = (x - mean_c) * rstd_c
    dz = g_ref[0].astype(jnp.float32)
    if act:
        y = xhat * scale + bias_ref[...]
        s = jax.nn.sigmoid(y)
        dz = dz * (s * (1.0 + y * (1.0 - s)))            # d silu / dy
    # affine grads (per-image partials; batch-summed outside)
    dscale_ref[0] = jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbias_ref[0] = jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * scale
    n = float(l * (c // groups))
    m1_c = jnp.sum(dxhat, axis=0, keepdims=True)         # (1, C)
    m2_c = jnp.sum(dxhat * xhat, axis=0, keepdims=True)
    m1_g = jnp.dot(m1_c, fold, preferred_element_type=jnp.float32) / n
    m2_g = jnp.dot(m2_c, fold, preferred_element_type=jnp.float32) / n
    m1 = jnp.dot(m1_g, fold.T, preferred_element_type=jnp.float32)
    m2 = jnp.dot(m2_g, fold.T, preferred_element_type=jnp.float32)
    dx = rstd_c * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd(x, scale, bias, mean, rstd, g, groups: int, act: bool):
    b, l, c = x.shape
    kern = functools.partial(_bwd_kernel, groups=groups, act=act)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, scale, bias, mean, rstd, g)


# ---------------------------------------------------------------------------
# XLA fallback (identical math; the pre-kernel GroupNorm body)
# ---------------------------------------------------------------------------


def _xla_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    groups: int, eps: float, act: bool) -> jnp.ndarray:
    c = x.shape[-1]
    orig = x.dtype
    # anchor both sides of the group reshapes: without explicit specs SPMD
    # propagation wanders (fwd AND transpose/bwd) — see models/layers.py
    xf = constrain_batch(x.astype(jnp.float32))
    xg = constrain_batch(xf.reshape(*xf.shape[:-1], groups, c // groups))
    axes = tuple(range(1, xf.ndim - 1)) + (xf.ndim,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = constrain_batch(xg.reshape(*xf.shape[:-1], c))
    y = y * scale + bias
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig)


# ---------------------------------------------------------------------------
# public entry: custom_vjp over the folded (B, L, C) view
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_flat(x, scale, bias, groups: int, eps: float, act: bool):
    out, _, _ = _fwd(x, scale, bias, groups, eps, act)
    return out


def _flat_fwd(x, scale, bias, groups, eps, act):
    out, mean, rstd = _fwd(x, scale, bias, groups, eps, act)
    # named for remat policies: not a lax.dot, so under the UNet's
    # dots-saveable policy the slab stats would otherwise recompute
    mean = checkpoint_name(mean, "gn_stats")
    rstd = checkpoint_name(rstd, "gn_stats")
    return out, (x, scale, bias, mean, rstd)


def _flat_bwd(groups, eps, act, res, g):
    x, scale, bias, mean, rstd = res
    dx, dscale_p, dbias_p = _bwd(x, scale, bias, mean, rstd, g, groups, act)
    # cotangents must match the (1, C) primal param shapes
    return (dx, jnp.sum(dscale_p, axis=0, keepdims=True),
            jnp.sum(dbias_p, axis=0, keepdims=True))


_group_norm_flat.defvjp(_flat_fwd, _flat_bwd)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, epsilon: float = 1e-5,
               act: Optional[str] = None) -> jnp.ndarray:
    """GroupNorm with fp32 statistics, optionally fused with SiLU.

    `x` is NHWC (or any (..., C)); `scale`/`bias` are fp32 (C,). On TPU,
    slabs that fit VMEM run as a single-read/single-write Pallas kernel;
    everywhere else (CPU tests, ragged channel counts, giant pixel-space
    slabs) the math runs as the equivalent XLA program.
    """
    if act not in (None, "silu"):
        raise ValueError(f"unsupported activation: {act!r}")
    c = x.shape[-1]
    lead = x.shape[:-1]
    l = 1
    for d in lead[1:]:
        l *= d
    if x.ndim < 3 or not _pallas_usable(l, c, num_groups):
        return _xla_group_norm(x, scale, bias, num_groups, epsilon,
                               act == "silu")
    flat = x.reshape(lead[0], l, c)
    out = _group_norm_flat(flat, scale.reshape(1, c), bias.reshape(1, c),
                           num_groups, float(epsilon), act == "silu")
    return constrain_batch(out.reshape(*lead, c))
