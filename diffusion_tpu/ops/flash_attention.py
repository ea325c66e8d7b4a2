"""Pallas TPU flash attention (fwd + bwd) for the UNet's spatial attention.

TPU-native replacement for the reference's xformers memory-efficient CUDA
kernels (reference: diffusion/models/models.py:107-111; SURVEY.md §2.2 calls
this the repo's only kernel-level perf dependency). The quadratic score
matrix lives only in VMEM; HBM traffic is O(S*D) per head.

Layout: the public API takes (B, S, H, D); internally heads fold into batch
-> (B*H, S, D) so every BlockSpec tile is (sublane, lane) = (seq, head_dim),
which satisfies the TPU (8, 128) tiling rules (head_dim 64 = full array dim).
The kernel grid is (B*H, num_q_blocks); each program streams one q block
against the full K/V for its head — K/V for a 4096-token 64-dim head is
512 KB in bf16, comfortably VMEM-resident, so the inner loop is one big MXU
matmul + VPU softmax instead of a KV-block loop. Backward recomputes
probabilities from the saved logsumexp (no S^2 residuals), with separate
kernels for dQ (q-block parallel) and dK/dV (kv-block parallel).

Non-causal only: diffusion UNet self/cross attention has no mask; the
77-token text encoder stays on XLA attention (ops/attention.py).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_INTERPRET = os.environ.get("DIFFUSION_TPU_PALLAS_INTERPRET", "0") == "1"


def _block_q(s: int) -> int:
    for bq in (512, 256, 128):
        if s % bq == 0:
            return bq
    return s


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float):
    q = q_ref[0]                                       # (BQ, D)
    k = k_ref[0]                                       # (S, D)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    l_ref[0, 0, :] = (m[:, 0] + jnp.log(l[:, 0]))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, :][:, None]                     # (BQ, 1)
    delta = delta_ref[0, 0, :][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                                # (BQ, S)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float):
    q = q_ref[0]                                        # (S, D) full
    k = k_ref[0]                                        # (BK, D) block
    v = v_ref[0]
    do = do_ref[0]                                      # (S, D)
    lse = lse_ref[0, 0, :][None, :]                     # (1, S)
    delta = delta_ref[0, 0, :][None, :]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    pt = jnp.exp(st - lse)                              # (BK, S)
    dv = jax.lax.dot_general(pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (BK, S)
    dst = pt * (dpt - delta)
    dk = jax.lax.dot_general(dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B*H, S, D)"""
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unfold(x: jnp.ndarray, b: int, h: int) -> jnp.ndarray:
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _fwd(qf, kf, vf) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bh, sq, d = qf.shape
    skv = kf.shape[1]
    scale = d ** -0.5
    bq = _block_q(sq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(qf, kf, vf)
    return out, lse


def _bwd(qf, kf, vf, out, lse, do):
    bh, sq, d = qf.shape
    skv = kf.shape[1]
    scale = d ** -0.5
    bq = _block_q(sq)
    bk = _block_q(skv)
    # delta_i = rowsum(dO_i * O_i); cheap XLA reduction, shape (BH, 1, Sq)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(bh, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qf.dtype),
        interpret=_INTERPRET,
    )(qf, kf, vf, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(bh, skv // bk),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skv, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, skv, d), vf.dtype),
        ],
        interpret=_INTERPRET,
    )(qf, kf, vf, do, lse, delta)
    return dq, dk, dv


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Blockwise softmax(q k^T / sqrt(d)) v over (B, S, H, D) tensors."""
    b, _, h, _ = q.shape
    out, _ = _fwd(_fold(q), _fold(k), _fold(v))
    return _unfold(out, b, h)


def _flash_fwd_rule(q, k, v):
    b, _, h, _ = q.shape
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    out, lse = _fwd(qf, kf, vf)
    return _unfold(out, b, h), (qf, kf, vf, out, lse, b, h)


def _flash_bwd_rule(res, g):
    qf, kf, vf, out, lse, b, h = res
    dq, dk, dv = _bwd(qf, kf, vf, out, lse, _fold(g))
    return _unfold(dq, b, h), _unfold(dk, b, h), _unfold(dv, b, h)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
