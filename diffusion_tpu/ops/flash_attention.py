"""Pallas TPU flash attention (fwd + bwd) for the UNet's spatial attention.

TPU-native replacement for the reference's xformers memory-efficient CUDA
kernels (reference: diffusion/models/models.py:107-111; SURVEY.md §2.2 calls
this the repo's only kernel-level perf dependency). The quadratic score
matrix lives only in VMEM; HBM traffic is O(S·D) per head.

Layout: (B, S, H, D) q/k/v. The kernel grid is (B, H, num_q_blocks); each
program streams one q block against the full K/V for that (batch, head) —
K/V for a 4096-token 64-dim head is 512 KB in bf16, comfortably VMEM-resident,
so the inner loop is one big MXU matmul + VPU softmax instead of a KV-block
loop. Backward recomputes probabilities from the saved logsumexp (no S^2
residuals), with separate kernels for dQ (q-block parallel) and dK/dV
(kv-block parallel).

Non-causal only: diffusion UNet self/cross attention has no causal mask; the
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

_NEG_INF = -1e30


def _block_q(s: int) -> int:
    for bq in (512, 256, 128):
        if s % bq == 0:
            return bq
    return s


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float):
    q = q_ref[0, :, 0, :].astype(jnp.float32)          # (BQ, D)
    k = k_ref[0, :, 0, :]                              # (S, D)
    v = v_ref[0, :, 0, :]
    s = jax.lax.dot_general(q.astype(k.dtype), k,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # (BQ, S)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, :, 0, :] = (o / l).astype(o_ref.dtype)
    l_ref[0, 0, :] = (m[:, 0] + jnp.log(l[:, 0]))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float):
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :]
    lse = lse_ref[0, 0, :][:, None]                     # (BQ, 1)
    delta = delta_ref[0, 0, :][:, None]                 # (BQ, 1)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                                # (BQ, S)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                               # (BQ, S)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, :, 0, :] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float):
    q = q_ref[0, :, 0, :]                               # (S, D) full
    k = k_ref[0, :, 0, :]                               # (BK, D) block
    v = v_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :]                             # (S, D)
    lse = lse_ref[0, 0, :][None, :]                     # (1, S)
    delta = delta_ref[0, 0, :][None, :]                 # (1, S)
    # transposed scores: (BK, S) = K_blk @ Q^T
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
    dk_ref[0, :, 0, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, 0, :] = dv.astype(dv_ref.dtype)


def _fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = d ** -0.5
    bq = _block_q(sq)
    grid = (b, h, sq // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1, d), lambda bi, hi, qi: (bi, qi, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, 1, d), lambda bi, hi, qi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, 1, d), lambda bi, hi, qi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, 1, d), lambda bi, hi, qi: (bi, qi, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, hi, qi: (bi, hi, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, h, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(q, k, v)
    return out, lse


def _bwd(q, k, v, out, lse, do):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = d ** -0.5
    bq = _block_q(sq)
    bk = _block_q(skv)
    # delta_i = rowsum(dO_i * O_i), per q row; cheap XLA reduction
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)  # (B, H, Sq)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b, h, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 1, d), lambda bi, hi, qi: (bi, qi, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, 1, d), lambda bi, hi, qi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, 1, d), lambda bi, hi, qi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1, d), lambda bi, hi, qi: (bi, qi, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, hi, qi: (bi, hi, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, hi, qi: (bi, hi, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, d), lambda bi, hi, qi: (bi, qi, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, h, d), q.dtype),
        interpret=_INTERPRET,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b, h, skv // bk),
        in_specs=[
            pl.BlockSpec((1, sq, 1, d), lambda bi, hi, ki: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, d), lambda bi, hi, ki: (bi, ki, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, d), lambda bi, hi, ki: (bi, ki, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, 1, d), lambda bi, hi, ki: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda bi, hi, ki: (bi, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda bi, hi, ki: (bi, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, 1, d), lambda bi, hi, ki: (bi, ki, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, d), lambda bi, hi, ki: (bi, ki, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, skv, h, d), k.dtype),
            jax.ShapeDtypeStruct((b, skv, h, d), v.dtype),
        ],
        interpret=_INTERPRET,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Blockwise softmax(q k^T / sqrt(d)) v over (B, S, H, D) tensors."""
    out, _ = _fwd(q, k, v)
    return out


def _flash_fwd_rule(q, k, v):
    out, lse = _fwd(q, k, v)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(res, g):
    q, k, v, out, lse = res
    return _bwd(q, k, v, out, lse, g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
