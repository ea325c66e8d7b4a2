"""Pallas TPU flash attention (fwd + bwd) for the UNet's spatial attention.

TPU-native replacement for the reference's xformers memory-efficient CUDA
kernels (reference: diffusion/models/models.py:107-111; SURVEY.md §2.2 calls
this the repo's only kernel-level perf dependency). The quadratic score
matrix lives only in VMEM; HBM traffic is O(S*D) per head.

Layout: the public API takes (B, S, H, D); internally heads fold into batch
-> (B*H, S, D) so every BlockSpec tile is (sublane, lane) = (seq, head_dim),
which satisfies the TPU (8, 128) tiling rules (head_dim 64 = full array dim).

True blockwise streaming: the grid is (B*H, q_blocks, kv_blocks) with the KV
axis minormost, and the forward keeps a running online-softmax state
(max, normalizer, unnormalized output) in VMEM scratch across KV iterations —
K/V tiles stream from HBM one block at a time, so sequence length is bounded
by HBM, not VMEM (16k+ tokens). The backward recomputes probabilities from
the saved logsumexp (no S^2 residuals): dQ streams KV blocks accumulating in
scratch; dK/dV streams Q blocks the same way.

Non-causal only: diffusion UNet self/cross attention has no mask; the
77-token text encoder stays on XLA attention (ops/attention.py). Sequences
that do not tile to 128 fall back to XLA attention inside `flash_attention`
itself (ragged-length guard).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_with_lse",
           "flash_attention_bwd_with_lse"]

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _interpret() -> bool:
    # read per-call, not at import: tests toggle this after import
    return os.environ.get("DIFFUSION_TPU_PALLAS_INTERPRET", "0") == "1"


def _block(s: int, cap: int = 512) -> int:
    """Largest 128-multiple block <= cap that divides s (0 if s is ragged)."""
    for b in (4096, 2048, 1024, 512, 256, 128):
        if b <= cap and s % b == 0:
            return b
    return 0


# tuning knobs (bench sweeps); defaults are the measured-fastest settings.
# Read per call like _interpret() — sweeps set these AFTER import (any
# transitive import would otherwise freeze the caps at their first values
# and the sweep would silently measure one configuration n times)


def _block_q(s: int) -> int:
    # measured on v5e @512px (4096 spatial tokens): bq=1024 beats 512
    # (24.4 vs 23.8 img/s train step); at 1024 tokens bq=512 was the
    # round-1 winner, so the cap widens only for long sequences
    bq_cap = int(os.environ.get("DIFFUSION_TPU_FLASH_BQ", "0"))  # 0 = auto
    cap = bq_cap if bq_cap else (1024 if s >= 4096 else 512)
    return _block(s, cap=cap)


def _block_kv(s: int) -> int:
    # KV tiles can run bigger than Q tiles: k/v blocks are (bk, 64) bf16 and
    # a 1024-row tile keeps the whole 256px self-attention KV in one grid
    # step (zero online-softmax rescale traffic) while 512px+ still streams
    return _block(s, cap=int(os.environ.get("DIFFUSION_TPU_FLASH_BK",
                                            "1024")))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref,
                o_acc, m_acc, l_acc, *, scale: float, kv_steps: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    q = q_ref[0]                                        # (BQ, D)
    k = k_ref[0]                                        # (BK, D)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_acc[:, :1]                               # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                              # (BQ, BK)
    l_new = l_acc[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_acc[...] = o_acc[...] * alpha + pv
    m_acc[...] = jnp.broadcast_to(m_new, m_acc.shape)
    l_acc[...] = jnp.broadcast_to(l_new, l_acc.shape)

    @pl.when(ki == kv_steps - 1)
    def _finish():
        o_ref[0] = (o_acc[...] / l_acc[:, :1]).astype(o_ref.dtype)
        l_ref[0, 0, :] = m_acc[:, 0] + jnp.log(l_acc[:, 0])


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale: float, kv_steps: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]                                        # (BQ, D)
    k = k_ref[0]                                        # (BK, D)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, :][:, None]                     # (BQ, 1)
    delta = delta_ref[0, 0, :][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                                # (BQ, BK)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ki == kv_steps - 1)
    def _finish():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale: float, q_steps: int):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                                        # (BQ, D) block
    k = k_ref[0]                                        # (BK, D) block
    v = v_ref[0]
    do = do_ref[0]                                      # (BQ, D)
    lse = lse_ref[0, 0, :][None, :]                     # (1, BQ)
    delta = delta_ref[0, 0, :][None, :]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    pt = jnp.exp(st - lse)                              # (BK, BQ)
    dv_acc[...] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (BK, BQ)
    dst = pt * (dpt - delta)
    dk_acc[...] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(qi == q_steps - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B*H, S, D)"""
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unfold(x: jnp.ndarray, b: int, h: int) -> jnp.ndarray:
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _struct(shape, dtype, vma):
    """ShapeDtypeStruct that typechecks inside shard_map (vma = the manual
    mesh axes the output varies over, e.g. ring attention's ring axis)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _fwd(qf, kf, vf, vma=()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bh, sq, d = qf.shape
    skv = kf.shape[1]
    scale = d ** -0.5
    bq, bk = _block_q(sq), _block_kv(skv)
    kv_steps = skv // bk
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_steps=kv_steps),
        grid=(bh, sq // bq, kv_steps),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, qi, ki: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _struct((bh, sq, d), qf.dtype, vma),
            _struct((bh, 1, sq), jnp.float32, vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),      # o_acc
            pltpu.VMEM((bq, 128), jnp.float32),    # running max
            pltpu.VMEM((bq, 128), jnp.float32),    # running normalizer
        ],
        interpret=_interpret(),
    )(qf, kf, vf)
    return out, lse


def _bwd(qf, kf, vf, out, lse, do, vma=(), delta=None):
    bh, sq, d = qf.shape
    skv = kf.shape[1]
    scale = d ** -0.5
    bq, bk = _block_q(sq), _block_kv(skv)
    if delta is None:
        # delta_i = rowsum(dO_i * O_i); cheap XLA reduction, (BH, 1, Sq)
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)[:, None, :]

    kv_steps = skv // bk
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_steps=kv_steps),
        grid=(bh, sq // bq, kv_steps),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, qi, ki: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, qi, ki: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_struct((bh, sq, d), qf.dtype, vma),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=_interpret(),
    )(qf, kf, vf, do, lse, delta)

    q_steps = sq // bq
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_steps=q_steps),
        grid=(bh, skv // bk, q_steps),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, ki, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bi, ki, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, ki, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bi, ki, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _struct((bh, skv, d), kf.dtype, vma),
            _struct((bh, skv, d), vf.dtype, vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),      # dk_acc
            pltpu.VMEM((bk, d), jnp.float32),      # dv_acc
        ],
        interpret=_interpret(),
    )(qf, kf, vf, do, lse, delta)
    return dq, dk, dv


def _tiles_ok(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    # last dim: the kernel is only qualified for 64-multiple head dims
    # (lane-width tiles; same bound _flash_eligible applies on the auto
    # path) — odd head dims fall back to XLA instead of lowering an
    # unqualified Mosaic tile shape
    return (_block_q(q.shape[1]) > 0 and _block_kv(k.shape[1]) > 0
            and q.shape[-1] % 64 == 0)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Blockwise softmax(q k^T / sqrt(d)) v over (B, S, H, D) tensors.

    Ragged (non-128-multiple) sequence lengths fall back to XLA attention —
    same math, no kernel."""
    b, _, h, _ = q.shape
    if not _kernel_usable(q, k):
        from diffusion_tpu.ops.attention import _xla_attention
        return _xla_attention(q, k, v, None)
    out, _ = _fwd(_fold(q), _fold(k), _fold(v))
    return _unfold(out, b, h)


def flash_attention_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             vma=()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention plus the per-query logsumexp of the scaled scores.

    Returns (out (B,S,H,D), lse (B,H,S)). The lse makes partial-softmax
    results mergeable (logaddexp combine), which is what ring attention
    (ops/ring_attention.py) needs to stream KV blocks between devices.
    NOT differentiable (raw kernel call) — ring_attention wraps it in its
    own custom VJP. Falls back to an XLA path off-TPU / on ragged lengths.
    """
    b, _, h, _ = q.shape
    if not _kernel_usable(q, k):
        from diffusion_tpu.ops.attention import _xla_attention_with_lse
        return _xla_attention_with_lse(q, k, v)
    out, lse = _fwd(_fold(q), _fold(k), _fold(v), vma=vma)
    return _unfold(out, b, h), lse[:, 0, :].reshape(b, h, -1)


def flash_attention_bwd_with_lse(q, k, v, out, lse, do, vma=(), delta=None):
    """Per-block backward given a (possibly global) logsumexp: the kernels
    recompute p = exp(s - lse), so any lse covering a superset of this KV
    block yields the correct partial gradients (ring attention's bwd pass).

    Shapes as flash_attention_with_lse; returns (dq, dk, dv). `delta`
    ((B,H,Sq) rowsum(do*out)) is loop-invariant across KV blocks — ring
    attention computes it once and passes it to every step."""
    b, _, h, _ = q.shape
    lse_f = lse.reshape(b * h, 1, -1)
    if not _kernel_usable(q, k):
        from diffusion_tpu.ops.attention import _xla_attention_bwd_with_lse
        return _xla_attention_bwd_with_lse(q, k, v, out, lse, do, delta)
    delta_f = None if delta is None else delta.reshape(b * h, 1, -1)
    dq, dk, dv = _bwd(_fold(q), _fold(k), _fold(v), _fold(out), lse_f,
                      _fold(do), vma=vma, delta=delta_f)
    return _unfold(dq, b, h), _unfold(dk, b, h), _unfold(dv, b, h)


def _kernel_usable(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    if not _tiles_ok(q, k):
        return False
    # honor the 'xla' escape hatch (DIFFUSION_TPU_ATTN_BACKEND=xla /
    # set_default_backend) here too, so it also steers the Pallas kernels
    # INSIDE ring attention — ring dispatch is a parallelism decision that
    # happens before the backend check in multi_head_attention
    from diffusion_tpu.ops import attention as _attn
    if _attn._DEFAULT_BACKEND == "xla":
        return False
    return jax.default_backend() == "tpu" or _interpret()


def _flash_fwd_rule(q, k, v):
    if not _kernel_usable(q, k):
        from diffusion_tpu.ops.attention import _xla_attention
        out, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, None),
                           q, k, v)
        return out, (None, vjp)
    b, _, h, _ = q.shape
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    out, lse = _fwd(qf, kf, vf)
    # named for remat policies: the kernel is not a lax.dot, so under the
    # UNet's dots-saveable policy the whole O(S^2) forward would re-run
    # inside the backward pass just to rebuild these residuals. unet.py
    # adds save_only_these_names on these (q/k/v projections are plain
    # matmuls the dots policy already saves).
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return _unfold(out, b, h), (qf, kf, vf, out, lse, b, h)


def _flash_bwd_rule(res, g):
    if len(res) == 2 and res[0] is None:
        return res[1](g)
    qf, kf, vf, out, lse, b, h = res
    dq, dk, dv = _bwd(qf, kf, vf, out, lse, _fold(g))
    return _unfold(dq, b, h), _unfold(dk, b, h), _unfold(dv, b, h)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
