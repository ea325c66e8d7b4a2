"""Ring (sequence-parallel) attention over a mesh axis — TPU-native.

Beyond-reference capability (SURVEY.md §5 lists sequence parallelism as a
stretch goal; the reference's xformers kernels are single-GPU only,
reference: diffusion/models/models.py:107-111). This op shards the token
axis across devices and streams KV blocks around the ICI ring with
`lax.ppermute`, so attention over sequences that exceed one chip's HBM
(e.g. 1024px latents = 16384 spatial tokens and beyond) runs without ever
materializing the full KV on any device.

Design (blockwise + online-softmax merge, Liu et al. ring attention):
- Every device holds q/k/v shards of shape (B, S/n, H, D).
- Forward: n ring steps; each step computes a flash-attention partial
  (out_b, lse_b) of the resident queries against the visiting KV block
  (ops/flash_attention.py kernels), merges it into the running result by
  logaddexp, and rotates the KV block to the next device. Constant memory:
  only the running (out, lse) and one visiting KV block live per device.
- Backward: a custom VJP rings again. With the saved GLOBAL lse the
  per-block probabilities p = exp(s - lse) are exact partials, so each step
  reuses the flash backward kernels to produce dq (accumulated locally)
  and dk/dv for the visiting block (accumulated in buffers that rotate in
  lockstep with k/v, landing back on their owner after n steps).

Both passes compile to a static `lax.scan` of [pallas kernel + ppermute],
which XLA overlaps (compute step i while DMAing block i+1 over ICI).

Usage (inside shard_map, tokens sharded over axis `sp`):

    mesh = Mesh(devices, ("sp",))
    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp"),
        mesh=mesh,
        in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None))(q, k, v)

Non-causal (diffusion spatial attention has no mask), like the rest of
ops/. Gradients match single-device attention exactly (tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from diffusion_tpu.ops.flash_attention import (flash_attention_bwd_with_lse,
                                               flash_attention_with_lse)

__all__ = ["ring_attention"]


def _ring_perm(axis_name: str):
    n = jax.lax.psum(1, axis_name)
    return [(i, (i + 1) % n) for i in range(n)]


def _merge(o, l, o_b, l_b):
    """Merge a partial-softmax block into the running (out, lse)."""
    l_new = jnp.logaddexp(l, l_b)                       # (B,H,Sq)
    w_old = jnp.exp(l - l_new)
    w_new = jnp.exp(l_b - l_new)
    # weights arrive (B,H,Sq) -> broadcast to (B,Sq,H,1)
    o = (o * w_old.transpose(0, 2, 1)[..., None]
         + o_b.astype(jnp.float32) * w_new.transpose(0, 2, 1)[..., None])
    return o, l_new


def _ring_fwd(q, k, v, axis_name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = jax.lax.psum(1, axis_name)
    perm = _ring_perm(axis_name)
    b, sq, h, _ = q.shape
    # mark the zero carries as device-varying over every axis q varies on
    # (shard_map tracks varying manual axes; a literal zeros carry is
    # "invariant" and would not typecheck against the varying scan outputs
    # — and when the enclosing shard_map also shards batch over dcn/fsdp/
    # data axes, the carries must vary over those too, not just the ring)
    vma = tuple(jax.typeof(q).vma) or (axis_name,)
    o0 = jax.lax.pcast(jnp.zeros(q.shape, jnp.float32), vma, to="varying")
    l0 = jax.lax.pcast(jnp.full((b, h, sq), -jnp.inf, jnp.float32),
                       vma, to="varying")

    def step(carry, _):
        o, l, kb, vb = carry
        o_b, l_b = flash_attention_with_lse(q, kb, vb, vma=vma)
        o, l = _merge(o, l, o_b, l_b)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (o, l, kb, vb), None

    (o, l, _, _), _ = jax.lax.scan(step, (o0, l0, k, v), None, length=n)
    return o.astype(q.dtype), l


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str) -> jnp.ndarray:
    """Sequence-parallel softmax(q k^T / sqrt(d)) v; call inside shard_map
    with q/k/v token-sharded over `axis_name`. Shapes (B, S/n, H, D)."""
    out, _ = _ring_fwd(q, k, v, axis_name)
    return out


def _ring_attention_fwd(q, k, v, axis_name):
    out, lse = _ring_fwd(q, k, v, axis_name)
    # named for remat policies like the single-device kernel
    # (flash_attention.py _flash_fwd_rule): without these names the UNet's
    # save_only_these_names('flash_out','flash_lse') policy would drop the
    # residuals and re-run the WHOLE n-step ring forward (n flash kernels
    # + 2n ICI ppermutes per layer) inside the backward pass
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _ring_attention_bwd(axis_name, res, g):
    q, k, v, out, lse, = res
    perm = _ring_perm(axis_name)
    n = jax.lax.psum(1, axis_name)
    # zeros_like of the (varying) residuals is itself varying over the ring
    # axis — no pcast needed here, unlike the literal carries in _ring_fwd
    dq0 = jnp.zeros_like(q, jnp.float32)
    # dk/dv accumulators ride the ring WITH their kv block: after n rotations
    # every block (and its accumulated gradient) is back at its owner
    dk0 = jnp.zeros_like(k, jnp.float32)
    dv0 = jnp.zeros_like(v, jnp.float32)

    # rowsum(do*out) is identical for every KV block: compute once, not n×
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)               # (B,H,Sq)

    vma = tuple(jax.typeof(q).vma) or (axis_name,)

    def step(carry, _):
        dq, dk, dv, kb, vb = carry
        dq_b, dk_b, dv_b = flash_attention_bwd_with_lse(
            q, kb, vb, out, lse, g, vma=vma, delta=delta)
        dq = dq + dq_b.astype(jnp.float32)
        dk = dk + dk_b.astype(jnp.float32)
        dv = dv + dv_b.astype(jnp.float32)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        dk = jax.lax.ppermute(dk, axis_name, perm)
        dv = jax.lax.ppermute(dv, axis_name, perm)
        return (dq, dk, dv, kb, vb), None

    (dq, dk, dv, _, _), _ = jax.lax.scan(
        step, (dq0, dk0, dv0, k, v), None, length=n)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)
