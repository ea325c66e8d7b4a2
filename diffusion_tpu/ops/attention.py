"""Attention dispatch: XLA dot-product attention or the Pallas flash kernel.

TPU-native replacement for the reference's xformers memory-efficient attention
(reference: diffusion/models/models.py:20-25,107-111 enables
`enable_xformers_memory_efficient_attention` on unet+vae when importable).
Here the equivalent switch is `use_flash` / the DIFFUSION_TPU_FLASH_ATTN env
var, and the kernel is Pallas (ops/flash_attention.py) instead of CUDA.

All entry points take (B, S, H, D) q/k/v — batch, sequence, heads, head_dim.
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention", "set_default_backend",
           "sequence_parallel", "tensor_parallel"]

_DEFAULT_BACKEND = os.environ.get("DIFFUSION_TPU_ATTN_BACKEND", "auto")

# Trace-time sequence-parallel context: (mesh, axis_name, min_seq). Entered
# by the Trainer when the mesh has an sp axis > 1 (parallel/mesh.py); long
# unmasked self-attention then runs as ring attention under shard_map with
# tokens sharded over `axis_name` (ops/ring_attention.py), consuming the
# already-token-sharded activations in place (parallel/sharding.py
# constrain_batch shards dim 1 over sp).
_SEQ_PARALLEL: list = [None]


@contextlib.contextmanager
def sequence_parallel(mesh, axis_name: str = "sp", min_seq: int = 512):
    """Enable ring-attention dispatch for self-attention with >= min_seq
    tokens during tracing. No-op when the mesh's sp axis is 1."""
    prev = _SEQ_PARALLEL[0]
    active = mesh is not None and mesh.shape.get(axis_name, 1) > 1
    _SEQ_PARALLEL[0] = (mesh, axis_name, min_seq) if active else None
    try:
        yield
    finally:
        _SEQ_PARALLEL[0] = prev


def _ring_dispatch(q, k, v, mesh, axis_name: str):
    from jax.sharding import PartitionSpec as P

    from diffusion_tpu.ops.ring_attention import ring_attention

    # heads additionally shard over an active tp axis (each ring hop then
    # moves 1/tp of the KV bytes per device); tp never carries batch rows
    tp = mesh.shape.get("tp", 1)
    batch_axes = tuple(a for a in mesh.axis_names
                       if a not in (axis_name, "tp"))
    head_ax = "tp" if (tp > 1 and q.shape[2] % tp == 0) else None
    spec = P(batch_axes, axis_name, head_ax, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis_name),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


# Trace-time tensor-parallel context: (mesh, axis_name). Entered by the
# Trainer when the mesh has a tp axis > 1. Attention then runs head-sharded
# under shard_map — heads are embarrassingly parallel, so the body needs NO
# collective; shard_map (rather than relying on SPMD propagation) keeps the
# Pallas flash kernel usable per-shard, since GSPMD cannot partition a
# pallas_call and would otherwise gather the heads back.
_TENSOR_PARALLEL: list = [None]


@contextlib.contextmanager
def tensor_parallel(mesh, axis_name: str = "tp"):
    """Enable head-sharded attention dispatch during tracing. No-op when the
    mesh is None or its tp axis is 1."""
    prev = _TENSOR_PARALLEL[0]
    active = mesh is not None and mesh.shape.get(axis_name, 1) > 1
    _TENSOR_PARALLEL[0] = (mesh, axis_name) if active else None
    try:
        yield
    finally:
        _TENSOR_PARALLEL[0] = prev


def _tp_dispatch(q, k, v, mesh, axis_name: str, backend):
    """Head-sharded attention: shard_map over the tp axis, plain kernel
    dispatch per shard. Tokens are gathered (spec None on dim 1) — attention
    mixes all tokens; the sp-sharded long-sequence case takes the ring path
    before reaching here."""
    from jax.sharding import PartitionSpec as P

    batch_axes = tuple(a for a in mesh.axis_names
                       if a not in (axis_name, "sp"))
    spec = P(batch_axes, None, axis_name, None)

    def body(q_, k_, v_):
        return _dispatch_kernel(q_, k_, v_, None, backend)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def set_default_backend(backend: str) -> None:
    """backend in {'auto', 'xla', 'flash'}."""
    global _DEFAULT_BACKEND
    assert backend in ("auto", "xla", "flash"), backend
    _DEFAULT_BACKEND = backend


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Plain (B,S,H,D) attention; XLA fuses this well for short sequences."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _xla_attention_with_lse(q, k, v):
    """(out, lse) pair for partial-softmax merging (ring attention).

    out (B,S,H,D) in q.dtype, lse (B,H,Sq) fp32 of the scaled scores."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    probs = jnp.exp(logits - lse[..., None]).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out, lse


def _xla_attention_bwd_with_lse(q, k, v, out, lse, do, delta=None):
    """Backward of one KV block under a global logsumexp (see
    flash_attention_bwd_with_lse). Pure-JAX fallback path. `delta` is
    (B,H,Sq) — precomputed by ring attention (hoisted out of the ring
    loop) or derived here."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jnp.exp(logits - lse[..., None])                     # (B,H,Sq,Sk)
    if delta is None:
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1).transpose(0, 2, 1)           # -> (B,H,Sq)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(do.dtype), do)
    dp = jnp.einsum("bqhd,bkhd->bhqk", do, v,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - delta[..., None])                          # (B,H,Sq,1)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds.astype(k.dtype), k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds.astype(q.dtype), q) * scale
    return dq, dk, dv


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None,
                         backend: Optional[str] = None) -> jnp.ndarray:
    """Scaled dot-product attention over (B, S, H, D) tensors.

    'auto' uses the Pallas flash kernel on TPU for long unmasked sequences
    (the UNet's spatial self-attention: 1024 tokens @256px, 4096 @512px) and
    XLA attention otherwise (77-token text, masked, tiny shapes).

    Under an active `sequence_parallel` context, token-sharded
    self-attention always takes the ring path (a parallelism decision — the
    activations are sharded over the sp axis); a global 'xla' backend still
    steers the KERNEL inside the ring to the pure-XLA with-lse path
    (flash_attention._kernel_usable).
    """
    sp = _SEQ_PARALLEL[0]
    if sp is not None and mask is None:
        mesh, axis_name, min_seq = sp
        n = mesh.shape[axis_name]
        if (q.shape[1] == k.shape[1] and q.shape[1] >= min_seq
                and q.shape[1] % n == 0):
            return _ring_dispatch(q, k, v, mesh, axis_name)
    backend = backend or _DEFAULT_BACKEND
    tpctx = _TENSOR_PARALLEL[0]
    if tpctx is not None and mask is None:
        mesh, axis_name = tpctx
        n = mesh.shape[axis_name]
        rows = 1
        for a in mesh.axis_names:
            if a not in (axis_name, "sp"):
                rows *= mesh.shape[a]
        # head-sharded only when heads split evenly and the batch splits
        # over the data axes; masked attention (the frozen CLIP text tower,
        # replicated params) and ragged shapes stay on the plain path —
        # GSPMD still compiles those correctly, just without head sharding
        if q.shape[2] % n == 0 and q.shape[0] % rows == 0:
            return _tp_dispatch(q, k, v, mesh, axis_name, backend)
    return _dispatch_kernel(q, k, v, mask, backend)


def _dispatch_kernel(q, k, v, mask, backend):
    if backend == "flash" or (backend == "auto" and _flash_eligible(q, k, mask)):
        from diffusion_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v, mask)


def _flash_eligible(q: jnp.ndarray, k: jnp.ndarray, mask) -> bool:
    if mask is not None:
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    # flash pays off once KV no longer fits comfortably alongside the
    # (S_q x S_kv) score matrix; short cross-attention stays on XLA. Ragged
    # lengths (not a 128 multiple) use XLA too — the kernel tiles at 128
    # (flash_attention also guards this internally).
    return (q.shape[1] >= 1024 and k.shape[1] >= 256
            and q.shape[-1] % 64 == 0
            and q.shape[1] % 128 == 0 and k.shape[1] % 128 == 0)
