"""Parameter/batch partition specs: the FSDP (ZeRO) equivalent, as pjit specs.

TPU-native equivalent of the reference's torch-FSDP config (reference:
yamls/hydra-yamls/SD-2-base-256.yaml:95-96 `sharding_strategy: SHARD_GRAD_OP`
= ZeRO-2, applied to the UNet only via `_fsdp_wrap` flags,
diffusion/models/stable_diffusion.py:148-152). On TPU the same memory win is
a partition-spec decision: shard each large parameter (and therefore its
gradient and AdamW moments) along its largest divisible axis over the `fsdp`
mesh axis; XLA all-gathers weights where needed and reduce-scatters grads.
Frozen VAE/CLIP params stay replicated (they have no optimizer state).

There is no `summon_full_params` anywhere — EMA and checkpointing operate on
the sharded pytrees directly (SURVEY.md §2.2 notes this is a place the TPU
design is simpler than the reference's ema.py:79-85).
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_spec", "param_shardings", "replicated", "batch_spec",
           "batch_sharding", "activation_mesh",
           "constrain_batch"]

# Trace-time ambient mesh for activation sharding constraints. The networks
# are pure Flax modules with no mesh argument; the Trainer enters
# `activation_mesh(mesh)` around step tracing so `constrain_batch` (called
# inside the UNet) can pin activations batch-sharded. Without these anchors,
# SPMD propagation wanders on the GroupNorm reshapes and the partitioner
# falls back to "Involuntary full rematerialization" (replicate-then-
# repartition) — wasted HBM + ICI on a real pod.
_ACTIVATION_MESH: list = [None]


@contextlib.contextmanager
def activation_mesh(mesh: Optional[Mesh]):
    """Enable batch-sharding constraints inside network code during tracing.

    No-op when mesh is None or single-device (plain executables)."""
    prev = _ACTIVATION_MESH[0]
    _ACTIVATION_MESH[0] = mesh if (mesh is not None and mesh.size > 1) else None
    try:
        yield
    finally:
        _ACTIVATION_MESH[0] = prev


def constrain_batch(x: Any, tp_dim: Optional[int] = None,
                    tp_groups: Optional[int] = None) -> Any:
    """Constrain an activation's leading (batch) dim to the ambient mesh's
    batch sharding; identity outside an `activation_mesh` context.

    With an active `sp` axis (sequence parallelism), dim 1 — the token /
    spatial-height axis of (B,S,...) and (B,H,W,C) activations — is
    additionally sharded over `sp` whenever divisible, so the whole UNet
    body (convs with XLA-inserted halo exchange, norms with allreduced
    stats, per-token matmuls) runs token-sharded and ring attention
    consumes its q/k/v shards in place.

    `tp_dim` marks the Megatron-partitioned feature dim of an activation
    (the head axis of (B,S,H,D) q/k/v, the hidden axis of the GEGLU
    intermediate): with an active `tp` axis it is sharded over `tp`
    whenever divisible, so the column-parallel projection output stays
    sharded through attention / the GELU and the ONLY tp collective per
    layer is the allreduce XLA inserts after the row-parallel
    to_out / proj_out matmul (whose output the next plain constrain_batch
    pins feature-replicated). Activations without a tp_dim keep features
    replicated.

    `tp_groups` gives the number of indivisible groups along tp_dim (the
    head count of a flattened heads*head_dim axis): the dim is tp-sharded
    only when the GROUPS divide by tp, so a shard never splits a head —
    e.g. SD2's 5-head stage stays replicated at tp=2 even though its
    320-wide inner dim is divisible."""
    mesh = _ACTIVATION_MESH[0]
    if mesh is None:
        return x
    batch_axes = batch_spec(mesh)[0]
    rest: list = [None] * (x.ndim - 1)
    sp = mesh.shape.get("sp", 1)
    if sp > 1 and x.ndim >= 3 and x.shape[1] % sp == 0 \
            and x.shape[1] // sp >= 2:
        # require >=2 rows per shard: degenerate 1-row spatial shards make
        # 3x3 conv halo exchange pure overhead and drive the SPMD
        # partitioner into replicate-then-reshard ("involuntary full
        # rematerialization") on the deepest UNet stages; those tiny stages
        # stay batch-sharded instead
        rest[0] = "sp"
    tp = mesh.shape.get("tp", 1)
    if tp_dim is not None and tp > 1:
        d = tp_dim % x.ndim
        if d >= 1 and x.shape[d] % tp == 0 \
                and (tp_groups is None or tp_groups % tp == 0):
            rest[d - 1] = "tp"
    spec = P(batch_axes, *rest)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# Megatron partition table (tensor parallelism over the `tp` mesh axis).
# Column-parallel projections (output features sharded): the q/k/v heads
# and the GEGLU value/gate halves — their outputs stay tp-sharded through
# attention / the GELU (constrain_batch tp_dim anchors). Row-parallel
# projections (input features sharded): to_out and the GEGLU proj_out —
# their matmul produces a partial sum and the allreduce XLA inserts there
# is the only tp collective of the layer. Biases follow the output:
# sharded for column-parallel, replicated (added once, after the
# allreduce) for row-parallel. LoRA branches mirror their base
# projection's sharded side. Attention rows are HEAD-GATED: with
# `tp_head_dim` known, a kernel whose head count (inner // head_dim)
# doesn't divide by tp stays replicated — SD2's 5-head top stage at tp=2
# would otherwise shard its 320-wide q/k/v mid-head while the dispatch in
# ops/attention.py (q.shape[2] % tp) correctly refuses to head-shard the
# activations, forcing gathers around every (b,s,inner)->(b,s,h,d)
# reshape. GEGLU entries have no head structure and are never gated.
_TP_COLUMN = ("to_q", "to_k", "to_v",
              "to_q_lora_b", "to_k_lora_b", "to_v_lora_b")
_TP_ROW = ("to_out", "to_out_lora_a")


def _tp_dim(path: tuple) -> Optional[tuple]:
    """(Megatron partition dim, needs_head_gate) for a parameter path
    (tuple of str scope names + leaf name), or None when the parameter is
    not part of an attention/GEGLU Megatron pair. `proj_in`/`proj_gate`/
    `proj_out` are paired only under an `ff` scope (FeedForwardGEGLU) —
    the Transformer2D spatial projections of the same names are plain
    layers."""
    if len(path) < 2:
        return None
    leaf, mod = path[-1], path[-2]
    parent = path[-3] if len(path) >= 3 else ""
    if mod in _TP_COLUMN:
        d = {"kernel": 1, "bias": 0}.get(leaf)
        return None if d is None else (d, True)
    if mod in ("proj_in", "proj_gate") and parent == "ff":
        d = {"kernel": 1, "bias": 0}.get(leaf)
        return None if d is None else (d, False)
    if mod in _TP_ROW:
        return (0, True) if leaf == "kernel" else None
    if mod == "proj_out" and parent == "ff":
        return (0, False) if leaf == "kernel" else None
    return None


def param_spec(leaf: Any, mesh: Mesh, min_size: int = 2 ** 16,
               path: tuple = (), tp_head_dim: Optional[int] = None) -> P:
    """Partition spec for one parameter: the Megatron `tp` dim when the
    path names an attention/GEGLU projection (and the mesh has a tp axis),
    then the largest remaining axis divisible by the fsdp axis size;
    replicate small or indivisible leaves.

    `tp_head_dim` is the model's uniform attention head width: attention
    kernels are tp-sharded only when their head count divides by tp (see
    the table comment). None skips the gate (divisibility-only — fine for
    models whose head counts all divide tp); pass the model's value in
    production (the Trainer reads it off `model.unet.config`).

    The `min_size` gate applies to the fsdp axis only: a tp match is kept
    even on small leaves (column-parallel biases, LoRA kernels), because a
    bias that pairs with a sharded kernel is free to shard and replicating
    it would add a gather against its tp-sharded output."""
    fsdp = mesh.shape.get("fsdp", 1)
    tp = mesh.shape.get("tp", 1)
    if fsdp <= 1 and tp <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    spec: list = [None] * len(shape)
    if tp > 1 and path:
        got = _tp_dim(path)
        if got is not None:
            d, head_gated = got
            if d < len(shape) and shape[d] % tp == 0:
                heads_ok = True
                if head_gated and tp_head_dim is not None:
                    inner = shape[d]
                    heads = inner // tp_head_dim
                    heads_ok = (inner % tp_head_dim == 0 and heads > 0
                                and heads % tp == 0)
                if heads_ok:
                    spec[d] = "tp"
    if fsdp > 1 and int(np.prod(shape)) >= min_size:
        # prefer the largest dim; ties broken toward the last (lane) dim,
        # which keeps the replicated dims contiguous for the MXU
        order = sorted(range(len(shape)),
                       key=lambda i: (shape[i], i), reverse=True)
        for i in order:
            if spec[i] is None and shape[i] % fsdp == 0:
                spec[i] = "fsdp"
                break
    if all(s is None for s in spec):
        return P()  # fully replicated leaves compare equal to P()
    return P(*spec)


def _path_names(path) -> tuple:
    """jax key-path entries -> plain str names (dict keys / attrs / idx)."""
    out = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is None:
            name = getattr(k, "idx", None)
        out.append(str(name))
    return tuple(out)


def param_shardings(params: Any, mesh: Mesh, shard: bool = True,
                    min_size: int = 2 ** 16,
                    tp_head_dim: Optional[int] = None) -> Any:
    """NamedSharding pytree matching `params`. shard=False replicates all
    (the frozen VAE/CLIP towers). `tp_head_dim`: see param_spec."""
    if not shard:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def one(path, leaf):
        spec = param_spec(leaf, mesh, min_size, path=_path_names(path),
                          tp_head_dim=tp_head_dim)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(one, params)


def model_tp_head_dim(model: Any) -> Optional[int]:
    """The uniform attention head width of a model's UNet, for param_spec's
    head gate. Returns None when the model has no UNet config or the head
    width varies per stage (no gate — matches legacy behavior); -1 would
    never be a real width, so a non-uniform model conservatively disables
    attention tp sharding instead via the sentinel."""
    cfg = getattr(getattr(model, "unet", None), "config", None)
    hd = getattr(cfg, "head_dim", None)
    if hd is None:
        return None
    try:
        vals = set(hd)
    except TypeError:
        return int(hd)
    if len(vals) == 1:
        return int(vals.pop())
    return -1  # non-uniform: heads can't be derived from shape — gate off


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(mesh: Mesh) -> P:
    """Batch axis sharded over every data-carrying mesh axis (pure data
    parallelism, reference train.py:40 global//world semantics). The `sp`
    axis shards tokens and the `tp` axis shards features, not examples,
    so both are excluded — batches are replicated across an sp/tp group."""
    return P(tuple(a for a in mesh.axis_names if a not in ("sp", "tp")))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh))


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Zero-pad every leaf's batch dim to a multiple and add a '_valid' float
    mask (1 = real sample). Eval batches smaller than the device count (the
    reference sizes eval at 8/device; tails can be ragged) become shardable;
    metric reductions weight by the mask so padding never biases results."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if pad:
            v = np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
        out[k] = v
    mask = np.ones(n + pad, np.float32)
    if pad:
        mask[n:] = 0.0
    out["_valid"] = mask
    return out


def make_global_batch(host_batch: Any, mesh: Mesh) -> Any:
    """Assemble per-host batches into global sharded arrays.

    Each host feeds its local slice (global_batch // num_hosts rows, the
    reference's per-rank division, train.py:40); the result is one global
    array sharded over all mesh axes. Single-host: plain device_put.
    """
    if mesh.size == 1:
        # single device: plain placement — identical semantics, and some
        # PJRT runtimes execute non-SPMD programs dramatically faster
        return jax.tree.map(jax.device_put, host_batch)
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), host_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), host_batch)
