"""Device mesh construction: (dcn, fsdp, data) axes over ICI/DCN.

TPU-native equivalent of the reference's NCCL/composer-launcher distribution
(reference: sensecore/run_cmd.sh:22-29 spawns one process per GPU with
MASTER_ADDR/WORLD_SIZE; diffusion/train.py:40 divides the global batch by
world size). Here distribution is a compiled property of the program: a
`jax.sharding.Mesh` whose inner axes ride ICI and whose outer `dcn` axis
crosses slices, with XLA inserting the collectives.

Axis roles:
  dcn  — crosses pod slices (data-parallel only; gradient allreduce over DCN)
  fsdp — intra-slice axis that shards params/optimizer state (ZeRO-ish)
  data — intra-slice pure data parallelism
  sp   — sequence parallelism: shards the spatial-token axis; attention
         runs as a ring over this axis (ops/ring_attention.py). Size 1
         (off) unless configured.
  tp   — tensor (Megatron-style) parallelism: shards attention heads and
         the GEGLU hidden dim (parallel/sharding.py tp rules); the only
         per-layer collective is the allreduce after to_out / proj_out,
         which XLA inserts from the sharding constraints. Innermost so
         those allreduces ride nearest-neighbor ICI links. Size 1 (off)
         unless configured.
The global batch is sharded over dcn x fsdp x data (sp shards tokens and tp
shards features, not examples); parameters over `fsdp` plus — for the
attention/FF Megatron pairs — `tp`; activations' token axis over `sp` and
head/hidden axis over `tp` when enabled.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["create_mesh", "MESH_AXES"]

MESH_AXES = ("dcn", "fsdp", "data", "sp", "tp")


def create_mesh(fsdp: int = -1, data: int = 1, dcn: int = 1, sp: int = 1,
                tp: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dcn, fsdp, data, sp, tp) mesh. One dimension may be -1
    (inferred).

    Uses `mesh_utils.create_device_mesh` for ICI-aware ordering when the
    whole mesh is one slice, and `create_hybrid_device_mesh` when dcn > 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = {"dcn": dcn, "fsdp": fsdp, "data": data, "sp": sp, "tp": tp}
    unknown = [k for k, v in sizes.items() if v == -1]
    if len(unknown) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if unknown:
        known = math.prod(v for v in sizes.values() if v != -1)
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[unknown[0]] = n // known
    if math.prod(sizes.values()) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")

    shape = tuple(sizes[a] for a in MESH_AXES)
    try:
        from jax.experimental import mesh_utils
        if sizes["dcn"] > 1:
            per_slice = (1, sizes["fsdp"], sizes["data"], sizes["sp"],
                         sizes["tp"])
            dev_array = mesh_utils.create_hybrid_device_mesh(
                per_slice, (sizes["dcn"], 1, 1, 1, 1), devices=devices)
        else:
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception as e:
        # virtual CPU devices / odd topologies: plain row-major assignment.
        # On a REAL multi-slice pod this fallback would misalign the dcn
        # axis with slice boundaries (fsdp all-gathers then cross slow DCN
        # links every step — a silent order-of-magnitude cliff), so say it
        # loudly instead of swallowing the topology error.
        import logging
        log = logging.getLogger(__name__)
        msg = ("mesh_utils device-mesh construction failed (%s); falling "
               "back to row-major device order")
        if sizes["dcn"] > 1 and getattr(devices[0], "platform", "") == "tpu":
            log.error(msg + " — on a multi-slice TPU pod this likely puts "
                      "per-step collectives on DCN; fix the topology/mesh "
                      "config instead of training like this", e)
        else:
            log.info(msg, e)
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, MESH_AXES)
