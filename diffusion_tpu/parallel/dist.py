"""Host-level distributed utilities (launch, rank, barrier).

TPU-native equivalent of composer.utils.dist / torch.distributed as the
reference consumes them (reference: diffusion/train.py:40 get_world_size,
scripts/precompute_latents.py:226,332 get_local_rank/barrier;
sensecore/run_cmd.sh:10-29 MASTER_ADDR/WORLD_SIZE env plumbing). On TPU pods
this is one process per host: `jax.distributed.initialize()` discovers the
slice topology; device-level communication is compiled XLA collectives, so
only host-side coordination (data tooling, checkpoint gating) lives here.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize", "get_world_size", "get_process_index",
           "get_local_world_size", "get_global_rank", "barrier",
           "is_coordinator"]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-op on single host or if already done.

    On TPU pods the arguments are discovered from the metadata server / env;
    explicit args support manual launch (the reference's MASTER_ADDR
    equivalent, run_cmd.sh:22-29).
    """
    global _initialized
    if _initialized:
        return
    multi = (num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))) > 1 \
        or os.environ.get("JAX_COORDINATOR_ADDRESS") or coordinator_address
    if multi:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    _initialized = True


def get_world_size() -> int:
    """Number of participating *devices* (the reference's world_size is one
    process per GPU; here devices play that role for batch division)."""
    return jax.device_count()


def get_process_index() -> int:
    return jax.process_index()


def get_global_rank() -> int:
    return jax.process_index()


def get_local_world_size() -> int:
    return jax.local_device_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until all hosts arrive (reference precompute_latents.py:332)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
