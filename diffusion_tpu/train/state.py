"""TrainState pytree + the host-side State handed to callbacks/algorithms.

TPU split of Composer's monolithic `state` (reference: composer State consumed
throughout diffusion/algorithms/ema.py and callbacks/*): the device-resident,
jit-compiled part (TrainState: params/opt-state/EMA/step — a flax.struct
pytree donated through the train step) versus the host-side bookkeeping part
(State: timestamp, batch, outputs, loss, run metadata) that events observe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct

from diffusion_tpu.utils.time import Timestamp

__all__ = ["TrainState", "State"]


@struct.dataclass
class TrainState:
    """Device state threaded through the jitted train step (donated)."""

    step: jnp.ndarray                 # int32 scalar
    params: Any                       # trainable (UNet) params
    opt_state: Any
    ema_params: Optional[Any] = None  # EMA shadow of `params` (or None)


@dataclasses.dataclass
class State:
    """Host-side view for events; mirrors the slice of composer.State the
    reference's algorithms/callbacks actually touch."""

    model: Any
    train_state: TrainState
    frozen: Any
    timestamp: Timestamp
    run_name: str = "run"
    max_duration: str = "1ba"
    # total batches the run will execute (Trainer-computed: includes
    # scale_schedule_ratio and real batches_per_epoch) — consumed by
    # RuntimeEstimator for the ETA
    max_batches: Optional[int] = None
    seed: int = 17
    device_train_microbatch_size: Optional[int] = None
    ema_start_batch: int = 0
    # per-batch transient fields
    batch: Optional[Dict[str, Any]] = None
    outputs: Optional[Any] = None
    loss: Optional[float] = None
    lr: Optional[float] = None
    metrics: Optional[Dict[str, Any]] = None  # device metrics from train step
    # eval transient fields
    eval_label: Optional[str] = None
    eval_batch_idx: int = 0
    eval_outputs: Optional[Any] = None
    # wall-clock / throughput scratch for monitors
    batch_wct: float = 0.0
    total_wct: float = 0.0
    rank: int = 0
