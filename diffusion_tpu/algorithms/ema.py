"""EMA of model weights — sharding-native, compiled into the train step.

TPU-native equivalent of the reference's FSDP-aware EMA algorithm (reference:
diffusion/algorithms/ema.py): half-life -> smoothing conversion
2^(-interval/half_life) (ref :173-177), `ema_start` delay (ref :188-199),
update on BATCH_END (ref :261-263), swap EMA weights in for EVAL_START / out
at EVAL_END (ref :265-274), swap in before checkpoints (ref :276-278), and
serialized active/started flags with the EMA weights (ref :280-336).

Design deltas for TPU:
- The reference's `compute_ema` walks modules in Python under
  `summon_full_params` (ref :26-85). Here EMA weights are just another
  sharded pytree in TrainState; the update `e = s*e + (1-s)*p` is fused into
  the jitted train step (see Trainer._make_train_step) — zero extra HBM
  round-trips, no gathering.
- The start delay and update interval are traced scalars: before `ema_start`
  the effective smoothing is 0 (EMA tracks the raw weights exactly, so the
  moment averaging begins it starts from the current weights); on non-update
  steps it is 1 (EMA unchanged).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from diffusion_tpu.train.events import Algorithm, Event
from diffusion_tpu.utils.time import Time, TimeUnit, time_to_batches

__all__ = ["EMA", "ema_smoothing_for_step"]


def ema_smoothing_for_step(step: jnp.ndarray, smoothing: float,
                           ema_start: int, update_interval: int) -> jnp.ndarray:
    """Effective per-step smoothing: 0 before start (copy), `smoothing` on
    update steps, 1 otherwise (hold)."""
    s = jnp.asarray(step)
    on_interval = (s % max(update_interval, 1)) == 0
    started = s >= ema_start
    return jnp.where(started, jnp.where(on_interval, smoothing, 1.0), 0.0)


def apply_ema(ema_params: Any, params: Any, eff_smoothing: jnp.ndarray) -> Any:
    return jax.tree.map(
        lambda e, p: (eff_smoothing * e.astype(jnp.float32)
                      + (1.0 - eff_smoothing) * p.astype(jnp.float32)
                      ).astype(e.dtype),
        ema_params, params)


class EMA(Algorithm):
    """Event-level EMA policy. The arithmetic runs inside the train step; this
    object owns configuration, eval/checkpoint weight swaps, and state.

    Args mirror the reference (ema.py:93-171): half_life like '100ba' or
    explicit smoothing; update_interval (default: half_life unit granularity,
    here 1 batch); ema_start time string.
    """

    def __init__(self, half_life: Optional[str] = "1000ba",
                 smoothing: Optional[float] = None,
                 update_interval: str = "1ba",
                 ema_start: str = "0.0dur"):
        self.half_life = half_life
        self.update_interval = Time.from_str(update_interval)
        if self.update_interval.unit != TimeUnit.BATCH:
            raise ValueError("update_interval must be batch-denominated")
        self._explicit_smoothing = smoothing
        self.ema_start = ema_start
        self.ema_weights_active = False
        self.ema_started = False

    # ---- config resolution -------------------------------------------
    def smoothing(self) -> float:
        if self._explicit_smoothing is not None:
            return float(self._explicit_smoothing)
        hl = Time.from_str(self.half_life)
        if hl.unit != TimeUnit.BATCH:
            raise ValueError("half_life must be batch-denominated")
        return float(2.0 ** (-self.update_interval.value / hl.value))

    def start_batch(self, max_duration, batches_per_epoch: int = 0) -> int:
        return time_to_batches(self.ema_start, max_duration, batches_per_epoch)

    # ---- event wiring (reference ema.py:211-278) ----------------------
    def match(self, event: Event, state) -> bool:
        return event in (Event.EVAL_START, Event.EVAL_END,
                         Event.BATCH_CHECKPOINT, Event.EPOCH_CHECKPOINT,
                         Event.FIT_END, Event.BATCH_END)

    def apply(self, event: Event, state, logger) -> None:
        if event == Event.BATCH_END:
            if not self.ema_started and state.timestamp.batch >= state.ema_start_batch:
                self.ema_started = True
            return
        if event == Event.EVAL_START:
            self.swap_in(state)
        elif event == Event.EVAL_END:
            self.swap_out(state)
        elif event in (Event.BATCH_CHECKPOINT, Event.EPOCH_CHECKPOINT, Event.FIT_END):
            # checkpoints are written with EMA weights active (ref :276-278);
            # the trainer swaps back after saving via swap_out
            pass

    def swap_in(self, state) -> None:
        """Exchange params <-> ema_params (a pytree pointer swap — the TPU
        answer to the reference's summon_full_params copy dance, ema.py:79-85).
        Checkpoints taken while active therefore hold EMA weights as `params`
        and the training weights as `ema_params` (ref :276-278 semantics)."""
        if self.ema_weights_active or state.train_state.ema_params is None:
            return
        ts = state.train_state
        state.train_state = ts.replace(params=ts.ema_params, ema_params=ts.params)
        self.ema_weights_active = True

    def swap_out(self, state) -> None:
        if not self.ema_weights_active:
            return
        ts = state.train_state
        state.train_state = ts.replace(params=ts.ema_params, ema_params=ts.params)
        self.ema_weights_active = False

    # ---- serialization (reference ema.py:280-336) ----------------------
    def state_dict(self) -> dict:
        return {"ema_weights_active": self.ema_weights_active,
                "ema_started": self.ema_started}

    def load_state_dict(self, d: dict) -> None:
        self.ema_weights_active = bool(d.get("ema_weights_active", False))
        self.ema_started = bool(d.get("ema_started", False))
