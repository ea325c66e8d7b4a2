"""Monitor callbacks: throughput, LR, device memory, ETA, optimizer stats.

TPU-native equivalents of the composer callbacks the reference declares in
yaml (reference: yamls/hydra-yamls/SD-2-base-256-mixdata.yaml:96-107 —
SpeedMonitor(window_size=10), LRMonitor, MemoryMonitor, RuntimeEstimator,
OptimizerMonitor). MemoryMonitor reads XLA allocator stats
(device.memory_stats) instead of torch.cuda; OptimizerMonitor reads the
grad-norm computed inside the fused train step instead of hooking autograd.
"""

from __future__ import annotations

import collections
import gc
from typing import Deque, Optional, Tuple

import jax
import numpy as np

from diffusion_tpu.train.events import Callback
from diffusion_tpu.utils.time import time_to_batches

__all__ = ["SpeedMonitor", "LRMonitor", "MemoryMonitor", "RuntimeEstimator",
           "OptimizerMonitor", "ScheduledGarbageCollector"]


class SpeedMonitor(Callback):
    """samples/sec over a rolling window (+ per-device), logged per batch.

    With `flops_per_batch` (a number, measured via
    `diffusion_tpu.utils.flops.lowered_flops` or Composer-style
    hand-derived) it also logs `throughput/flops_per_sec` and — when the
    device's bf16 peak is known or `peak_tflops_per_device` is given —
    `throughput/device/mfu` (composer.callbacks.speed_monitor parity)."""

    def __init__(self, window_size: int = 10,
                 flops_per_batch: Optional[float] = None,
                 peak_tflops_per_device: Optional[float] = None):
        self.window: Deque[Tuple[float, int]] = collections.deque(maxlen=window_size)
        # float() so yaml/CLI strings like "1.1e8" work
        self.flops_per_batch = (float(flops_per_batch)
                                if flops_per_batch else None)
        self._peak = (float(peak_tflops_per_device) * 1e12
                      if peak_tflops_per_device else None)

    def batch_end(self, state, logger):
        self.window.append((state.batch_wct, state.timestamp.sample))
        if len(self.window) < 2:
            return
        # samples and wall-clock accumulated across the window, excluding the
        # first entry's wct (it delimits the window start)
        samples = self.window[-1][1] - self.window[0][1]
        wct = sum(w for w, _ in list(self.window)[1:])
        if wct <= 0 or samples <= 0:
            return
        sps = samples / wct
        n_dev = jax.device_count()
        metrics = {
            "throughput/samples_per_sec": sps,
            "throughput/device/samples_per_sec": sps / max(n_dev, 1),
            "throughput/batches_per_sec": (len(self.window) - 1) / wct,
            "wall_clock/train": state.total_wct,
        }
        if self.flops_per_batch:
            fps = self.flops_per_batch * metrics["throughput/batches_per_sec"]
            metrics["throughput/flops_per_sec"] = fps
            if self._peak is None:
                from diffusion_tpu.utils.flops import device_peak_flops
                self._peak = device_peak_flops()
                if self._peak is None:
                    self._peak = 0.0  # unknown device: probe once, then skip
            if self._peak:
                metrics["throughput/device/mfu"] = (
                    fps / max(n_dev, 1) / self._peak)
        logger.log_metrics(metrics, step=state.timestamp.batch)


class LRMonitor(Callback):
    def batch_end(self, state, logger):
        if state.lr is not None:
            logger.log_metrics({"lr-AdamW/group0": state.lr},
                               step=state.timestamp.batch)


class MemoryMonitor(Callback):
    """Logs XLA per-device allocator stats (bytes in use / peak / limit)."""

    def batch_end(self, state, logger):
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            return
        metrics = {}
        for key, out in (("bytes_in_use", "memory/allocated_bytes"),
                         ("peak_bytes_in_use", "memory/peak_bytes"),
                         ("bytes_limit", "memory/limit_bytes")):
            if key in stats:
                metrics[out] = float(stats[key])
        if metrics:
            logger.log_metrics(metrics, step=state.timestamp.batch)


class RuntimeEstimator(Callback):
    """ETA from rolling throughput vs remaining batches."""

    def __init__(self, window_size: int = 20):
        self.window: Deque[float] = collections.deque(maxlen=window_size)
        self._max_batches: Optional[int] = None

    def fit_start(self, state, logger):
        # the Trainer already computed max_batches (with scale_schedule_ratio
        # and real batches_per_epoch for 'ep'/'dur' durations) — re-deriving
        # it here without batches_per_epoch silently disabled the ETA on
        # epoch-denominated runs
        self._max_batches = getattr(state, "max_batches", None)
        if self._max_batches is None:
            try:
                self._max_batches = time_to_batches(state.max_duration,
                                                    state.max_duration)
            except ValueError:
                self._max_batches = None

    def batch_end(self, state, logger):
        if state.batch_wct > 0:  # 0 marks the compile-contaminated first batch
            self.window.append(state.batch_wct)
        if not self._max_batches or len(self.window) < 2:
            return
        per_batch = sum(self.window) / len(self.window)
        remaining = max(self._max_batches - state.timestamp.batch, 0)
        logger.log_metrics({"time/remaining_estimate_sec": per_batch * remaining},
                           step=state.timestamp.batch)


class OptimizerMonitor(Callback):
    """Gradient/parameter norms. The grad norm is produced inside the jitted
    train step (metrics['grad/global_norm']); this logs it plus an occasional
    parameter norm."""

    def __init__(self, log_optimizer_metrics: bool = True, interval: int = 10):
        self.log_optimizer_metrics = log_optimizer_metrics
        self.interval = max(interval, 1)

    def batch_end(self, state, logger):
        b = state.timestamp.batch
        if b % self.interval:
            return
        metrics = {}
        m = getattr(state, "metrics", None)
        if m and "grad/global_norm" in m:
            metrics["l2_norm/grad/global"] = float(np.asarray(m["grad/global_norm"]))
        if self.log_optimizer_metrics:
            # one fused jitted program (eager optax.global_norm dispatches a
            # kernel per param leaf — hundreds for the SD2 UNet). Note this
            # still synchronizes on the in-flight step at the fetch, which
            # is inherent to logging a fresh value at interval batches.
            if not hasattr(self, "_gnorm_fn"):
                import jax
                import optax
                self._gnorm_fn = jax.jit(optax.global_norm)
            metrics["l2_norm/param/global"] = float(np.asarray(
                self._gnorm_fn(state.train_state.params)))
        if metrics:
            logger.log_metrics(metrics, step=b)


class ScheduledGarbageCollector(Callback):
    """Deterministic host GC (reference callbacks/scheduled_garbage_collector
    .py:37-67). On TPU there is no cuda cache to empty — XLA owns HBM — so
    only the Python-GC scheduling part carries over; it keeps host-side pause
    times out of the input pipeline's critical path."""

    def __init__(self, batch_interval: int = 10000, gen_1_batch_interval: Optional[int] = None):
        self.batch_interval = int(batch_interval)
        self.gen_1_batch_interval = gen_1_batch_interval
        self._was_enabled = True
        self._active = False   # between fit_start and fit_end

    def fit_start(self, state, logger):
        self._was_enabled = gc.isenabled()
        self._active = True
        gc.disable()

    def fit_end(self, state, logger):
        self._active = False
        if self._was_enabled:
            gc.enable()
        gc.collect()

    def before_dataloader(self, state, logger):
        b = state.timestamp.batch
        if self.gen_1_batch_interval and b % self.gen_1_batch_interval == 0:
            gc.collect(1)
        if self.batch_interval and b % self.batch_interval == 0:
            gc.collect()

    def eval_start(self, state, logger):
        gc.collect()
        if self._active:          # mid-fit eval: GC on while generating
            gc.enable()

    def eval_end(self, state, logger):
        # only re-disable what fit_start disabled — a standalone post-fit
        # eval used to leave host GC permanently off for the process
        if self._active:
            gc.disable()
