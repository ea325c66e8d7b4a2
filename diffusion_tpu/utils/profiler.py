"""Profiler callback: jax.profiler trace dumps around selected batches.

TPU-native equivalent of the reference's `log_traces` trainer flag (reference:
yamls/hydra-yamls/SD-2-base-256-mixdata.yaml:115-117 progress_bar/
log_to_console/log_traces; Composer's torch-profiler integration). Captures
an XLA/TPU trace (viewable in TensorBoard / xprof) for `num_batches` batches
starting at `start_batch`, once.
"""

from __future__ import annotations

import os

import jax

from diffusion_tpu.train.events import Callback

__all__ = ["JaxProfiler"]


class JaxProfiler(Callback):
    def __init__(self, trace_dir: str = "traces", start_batch: int = 10,
                 num_batches: int = 3):
        self.trace_dir = trace_dir
        self.start_batch = int(start_batch)
        self.num_batches = int(num_batches)
        self._active = False
        self._done = False

    def batch_start(self, state, logger):
        if self._done or self._active:
            return
        if state.timestamp.batch == self.start_batch:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def batch_end(self, state, logger):
        if not self._active:
            return
        if state.timestamp.batch >= self.start_batch + self.num_batches:
            if state.loss is not None:
                jax.block_until_ready(state.loss)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.log_metrics({"profiler/trace_dir": self.trace_dir},
                               step=state.timestamp.batch)

    def fit_end(self, state, logger):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
