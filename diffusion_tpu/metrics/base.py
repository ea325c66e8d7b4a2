"""Metric protocol: update/compute/reset with cross-host reduction.

TPU-native equivalent of the torchmetrics surface the reference consumes
(reference: diffusion/models/models.py:11-13 MeanSquaredError/FID/CLIPScore/
InceptionScore instances from yaml; stable_diffusion.py:114-134 fans copies
out per guidance scale and loss bin with names like
'FrechetInceptionDistance-scale-3p0'). Accumulators are plain float/ndarray
sums updated from jitted device reductions; `all_hosts_sum` folds per-host
partial sums for multi-host eval.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["Metric", "all_hosts_sum", "scale_suffix"]


def all_hosts_sum(x: np.ndarray) -> np.ndarray:
    """Sum a small host-local accumulator across processes."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.sum(gathered, axis=0)


def scale_suffix(metric_name: str, guidance_scale: float) -> str:
    """'FrechetInceptionDistance', 3.0 -> 'FrechetInceptionDistance-scale-3p0'
    (reference stable_diffusion.py:118-123 name mangling)."""
    return f"{metric_name}-scale-{str(float(guidance_scale)).replace('.', 'p')}"


class Metric:
    def update(self, *args: Any, **kwargs: Any) -> None:
        raise NotImplementedError

    def compute(self) -> float:
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError
