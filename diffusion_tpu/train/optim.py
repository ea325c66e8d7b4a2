"""Optimizers and LR schedules (optax).

TPU-native equivalent of the reference's optimizer/scheduler surface:
torch.optim.AdamW from yaml (reference: yamls/hydra-yamls/SD-2-base-256.yaml:
55-58, lr 1e-4 / weight_decay 0.01) and Composer's
MultiStepWithWarmupScheduler (`t_warmup: 10000ba`, `milestones: [200ep]`,
SD-2-base-256.yaml:59-64) with `scale_schedule_ratio` (train.py/yaml:4).

Schedules are step-indexed optax schedules; Time strings ('10000ba', '200ep',
'0.5dur') resolve against max_duration/batches_per_epoch at build time.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import optax

from diffusion_tpu.utils.time import time_to_batches

__all__ = ["adamw", "build_optimizer", "multi_step_with_warmup",
           "cosine_annealing_with_warmup", "linear_with_warmup",
           "constant_with_warmup", "constant_scheduler"]

Schedule = Callable[[int], float]


def _np_mod(step):
    """numpy for host calls (plain int/np step), jnp under trace/jax arrays.

    The fit loop evaluates the schedule every batch for LR logging; eager
    jnp math there would dispatch device programs whose fetch queues behind
    the in-flight train step — a hidden per-batch device sync."""
    import numpy as np
    if isinstance(step, (int, float, np.ndarray, np.generic)):
        return np
    import jax.numpy as jnp
    return jnp


def adamw(lr: float = 1e-4, betas: Sequence[float] = (0.9, 0.999),
          eps: float = 1e-8, weight_decay: float = 0.01,
          mu_dtype: Optional[str] = None) -> dict:
    """AdamW config node (torch.optim.AdamW parity, reference yaml :55-58).

    Returns a spec dict; `build_optimizer` combines it with the LR schedule
    so the schedule multiplies the base lr exactly like Composer does.
    `mu_dtype='bfloat16'` halves the first-moment memory — useful on chips
    that must hold the full optimizer state (on pods the fsdp axis shards it,
    the reference's SHARD_GRAD_OP equivalent).
    """
    return {"name": "adamw", "lr": float(lr), "betas": tuple(betas),
            "eps": float(eps), "weight_decay": float(weight_decay),
            "mu_dtype": mu_dtype}


def build_optimizer(spec: Optional[dict] = None,
                    schedule: Optional[Schedule] = None,
                    grad_clip_norm: Optional[float] = None
                    ) -> optax.GradientTransformation:
    """optax chain: [clip] -> adamw(lr = base_lr * schedule(step))."""
    spec = spec or adamw()
    base_lr = spec["lr"]
    if schedule is None:
        lr: Union[float, Schedule] = base_lr
    else:
        def lr(step):
            return base_lr * schedule(step)
    tx = optax.adamw(learning_rate=lr, b1=spec["betas"][0], b2=spec["betas"][1],
                     eps=spec["eps"], weight_decay=spec["weight_decay"],
                     mu_dtype=spec.get("mu_dtype"))
    if grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def _resolve(t, max_duration, batches_per_epoch, scale: float = 1.0) -> int:
    return max(int(scale * time_to_batches(t, max_duration, batches_per_epoch)), 0)


def multi_step_with_warmup(t_warmup: Union[str, int],
                           milestones: Sequence[Union[str, int]],
                           gamma: float = 0.1,
                           max_duration: Union[str, int] = "1000000ba",
                           batches_per_epoch: int = 0,
                           scale_schedule_ratio: float = 1.0) -> Schedule:
    """Linear warmup then x gamma at each milestone (Composer
    MultiStepWithWarmupScheduler parity, reference yaml :59-64). Milestones
    scale by scale_schedule_ratio; warmup does not (Composer semantics).

    Epoch-denominated milestones with no known batches_per_epoch (streaming
    pipes without a length) are unreachable within the run and are skipped
    rather than raising — the reference configs set milestones: [200ep] on a
    550000ba run precisely as a "never decay" sentinel."""
    warmup = _resolve(t_warmup, max_duration, batches_per_epoch)
    steps = []
    for m in milestones:
        try:
            steps.append(_resolve(m, max_duration, batches_per_epoch,
                                  scale_schedule_ratio))
        except ValueError:
            import logging
            logging.getLogger(__name__).warning(
                "scheduler milestone %r is epoch-denominated but "
                "batches_per_epoch is unknown; treating as unreachable", m)
    steps = sorted(steps)

    def schedule(step):
        xp = _np_mod(step)
        s = xp.asarray(step, xp.float32)
        warm = xp.minimum(s / max(warmup, 1), 1.0) if warmup > 0 else 1.0
        factor = 1.0
        for m in steps:
            factor = factor * xp.where(s >= m, gamma, 1.0)
        return warm * factor

    return schedule


def linear_with_warmup(t_warmup: Union[str, int],
                       alpha_i: float = 1.0, alpha_f: float = 0.0,
                       t_max: Union[str, int] = "1dur",
                       max_duration: Union[str, int] = "1000000ba",
                       batches_per_epoch: int = 0,
                       scale_schedule_ratio: float = 1.0) -> Schedule:
    warmup = _resolve(t_warmup, max_duration, batches_per_epoch)
    total = _resolve(t_max, max_duration, batches_per_epoch, scale_schedule_ratio)

    def schedule(step):
        xp = _np_mod(step)
        s = xp.asarray(step, xp.float32)
        warm = xp.minimum(s / max(warmup, 1), 1.0) if warmup > 0 else 1.0
        frac = xp.clip((s - warmup) / max(total - warmup, 1), 0.0, 1.0)
        return warm * (alpha_i + frac * (alpha_f - alpha_i))

    return schedule


def cosine_annealing_with_warmup(t_warmup: Union[str, int],
                                 alpha_f: float = 0.0,
                                 t_max: Union[str, int] = "1dur",
                                 max_duration: Union[str, int] = "1000000ba",
                                 batches_per_epoch: int = 0,
                                 scale_schedule_ratio: float = 1.0) -> Schedule:
    warmup = _resolve(t_warmup, max_duration, batches_per_epoch)
    total = _resolve(t_max, max_duration, batches_per_epoch, scale_schedule_ratio)

    def schedule(step):
        xp = _np_mod(step)
        s = xp.asarray(step, xp.float32)
        warm = xp.minimum(s / max(warmup, 1), 1.0) if warmup > 0 else 1.0
        frac = xp.clip((s - warmup) / max(total - warmup, 1), 0.0, 1.0)
        cos = 0.5 * (1 + xp.cos(xp.pi * frac))
        return warm * (alpha_f + (1 - alpha_f) * cos)

    return schedule


def constant_with_warmup(t_warmup: Union[str, int],
                         max_duration: Union[str, int] = "1000000ba",
                         batches_per_epoch: int = 0, **_) -> Schedule:
    warmup = _resolve(t_warmup, max_duration, batches_per_epoch)

    def schedule(step):
        xp = _np_mod(step)
        s = xp.asarray(step, xp.float32)
        return xp.minimum(s / max(warmup, 1), 1.0) if warmup > 0 else 1.0

    return schedule


def constant_scheduler(**_) -> Schedule:
    return lambda step: 1.0
