"""Continuous-time VP-SDE scheduler (Song et al. 2020, arXiv:2011.13456).

TPU-native equivalent of the reference's ContinuousTimeScheduler (reference:
diffusion/schedulers/schedulers.py:10-114): angle-parameterized tangent
schedule beta(t)=2 tan(t), signal=cos(t), noise=sin(t); Euler-Maruyama
reverse-SDE or probability-flow-ODE steps; duck-types the sampler protocol
(`timesteps`, `init_noise_sigma`, `scale_model_input`, `step`).

`step` is pure; the SDE noise term takes an explicit noise array so the whole
sampling loop can live in `lax.scan` with threaded PRNG keys.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["ContinuousTimeScheduler", "tangent_schedule"]


def tangent_schedule(times):
    """beta(t), sin(phi(t)), cos(phi(t)) for the angle=time schedule (beta = 2 tan t)."""
    times = jnp.asarray(times, dtype=jnp.float32)
    return 2.0 * jnp.tan(times), jnp.sin(times), jnp.cos(times)


def _expand(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    t = jnp.atleast_1d(t)
    return t.reshape(t.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class ContinuousTimeScheduler:
    t_max: float = 1.57
    num_inference_timesteps: int = 50
    prediction_type: str = "epsilon"
    use_ode: bool = False

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def __len__(self) -> int:
        return self.num_inference_timesteps

    def scale_model_input(self, sample: jnp.ndarray, t) -> jnp.ndarray:
        return sample

    def timesteps(self, num_inference_steps: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """(t, t_prev) float32 arrays, t descending from t_max (exclusive of 0)."""
        n = num_inference_steps or self.num_inference_timesteps
        ts = np.linspace(self.t_max, 0.0, num=n, endpoint=False).astype(np.float32)
        dt = self.t_max / n
        return ts, ts - dt

    def add_noise(self, inputs: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        _, sin_phi, cos_phi = tangent_schedule(_expand(timesteps, inputs.ndim))
        return cos_phi * inputs + sin_phi * noise

    def get_velocity(self, inputs: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        _, sin_phi, cos_phi = tangent_schedule(_expand(timesteps, inputs.ndim))
        return -sin_phi * inputs + cos_phi * noise

    def step(self, model_output: jnp.ndarray, t: jnp.ndarray, t_prev: jnp.ndarray,
             sample: jnp.ndarray, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Integrate x_t backwards by dt = t - t_prev (Euler ODE or Euler-Maruyama SDE).

        `noise` must be standard normal of sample shape for the SDE path; pass
        None only when use_ode=True.
        """
        beta_t, sin_phi, cos_phi = tangent_schedule(t)
        dt = self.t_max / self.num_inference_timesteps
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if self.prediction_type == "sample":
            x0 = out
        elif self.prediction_type == "epsilon":
            x0 = (x - sin_phi * out) / cos_phi
        elif self.prediction_type == "v_prediction":
            x0 = cos_phi * x - sin_phi * out
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type!r}")
        score = -(x - cos_phi * x0) / jnp.square(sin_phi)
        if self.use_ode:
            x_prev = x + 0.5 * (x + score) * beta_t * dt
        else:
            x_prev = x + (0.5 * x + score) * beta_t * dt
            if noise is None:
                raise ValueError("SDE step requires a noise array (use_ode=False)")
            x_prev = x_prev + jnp.sqrt(beta_t * dt) * noise.astype(jnp.float32)
        # the reference returns x unchanged at exactly t == 0
        x_prev = jnp.where(t == 0.0, x, x_prev)
        return x_prev.astype(sample.dtype)
