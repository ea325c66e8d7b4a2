"""DDIM sampler as pure functions, designed for `lax.scan` sampling loops.

TPU-native equivalent of diffusers.DDIMScheduler as consumed by the
reference's generate loop (reference: diffusion/models/stable_diffusion.py:
354-375 — `set_timesteps`, `init_noise_sigma`, `scale_model_input`,
`step(...).prev_sample`; config at models.py:146-158: scaled_linear betas,
`set_alpha_to_one=False`, `steps_offset=1`, eta=0).

Instead of a stateful object mutated per step, `timesteps(n)` returns the
whole (t, t_prev) sequence up front and `step` is a pure function of
(model_output, t, t_prev, sample) — the 50-step loop compiles once under
`jax.lax.scan` with zero per-step dispatch (reference dispatches the python
scheduler 50x per image batch).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from diffusion_tpu.schedulers.ddpm import alphas_cumprod_np, uniform_timestep_grid

__all__ = ["DDIMScheduler"]


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    clip_sample: bool = False
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    rescale_betas_zero_snr: bool = False
    timestep_spacing: str = "leading"

    def __post_init__(self):
        if self.rescale_betas_zero_snr and self.prediction_type == "epsilon":
            # at alpha-bar(T) == 0 the epsilon parameterization cannot
            # recover x0 (division by sqrt(abar)=0) — Lin et al. 2023
            # pairs the rescaled schedule with v_prediction
            raise ValueError(
                "rescale_betas_zero_snr requires prediction_type "
                "v_prediction (or sample), not epsilon")
        if self.rescale_betas_zero_snr and self.timestep_spacing != "trailing":
            # the two halves of the recipe ship together: zero terminal SNR
            # only helps if sampling actually STARTS at the pure-noise step
            # (arXiv:2305.08891 3.2 "Sample from the Last Timestep")
            raise ValueError(
                "rescale_betas_zero_snr requires "
                "timestep_spacing='trailing' so sampling starts at t=T-1 "
                "(the zero-SNR step the rescale creates)")

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(
            alphas_cumprod_np(self.beta_schedule, self.num_train_timesteps,
                              self.beta_start, self.beta_end,
                              self.rescale_betas_zero_snr),
            dtype=jnp.float32)

    @property
    def final_alpha_cumprod(self) -> jnp.ndarray:
        if self.set_alpha_to_one:
            return jnp.asarray(1.0, dtype=jnp.float32)
        return self.alphas_cumprod[0]

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample: jnp.ndarray, t) -> jnp.ndarray:
        return sample

    def noise_to(self, x0: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        """Noise clean latents to timestep t in this sampler's working space
        (VP: sqrt(abar) x0 + sqrt(1-abar) eps) — the img2img/SDEdit entry
        point for starting the denoise loop mid-trajectory."""
        a2 = self.alphas_cumprod[t]
        return (jnp.sqrt(a2) * x0.astype(jnp.float32)
                + jnp.sqrt(1.0 - a2) * noise.astype(jnp.float32))

    def timesteps(self, num_inference_steps: int) -> Tuple[np.ndarray, np.ndarray]:
        """Return (t, t_prev) int32 arrays of length num_inference_steps,
        descending (shared grid: ddpm.uniform_timestep_grid). t_prev[i] is the
        timestep the step function moves *to*; negative means "final"
        (alpha_prod = final_alpha_cumprod)."""
        return uniform_timestep_grid(self.num_train_timesteps,
                                     num_inference_steps, self.steps_offset,
                                     self.timestep_spacing)

    def step(self, model_output: jnp.ndarray, t: jnp.ndarray, t_prev: jnp.ndarray,
             sample: jnp.ndarray) -> jnp.ndarray:
        """One deterministic (eta=0) DDIM update x_t -> x_{t_prev}; jit-safe."""
        abar = self.alphas_cumprod
        a_t = abar[t]
        a_prev = jnp.where(t_prev >= 0, abar[jnp.maximum(t_prev, 0)],
                           self.final_alpha_cumprod)
        sqrt_at = jnp.sqrt(a_t)
        sqrt_1m_at = jnp.sqrt(1.0 - a_t)

        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (x - sqrt_1m_at * out) / sqrt_at
            eps = out
        elif self.prediction_type == "sample":
            x0 = out
            eps = (x - sqrt_at * x0) / sqrt_1m_at
        elif self.prediction_type == "v_prediction":
            x0 = sqrt_at * x - sqrt_1m_at * out
            eps = sqrt_at * out + sqrt_1m_at * x
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type!r}")

        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (x - jnp.sqrt(a_t) * x0) / sqrt_1m_at

        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return prev.astype(sample.dtype)
