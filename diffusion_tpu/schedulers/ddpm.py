"""DDPM forward-diffusion schedule as closed-form jnp tables.

TPU-native equivalent of diffusers.DDPMScheduler as used by the reference for
*training-time* forward diffusion only (reference: diffusion/models/
stable_diffusion.py:177-180 `add_noise`, models.py:88 loads the SD2 schedule:
beta 0.00085->0.012 scaled_linear over 1000 steps; pixel models hard-code the
same at models.py:133-145, plus `get_velocity` for v-prediction targets,
pixel_diffusion.py:86-94).

Everything is a pure function over precomputed alpha-bar tables so `add_noise`
traces cleanly inside a jitted train step.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["DDPMScheduler", "make_beta_schedule", "alphas_cumprod_np",
           "uniform_timestep_grid"]


def make_beta_schedule(schedule: str, num_timesteps: int, beta_start: float,
                       beta_end: float) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_timesteps,
                           dtype=np.float64) ** 2
    if schedule == "squaredcos_cap_v2":
        # Nichol & Dhariwal cosine schedule
        def abar(t: np.ndarray) -> np.ndarray:
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        t = np.arange(num_timesteps, dtype=np.float64)
        betas = 1.0 - abar((t + 1) / num_timesteps) / abar(t / num_timesteps)
        return np.clip(betas, 0.0, 0.999)
    raise ValueError(f"unknown beta schedule {schedule!r}")


def alphas_cumprod_np(schedule: str, num_timesteps: int, beta_start: float,
                      beta_end: float,
                      rescale_zero_terminal_snr: bool = False) -> np.ndarray:
    """Cumulative product of (1 - beta) as float64 numpy — the one alpha-bar
    table every sampler in this package derives its coefficients from.

    `rescale_zero_terminal_snr` applies Lin et al. 2023 (arXiv:2305.08891
    alg. 1): linearly rescale sqrt(alpha-bar) so the LAST timestep has
    alpha-bar exactly 0 (SNR 0 — the model really sees pure noise at t=T,
    fixing the brightness/offset artifacts of the default schedule's
    leftover signal). Requires v_prediction: at alpha-bar 0 an epsilon
    parameterization cannot recover x0."""
    abar = np.cumprod(1.0 - make_beta_schedule(schedule, num_timesteps,
                                               beta_start, beta_end))
    if rescale_zero_terminal_snr:
        s = np.sqrt(abar)
        s0, sT = s[0], s[-1]
        s = (s - sT) * (s0 / (s0 - sT))
        abar = s ** 2
    return abar


def uniform_timestep_grid(num_train_timesteps: int, num_inference_steps: int,
                          steps_offset: int,
                          spacing: str = "leading"
                          ) -> "tuple[np.ndarray, np.ndarray]":
    """Descending (t, t_prev) int32 arrays shared by DDIM/DPM++/Euler.

    t_prev[i] is the timestep the step function moves *to*; negative means
    "final". steps_offset can push the top step to num_train_timesteps (e.g.
    num_inference_steps == num_train_timesteps), which would index alpha
    tables out of range — jnp clamps silently, so clip here (diffusers clips
    the same way).

    `spacing` (diffusers timestep_spacing): "leading" anchors the grid at
    the low end (SD2's shipped config, top step ~T-step_ratio+offset);
    "trailing" anchors at t = T-1 — the "Sample from the Last Timestep" half
    of the zero-terminal-SNR recipe (arXiv:2305.08891 §3.2: the model must
    actually be asked for the pure-noise step the rescaled schedule
    creates)."""
    step_ratio = num_train_timesteps // num_inference_steps
    if spacing == "leading":
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        ts = ts.astype(np.int64) + steps_offset
    elif spacing == "trailing":
        ts = np.arange(num_train_timesteps, 0,
                       -num_train_timesteps / num_inference_steps)
        ts = ts.round().astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep spacing {spacing!r}; "
                         "choose leading or trailing")
    ts = np.minimum(ts, num_train_timesteps - 1)
    t_prev = ts - step_ratio
    return ts.astype(np.int32), t_prev.astype(np.int32)


def _expand(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Broadcast a per-example vector to the sample rank: (B,) -> (B,1,1,1)."""
    return t.reshape(t.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    """Immutable DDPM schedule; all methods are pure and jit-safe.

    Matches the diffusers scheduler math: ``alphas_cumprod[t]`` tables with
    ``add_noise(x, eps, t) = sqrt(abar_t) x + sqrt(1-abar_t) eps`` and
    ``get_velocity(x, eps, t) = sqrt(abar_t) eps - sqrt(1-abar_t) x``.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    variance_type: str = "fixed_small"
    clip_sample: bool = False
    # Lin et al. 2023 zero-terminal-SNR rescale (alphas_cumprod_np); the
    # t=T sample is then pure noise — pair with prediction_type=v_prediction
    # AND timestep_spacing=trailing on the sampler
    rescale_betas_zero_snr: bool = False
    # recorded for the like= carry into samplers (training ignores spacing)
    timestep_spacing: str = "leading"

    @property
    def betas(self) -> jnp.ndarray:
        return jnp.asarray(
            make_beta_schedule(self.beta_schedule, self.num_train_timesteps,
                               self.beta_start, self.beta_end),
            dtype=jnp.float32)

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(
            alphas_cumprod_np(self.beta_schedule, self.num_train_timesteps,
                              self.beta_start, self.beta_end,
                              self.rescale_betas_zero_snr),
            dtype=jnp.float32)

    # needed by the shared generate() protocol (duck-typed HF interface)
    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def __len__(self) -> int:
        return self.num_train_timesteps

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        abar = self.alphas_cumprod[timesteps]
        sqrt_abar = _expand(jnp.sqrt(abar), original.ndim)
        sqrt_1m = _expand(jnp.sqrt(1.0 - abar), original.ndim)
        return (sqrt_abar * original.astype(jnp.float32)
                + sqrt_1m * noise.astype(jnp.float32)).astype(original.dtype)

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        abar = self.alphas_cumprod[timesteps]
        sqrt_abar = _expand(jnp.sqrt(abar), sample.ndim)
        sqrt_1m = _expand(jnp.sqrt(1.0 - abar), sample.ndim)
        return (sqrt_abar * noise.astype(jnp.float32)
                - sqrt_1m * sample.astype(jnp.float32)).astype(sample.dtype)

    def scale_model_input(self, sample: jnp.ndarray, t) -> jnp.ndarray:
        return sample
