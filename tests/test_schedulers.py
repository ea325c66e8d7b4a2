"""Scheduler math vs closed forms (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tpu.schedulers import (ContinuousTimeScheduler, DDIMScheduler,
                                      DDPMScheduler,
                                      DPMSolverMultistepScheduler,
                                      EulerDiscreteScheduler, tangent_schedule)


def _np_alphas_cumprod(n=1000, b0=0.00085, b1=0.012):
    betas = np.linspace(b0 ** 0.5, b1 ** 0.5, n, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def test_ddpm_alphas_cumprod_closed_form():
    sched = DDPMScheduler()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod),
                               _np_alphas_cumprod(), rtol=1e-5)


def test_ddpm_add_noise_closed_form():
    sched = DDPMScheduler()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    eps = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    t = np.array([0, 10, 500, 999])
    got = np.asarray(sched.add_noise(jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    abar = _np_alphas_cumprod()[t].reshape(-1, 1, 1, 1)
    want = np.sqrt(abar) * x + np.sqrt(1 - abar) * eps
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddpm_velocity_closed_form():
    sched = DDPMScheduler()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    t = np.array([100, 900])
    got = np.asarray(sched.get_velocity(jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    abar = _np_alphas_cumprod()[t].reshape(-1, 1, 1, 1)
    want = np.sqrt(abar) * eps - np.sqrt(1 - abar) * x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddim_timestep_sequence():
    sched = DDIMScheduler(steps_offset=1)
    ts, tp = sched.timesteps(50)
    assert ts.shape == (50,)
    assert ts[0] == 981 and ts[-1] == 1   # 1000//50=20 spacing, +1 offset
    assert np.all(ts - tp == 20)
    assert tp[-1] == -19                   # negative => final alpha


@pytest.mark.parametrize("prediction_type", ["epsilon", "sample", "v_prediction"])
def test_ddim_step_closed_form(prediction_type):
    sched = DDIMScheduler(prediction_type=prediction_type)
    abar = _np_alphas_cumprod()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    out = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    t, t_prev = 981, 961
    got = np.asarray(sched.step(jnp.asarray(out), jnp.asarray(t), jnp.asarray(t_prev),
                                jnp.asarray(x)))
    a_t, a_p = abar[t], abar[t_prev]
    if prediction_type == "epsilon":
        x0 = (x - np.sqrt(1 - a_t) * out) / np.sqrt(a_t); eps = out
    elif prediction_type == "sample":
        x0 = out; eps = (x - np.sqrt(a_t) * x0) / np.sqrt(1 - a_t)
    else:
        x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * out
        eps = np.sqrt(a_t) * out + np.sqrt(1 - a_t) * x
    want = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddim_final_step_uses_final_alpha():
    sched = DDIMScheduler(set_alpha_to_one=False)
    abar = _np_alphas_cumprod()
    x = np.ones((1, 2, 2, 2), np.float32)
    out = np.zeros_like(x)
    got = np.asarray(sched.step(jnp.asarray(out), jnp.asarray(1), jnp.asarray(-19),
                                jnp.asarray(x)))
    a_t, a_p = abar[1], abar[0]  # final_alpha_cumprod = abar[0]
    want = np.sqrt(a_p) * (x / np.sqrt(a_t))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ddim_denoises_toy_gaussian():
    """Sampling with the exact epsilon-predictor recovers x0 for a known x0."""
    sched = DDIMScheduler()
    x0 = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 2, 2)).astype(np.float32))
    abar = sched.alphas_cumprod
    ts, tps = sched.timesteps(50)
    eps_true = jnp.asarray(np.random.default_rng(4).normal(size=x0.shape).astype(np.float32))
    x = jnp.sqrt(abar[int(ts[0])]) * x0 + jnp.sqrt(1 - abar[int(ts[0])]) * eps_true

    def body(x, t_pair):
        t, tp = t_pair
        # oracle epsilon for this xt given fixed x0
        a_t = abar[t]
        eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        return sched.step(eps, t, tp, x), None

    x_final, _ = jax.lax.scan(body, x, (jnp.asarray(ts), jnp.asarray(tps)))
    # With set_alpha_to_one=False the endpoint is abar[0], not 1: the exact
    # trajectory terminates at sqrt(abar0) x0 + sqrt(1-abar0) eps_true.
    a0 = abar[0]
    want = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * eps_true
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(want), rtol=1e-3, atol=1e-4)


def test_tangent_schedule():
    t = jnp.asarray([0.0, 0.5, 1.0])
    beta, sin_phi, cos_phi = tangent_schedule(t)
    np.testing.assert_allclose(np.asarray(beta), 2 * np.tan([0.0, 0.5, 1.0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sin_phi), np.sin([0.0, 0.5, 1.0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cos_phi), np.cos([0.0, 0.5, 1.0]), rtol=1e-5)


def test_continuous_add_noise_and_velocity():
    sched = ContinuousTimeScheduler()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 3, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(3, 3, 4, 4)).astype(np.float32)
    t = np.array([0.1, 0.7, 1.5], np.float32)
    noised = np.asarray(sched.add_noise(jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    tb = t.reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(noised, np.cos(tb) * x + np.sin(tb) * eps,
                               rtol=1e-4, atol=1e-6)
    vel = np.asarray(sched.get_velocity(jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    np.testing.assert_allclose(vel, -np.sin(tb) * x + np.cos(tb) * eps,
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("prediction_type", ["epsilon", "sample", "v_prediction"])
def test_continuous_ode_step_closed_form(prediction_type):
    sched = ContinuousTimeScheduler(t_max=1.56, num_inference_timesteps=50,
                                    prediction_type=prediction_type, use_ode=True)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 3, 2, 2)).astype(np.float32)
    out = rng.normal(size=(1, 3, 2, 2)).astype(np.float32)
    t = 1.0
    got = np.asarray(sched.step(jnp.asarray(out), jnp.asarray(t, np.float32),
                                jnp.asarray(t - 1.56 / 50, np.float32), jnp.asarray(x)))
    beta, s, c = 2 * np.tan(t), np.sin(t), np.cos(t)
    dt = 1.56 / 50
    if prediction_type == "sample":
        x0 = out
    elif prediction_type == "epsilon":
        x0 = (x - s * out) / c
    else:
        x0 = c * x - s * out
    score = -(x - c * x0) / s ** 2
    want = x + 0.5 * (x + score) * beta * dt
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_continuous_sde_step_noise_term():
    sched = ContinuousTimeScheduler(use_ode=False)
    x = jnp.ones((1, 2, 2, 2), jnp.float32)
    out = jnp.zeros_like(x)
    noise = jnp.ones_like(x)
    t = jnp.asarray(1.0, jnp.float32)
    got = sched.step(out, t, t - sched.t_max / 50, x, noise=noise)
    beta = 2 * np.tan(1.0)
    dt = sched.t_max / 50
    x0 = 1.0 / np.cos(1.0)
    score = -(1.0 - np.cos(1.0) * x0) / np.sin(1.0) ** 2
    want = 1.0 + (0.5 * 1.0 + score) * beta * dt + np.sqrt(beta * dt) * 1.0
    np.testing.assert_allclose(np.asarray(got), np.full_like(np.asarray(got), want), rtol=1e-4)


def test_continuous_step_requires_noise_for_sde():
    sched = ContinuousTimeScheduler(use_ode=False)
    x = jnp.ones((1, 2, 2, 2))
    with pytest.raises(ValueError):
        sched.step(x, jnp.asarray(1.0), jnp.asarray(0.9), x, noise=None)


def test_ddim_timesteps_clamped_to_train_range():
    """steps_offset can push the top step to num_train_timesteps; it must be
    clipped (diffusers behavior) instead of silently clamping the alpha index
    inside jit (ADVICE r1)."""
    sched = DDIMScheduler(num_train_timesteps=10, steps_offset=1)
    ts, _ = sched.timesteps(10)
    assert ts.max() == 9
    assert ts.min() >= 0


# ---------------- DPM-Solver++(2M) / Euler (schedulers/dpm.py) ----------------


@pytest.mark.parametrize("prediction_type", ["epsilon", "sample", "v_prediction"])
def test_dpm_first_order_step_equals_ddim(prediction_type):
    """Exactness anchor: a first-order DPM-Solver++ step IS a DDIM (eta=0)
    step — both move x along alpha_prev*x0 + sigma_prev*eps."""
    dpm = DPMSolverMultistepScheduler(prediction_type=prediction_type)
    ddim = DDIMScheduler(prediction_type=prediction_type)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    out = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    t, tp = jnp.asarray(981), jnp.asarray(961)  # interior step
    np.testing.assert_allclose(np.asarray(dpm.step(out, t, tp, x)),
                               np.asarray(ddim.step(out, t, tp, x)),
                               rtol=1e-4, atol=1e-5)


def test_dpm_timestep_grid_matches_ddim():
    dpm = DPMSolverMultistepScheduler()
    ddim = DDIMScheduler()
    for n in (10, 25, 50):
        ts_d, tp_d = dpm.timesteps(n)
        ts_r, tp_r = ddim.timesteps(n)
        np.testing.assert_array_equal(ts_d, ts_r)
        np.testing.assert_array_equal(tp_d, tp_r)


def test_dpm_multistep_oracle_recovers_x0():
    """With the exact epsilon oracle for a fixed x0, the 2M scan trajectory
    terminates at x0 (terminal alpha_bar -> 1) in only 10 steps."""
    sched = DPMSolverMultistepScheduler()
    abar = sched.alphas_cumprod
    x0 = jnp.asarray(np.random.default_rng(8).normal(size=(1, 4, 2, 2))
                     .astype(np.float32))
    eps = jnp.asarray(np.random.default_rng(9).normal(size=x0.shape)
                      .astype(np.float32))
    ts, tps = sched.timesteps(10)
    n = len(ts)
    x = jnp.sqrt(abar[int(ts[0])]) * x0 + jnp.sqrt(1 - abar[int(ts[0])]) * eps

    def body(carry, xs):
        x, state = carry
        i, t, tp = xs
        a_t = abar[t]
        oracle = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        x, state = sched.step_with_state(oracle, t, tp, x, state, i, n)
        return (x, state), None

    (x_final, _), _ = jax.lax.scan(
        body, (x, sched.init_state(x)),
        (jnp.arange(n), jnp.asarray(ts), jnp.asarray(tps)))
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def _gaussian_oracle_run(sched, num_steps, multistep, c2=4.0, seed=11):
    """Sample with the exact posterior-mean epsilon model for x0~N(0, c2):
    eps*(x,t) = (x - a*E[x0|x]) / s,  E[x0|x] = a*c2/(a^2 c2 + s^2) * x.
    The PF-ODE for this score is nonlinear in lambda-space integration, so
    solver order actually matters."""
    abar = sched.alphas_cumprod
    ts, tps = sched.timesteps(num_steps)
    n = len(ts)
    x = jnp.asarray(np.random.default_rng(seed).normal(size=(1, 4, 2, 2))
                    .astype(np.float32))  # x_T ~ N(0,1) approx

    def oracle(x, t):
        a2 = abar[t]
        a, s2 = jnp.sqrt(a2), 1.0 - a2
        x0_hat = a * c2 / (a2 * c2 + s2) * x
        return (x - a * x0_hat) / jnp.sqrt(s2)

    if multistep:
        def body(carry, xs):
            x, state = carry
            i, t, tp = xs
            x, state = sched.step_with_state(oracle(x, t), t, tp, x, state,
                                             i, n)
            return (x, state), None
        (xf, _), _ = jax.lax.scan(body, (x, sched.init_state(x)),
                                  (jnp.arange(n), jnp.asarray(ts),
                                   jnp.asarray(tps)))
    else:
        def body(x, t_pair):
            t, tp = t_pair
            return sched.step(oracle(x, t), t, tp, x), None
        xf, _ = jax.lax.scan(body, x, (jnp.asarray(ts), jnp.asarray(tps)))
    return np.asarray(xf)


def test_dpm_second_order_beats_first_order():
    """Order pin: vs a 1000-step fine-grid reference on the Gaussian-prior
    oracle, 10-step DPM++(2M) lands closer than 10-step first-order DDIM."""
    ref = _gaussian_oracle_run(DDIMScheduler(), 1000, multistep=False)
    dpm10 = _gaussian_oracle_run(DPMSolverMultistepScheduler(), 10,
                                 multistep=True)
    ddim10 = _gaussian_oracle_run(DDIMScheduler(), 10, multistep=False)
    err_dpm = np.abs(dpm10 - ref).max()
    err_ddim = np.abs(ddim10 - ref).max()
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    assert err_dpm < 0.05 * np.abs(ref).max()


def test_euler_one_step_oracle_recovers_x0():
    """Exactness anchor: sigma-space x = x0 + sigma*eps; one Euler step to
    sigma=0 with the exact epsilon returns x0 exactly."""
    sched = EulerDiscreteScheduler()
    rng = np.random.default_rng(12)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 2, 2)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t = jnp.asarray(981)
    sigma = sched._sigma(t)
    x = x0 + sigma * eps
    got = sched.step(eps, t, jnp.asarray(-19), x)  # t_prev<0 => sigma 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(x0),
                               rtol=1e-4, atol=1e-4)


def test_euler_scale_model_input_is_vp_xt():
    """Feeding x/sqrt(sigma^2+1) to the model reproduces the VP x_t the UNet
    was trained on: sqrt(abar)*x0 + sqrt(1-abar)*eps."""
    sched = EulerDiscreteScheduler()
    abar = np.asarray(sched.alphas_cumprod)
    rng = np.random.default_rng(13)
    x0 = rng.normal(size=(1, 4, 2, 2)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = 501
    sigma = float(np.sqrt((1 - abar[t]) / abar[t]))
    x = jnp.asarray(x0 + sigma * eps)
    got = np.asarray(sched.scale_model_input(x, jnp.asarray(t)))
    want = np.sqrt(abar[t]) * x0 + np.sqrt(1 - abar[t]) * eps
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_euler_init_sigma_uses_inference_grid():
    """x_T must be scaled by sigma at the INFERENCE grid's first timestep
    (what the first scale_model_input/step assume), not the full grid's
    sigma(999) — at 20 steps those differ by 1.33x."""
    sched = EulerDiscreteScheduler()
    abar = np.asarray(sched.alphas_cumprod)

    def sig(t):
        return float(np.sqrt((1 - abar[t]) / abar[t]))

    ts20, _ = sched.timesteps(20)
    np.testing.assert_allclose(sched.init_sigma(20), sig(int(ts20[0])),
                               rtol=1e-5)
    assert int(ts20[0]) == 951
    # the plain property is the full-grid value (steps == train steps)
    np.testing.assert_allclose(sched.init_noise_sigma, sig(999), rtol=1e-5)
    assert sched.init_sigma(20) < sched.init_noise_sigma


def test_noise_to_closed_forms():
    """img2img entry: noise_to works in each sampler's own space — VP
    (sqrt(abar) x0 + sqrt(1-abar) eps) for DDIM/DPM++, sigma space
    (x0 + sigma eps) for Euler."""
    rng = np.random.default_rng(16)
    x0 = rng.normal(size=(1, 4, 2, 2)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = 501
    abar = _np_alphas_cumprod()
    vp_want = np.sqrt(abar[t]) * x0 + np.sqrt(1 - abar[t]) * eps
    for sched in (DDIMScheduler(), DPMSolverMultistepScheduler()):
        got = sched.noise_to(jnp.asarray(x0), jnp.asarray(eps),
                             jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(got), vp_want, rtol=1e-4,
                                   atol=1e-5)
    sigma = float(np.sqrt((1 - abar[t]) / abar[t]))
    got = EulerDiscreteScheduler().noise_to(jnp.asarray(x0), jnp.asarray(eps),
                                            jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), x0 + sigma * eps, rtol=1e-4,
                               atol=1e-4)


def test_dpm_terminal_step_returns_denoised():
    """Terminal convention: DPM++ integrates to sigma=0 (diffusers appends
    sigma 0), so the final first-order step with an epsilon input lands on
    the denoised prediction exactly — unlike DDIM(set_alpha_to_one=False),
    which retains sqrt(1-abar[0]) of eps."""
    sched = DPMSolverMultistepScheduler()
    abar = np.asarray(sched.alphas_cumprod)
    rng = np.random.default_rng(14)
    x0 = rng.normal(size=(1, 4, 2, 2)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = 1
    x = np.sqrt(abar[t]) * x0 + np.sqrt(1 - abar[t]) * eps
    got = sched.step(jnp.asarray(eps), jnp.asarray(t), jnp.asarray(-19),
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), x0, rtol=1e-3, atol=1e-4)


def test_dpm_lower_order_final_gated_on_short_runs():
    """diffusers gate: the terminal step drops to first order only when
    num_steps < 15; at 15+ the second-order correction stays on."""
    sched = DPMSolverMultistepScheduler()
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.normal(size=(1, 4, 2, 2)).astype(np.float32))
    out = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    prev_x0 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    state = (prev_x0, jnp.asarray(-1.0, jnp.float32))
    t, tp = jnp.asarray(41), jnp.asarray(21)
    # same (t, tp, state): only the (step_index, num_steps) gate differs
    short, _ = sched.step_with_state(out, t, tp, x, state, 9, 10)
    long_, _ = sched.step_with_state(out, t, tp, x, state, 19, 20)
    first_order, _ = sched.step_with_state(out, t, tp, x,
                                           sched.init_state(x), 0, 20)
    # short-run terminal == first order; long-run terminal keeps 2nd order
    np.testing.assert_allclose(np.asarray(short), np.asarray(first_order),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(long_) - np.asarray(short)).max() > 1e-4


def test_zero_terminal_snr_rescale():
    """Lin et al. 2023 (arXiv:2305.08891 alg. 1): the rescaled alpha-bar
    table has EXACTLY zero terminal SNR (abar[-1] == 0, the model truly
    sees pure noise at t=T) while the first step keeps its alpha-bar; the
    default table keeps its leftover signal (the artifact being fixed)."""
    from diffusion_tpu.schedulers.ddpm import alphas_cumprod_np
    plain = alphas_cumprod_np("scaled_linear", 1000, 0.00085, 0.012)
    fixed = alphas_cumprod_np("scaled_linear", 1000, 0.00085, 0.012,
                              rescale_zero_terminal_snr=True)
    assert plain[-1] > 1e-4                      # leftover signal
    assert abs(fixed[-1]) < 1e-12                # exactly zero SNR
    np.testing.assert_allclose(fixed[0], plain[0], rtol=1e-12)
    assert np.all(np.diff(fixed) < 0)            # still monotone decreasing


def test_zero_terminal_snr_sampler_guards():
    """The rescaled schedule is only samplable by DDIM with a non-epsilon
    parameterization: epsilon-DDIM and the sigma/lambda-space samplers
    reject it loudly instead of dividing by zero."""
    from diffusion_tpu.schedulers import (DDIMScheduler,
                                          DPMSolverMultistepScheduler,
                                          EulerDiscreteScheduler)
    ok = DDIMScheduler(prediction_type="v_prediction",
                       rescale_betas_zero_snr=True,
                       timestep_spacing="trailing")
    assert float(ok.alphas_cumprod[-1]) == 0.0
    # trailing spacing actually SAMPLES the zero-SNR step the rescale made
    ts, _ = ok.timesteps(50)
    assert ts[0] == 999
    with pytest.raises(ValueError, match="v_prediction"):
        DDIMScheduler(rescale_betas_zero_snr=True,
                      timestep_spacing="trailing")  # epsilon default
    with pytest.raises(ValueError, match="trailing"):
        DDIMScheduler(prediction_type="v_prediction",
                      rescale_betas_zero_snr=True)  # leading default
    with pytest.raises(ValueError, match="DDIM"):
        EulerDiscreteScheduler(prediction_type="v_prediction",
                               rescale_betas_zero_snr=True)
    with pytest.raises(ValueError, match="DDIM"):
        DPMSolverMultistepScheduler(prediction_type="v_prediction",
                                    rescale_betas_zero_snr=True)


def test_timestep_spacing_trailing_grid():
    """diffusers timestep_spacing parity: leading anchors low (SD2 default,
    top step 981 at 50 steps), trailing anchors at t=T-1 (arXiv:2305.08891
    "Sample from the Last Timestep")."""
    from diffusion_tpu.schedulers.ddpm import uniform_timestep_grid
    lead, lead_prev = uniform_timestep_grid(1000, 50, 1, "leading")
    trail, trail_prev = uniform_timestep_grid(1000, 50, 1, "trailing")
    assert lead[0] == 981 and lead[-1] == 1
    assert trail[0] == 999 and trail[-1] == 19
    assert len(trail) == 50 and np.all(np.diff(trail) < 0)
    assert trail_prev[-1] < 0          # terminal step is still "final"
    with pytest.raises(ValueError, match="leading or trailing"):
        uniform_timestep_grid(1000, 50, 1, "nope")
