"""EMA config math (reference ema.py:173-177 half-life -> smoothing) and the
traced smoothing gate."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tpu.algorithms.ema import EMA, apply_ema, ema_smoothing_for_step


def test_half_life_to_smoothing():
    assert abs(EMA(half_life="1000ba").smoothing() - 2 ** (-1 / 1000)) < 1e-12
    assert abs(EMA(half_life="100ba", update_interval="10ba").smoothing()
               - 2 ** (-10 / 100)) < 1e-12
    assert EMA(smoothing=0.97).smoothing() == 0.97


def test_half_life_must_be_batches():
    with pytest.raises(ValueError):
        EMA(half_life="2ep").smoothing()
    with pytest.raises(ValueError):
        EMA(update_interval="1ep")


def test_smoothing_gate():
    s = 0.9
    # before start: 0 (copy params)
    assert float(ema_smoothing_for_step(jnp.asarray(3), s, 10, 1)) == 0.0
    # after start, on interval: s
    assert abs(float(ema_smoothing_for_step(jnp.asarray(12), s, 10, 1)) - s) < 1e-6
    # after start, off interval (interval 4): 1 (hold)
    assert float(ema_smoothing_for_step(jnp.asarray(13), s, 10, 4)) == 1.0
    assert abs(float(ema_smoothing_for_step(jnp.asarray(16), s, 10, 4)) - s) < 1e-6


def test_apply_ema_formula():
    ema = {"w": jnp.asarray([1.0, 2.0])}
    params = {"w": jnp.asarray([3.0, 4.0])}
    out = apply_ema(ema, params, jnp.asarray(0.75))
    np.testing.assert_allclose(np.asarray(out["w"]),
                               0.75 * np.array([1, 2]) + 0.25 * np.array([3, 4]))
    # eff=0 copies params; eff=1 holds ema
    np.testing.assert_allclose(
        np.asarray(apply_ema(ema, params, jnp.asarray(0.0))["w"]), [3, 4])
    np.testing.assert_allclose(
        np.asarray(apply_ema(ema, params, jnp.asarray(1.0))["w"]), [1, 2])
