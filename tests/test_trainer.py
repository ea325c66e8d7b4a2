"""Trainer end-to-end on the 8-device virtual CPU mesh: fit, grad-accum,
FSDP sharding, EMA swap invariants, checkpoint/autoresume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tpu.algorithms.ema import EMA
from diffusion_tpu.parallel.mesh import create_mesh
from diffusion_tpu.train.events import Callback, Event
from diffusion_tpu.train.optim import adamw, multi_step_with_warmup
from diffusion_tpu.train.trainer import Evaluator, Trainer
from tests.common import tiny_stable_diffusion

BSZ = 8
SIZE = 32


def make_loader(n_batches=4, bsz=BSZ, size=SIZE, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        batches.append({
            "image": rng.uniform(-1, 1, (bsz, size, size, 3)).astype(np.float32),
            "captions": rng.integers(0, 500, (bsz, 77)).astype(np.int32),
        })
    return batches


def make_trainer(tmp_path=None, **kw):
    model = tiny_stable_diffusion()
    defaults = dict(
        model=model,
        train_dataloader=make_loader(),
        optimizers=adamw(lr=1e-3),
        max_duration="6ba",
        image_size=SIZE,
        save_folder=str(tmp_path) if tmp_path else None,
        save_interval="3ba",
        eval_interval="0ba",
    )
    defaults.update(kw)
    return Trainer(**defaults)


def test_fit_runs_and_counts_time():
    tr = make_trainer()
    tr.fit()
    assert tr.state.timestamp.batch == 6
    assert tr.state.timestamp.sample == 6 * BSZ
    assert int(np.asarray(tr.train_state.step)) == 6
    assert np.isfinite(float(np.asarray(tr.state.loss)))


def test_params_sharded_over_fsdp():
    tr = make_trainer(fsdp_config={"min_params": 0})
    mesh = tr.mesh
    assert mesh.shape["fsdp"] == 8
    specs = [l.sharding.spec for l in jax.tree.leaves(tr.train_state.params)
             if hasattr(l, "sharding")]
    assert any("fsdp" in str(s) for s in specs), "no parameter sharded over fsdp"
    # frozen towers replicated
    fspecs = [l.sharding.spec for l in jax.tree.leaves(tr.frozen)]
    assert all("fsdp" not in str(s) for s in fspecs)


def test_grad_accumulation_runs():
    # micro size 1 per device on 8 devices => 8-per-micro; bsz 16 => 2 accum steps
    tr = make_trainer(train_dataloader=make_loader(bsz=16),
                      device_train_microbatch_size=1, max_duration="2ba")
    tr.fit()
    assert tr.state.timestamp.batch == 2
    assert np.isfinite(float(np.asarray(tr.state.loss)))


def test_multistep_warmup_lr_schedule():
    sched = multi_step_with_warmup("4ba", ["8ba"], gamma=0.1,
                                   max_duration="10ba")
    assert float(sched(0)) == 0.0
    assert abs(float(sched(2)) - 0.5) < 1e-6
    assert float(sched(4)) == 1.0
    assert abs(float(sched(9)) - 0.1) < 1e-6


def test_ema_tracks_and_swaps():
    ema = EMA(half_life="2ba", update_interval="1ba", ema_start="0ba")
    tr = make_trainer(algorithms=[ema], max_duration="3ba")
    tr.fit()
    ts = tr.train_state
    assert ts.ema_params is not None
    # EMA differs from raw params after a few steps
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     ts.params, ts.ema_params)
    assert max(jax.tree.leaves(d)) > 0

    # swap invariant: in + out restores identity
    p_before = jax.tree.leaves(ts.params)[0]
    ema.swap_in(tr.state)
    assert ema.ema_weights_active
    ema.swap_out(tr.state)
    p_after = jax.tree.leaves(tr.state.train_state.params)[0]
    np.testing.assert_array_equal(np.asarray(p_before), np.asarray(p_after))


def test_ema_before_start_tracks_params_exactly():
    ema = EMA(half_life="2ba", ema_start="100ba")  # start far in the future
    tr = make_trainer(algorithms=[ema], max_duration="3ba")
    tr.fit()
    ts = tr.train_state
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     ts.params, ts.ema_params)
    assert max(jax.tree.leaves(d)) == 0  # smoothing 0 => ema == params


def test_checkpoint_save_and_autoresume(tmp_path):
    tr = make_trainer(tmp_path=tmp_path, algorithms=[EMA(half_life="2ba")])
    tr.fit()
    saved = sorted(os.listdir(tmp_path))
    assert "ba3" in saved and "ba6" in saved

    # autoresume: fresh trainer picks up ba6 and continues to 8
    tr2 = make_trainer(tmp_path=tmp_path, algorithms=[EMA(half_life="2ba")],
                       max_duration="8ba", autoresume=True)
    assert tr2.state.timestamp.batch == 6
    # restored params match saved EMA-active checkpoint swapped back:
    # training weights restored into params slot
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(tr2.train_state.params)[0]),
        np.asarray(jax.tree.leaves(tr.train_state.params)[0]), rtol=1e-6)
    tr2.fit()
    assert tr2.state.timestamp.batch == 8


def test_load_weights_only(tmp_path):
    tr = make_trainer(tmp_path=tmp_path)
    tr.fit()
    path = os.path.join(tmp_path, "ba6")
    tr3 = make_trainer(load_path=path, load_weights_only=True)
    assert tr3.state.timestamp.batch == 0  # time not restored
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(tr3.train_state.params)[0]),
        np.asarray(jax.tree.leaves(tr.train_state.params)[0]), rtol=1e-6)


def test_eval_loop_mse():
    model = tiny_stable_diffusion()
    ev = Evaluator("cocoval", make_loader(n_batches=2, bsz=4), ("MeanSquaredError",))
    tr = Trainer(model=model, train_dataloader=make_loader(),
                 eval_dataloader=[ev], optimizers=adamw(), max_duration="1ba",
                 image_size=SIZE, eval_interval="0ba")
    results = tr.eval()
    assert "metrics/cocoval/MeanSquaredError" in results
    assert np.isfinite(results["metrics/cocoval/MeanSquaredError"])


def test_event_ordering():
    events = []

    class Recorder(Callback):
        def run_event(self, event, state, logger):
            events.append(event)

    tr = make_trainer(callbacks=[Recorder()], max_duration="1ba")
    tr.fit()
    assert events[0] == Event.INIT
    assert Event.FIT_START in events and Event.FIT_END in events
    bs = events.index(Event.BATCH_START)
    assert events[bs - 1] == Event.AFTER_DATALOADER
    assert events.index(Event.BATCH_END) > bs
