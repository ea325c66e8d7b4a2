"""Trainer end-to-end on the 8-device virtual CPU mesh: fit, grad-accum,
FSDP sharding, EMA swap invariants, checkpoint/autoresume.

Compile cost dominates on this 1-core host, so one module-scoped trained
trainer backs most assertions; only behaviors that need a different
configuration build their own."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tpu.algorithms.ema import EMA
from diffusion_tpu.train.events import Callback, Event
from diffusion_tpu.train.optim import adamw, multi_step_with_warmup
from diffusion_tpu.train.trainer import Evaluator, Trainer
from tests.common import tiny_stable_diffusion

BSZ = 8
SIZE = 32


def make_loader(n_batches=4, bsz=BSZ, size=SIZE, seed=0):
    rng = np.random.default_rng(seed)
    return [{
        "image": rng.uniform(-1, 1, (bsz, size, size, 3)).astype(np.float32),
        "captions": rng.integers(0, 500, (bsz, 77)).astype(np.int32),
    } for _ in range(n_batches)]


class Recorder(Callback):
    def __init__(self):
        self.events = []

    def run_event(self, event, state, logger):
        self.events.append(event)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One trainer: EMA, fsdp-sharded (min_params=0), evaluator, 6 batches,
    checkpoints every 3."""
    save = str(tmp_path_factory.mktemp("ckpts"))
    recorder = Recorder()
    tr = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(),
        eval_dataloader=[Evaluator("cocoval", make_loader(n_batches=2, bsz=4),
                                   ("MeanSquaredError",))],
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba", update_interval="1ba", ema_start="0ba")],
        callbacks=[recorder],
        max_duration="6ba",
        image_size=SIZE,
        save_folder=save,
        save_interval="3ba",
        eval_interval="0ba",
        fsdp_config={"min_params": 0},
    )
    tr.fit()
    eval_results = tr.eval()
    return tr, recorder, save, eval_results


@pytest.mark.slow
def test_fit_counts_time(trained):
    tr, _, _, _ = trained
    assert tr.state.timestamp.batch == 6
    assert tr.state.timestamp.sample == 6 * BSZ
    assert int(np.asarray(tr.train_state.step)) == 6
    assert np.isfinite(float(np.asarray(tr.state.loss)))


@pytest.mark.slow
def test_params_sharded_over_fsdp(trained):
    tr, _, _, _ = trained
    assert tr.mesh.shape["fsdp"] == 8
    specs = [l.sharding.spec for l in jax.tree.leaves(tr.train_state.params)
             if hasattr(l, "sharding")]
    assert any("fsdp" in str(s) for s in specs), "no parameter sharded over fsdp"
    fspecs = [l.sharding.spec for l in jax.tree.leaves(tr.frozen)]
    assert all("fsdp" not in str(s) for s in fspecs)  # frozen replicated


@pytest.mark.slow
def test_ema_tracks_and_swaps(trained):
    tr, _, _, _ = trained
    ts = tr.train_state
    assert ts.ema_params is not None
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     ts.params, ts.ema_params)
    assert max(jax.tree.leaves(d)) > 0  # EMA differs from raw after steps

    ema = tr.ema_algorithm
    p_before = jax.tree.leaves(ts.params)[0]
    ema.swap_in(tr.state)
    assert ema.ema_weights_active
    ema.swap_out(tr.state)
    p_after = jax.tree.leaves(tr.state.train_state.params)[0]
    np.testing.assert_array_equal(np.asarray(p_before), np.asarray(p_after))


@pytest.mark.slow
def test_eval_loop_mse(trained):
    _, _, _, results = trained
    key = "metrics/cocoval/MeanSquaredError"
    assert key in results and np.isfinite(results[key])


@pytest.mark.slow
def test_event_ordering(trained):
    _, recorder, _, _ = trained
    events = recorder.events
    assert events[0] == Event.INIT
    assert Event.FIT_START in events and Event.FIT_END in events
    bs = events.index(Event.BATCH_START)
    assert events[bs - 1] == Event.AFTER_DATALOADER
    assert events.index(Event.BATCH_END) > bs
    # EMA swapped around eval
    assert Event.EVAL_START in events and Event.EVAL_END in events


@pytest.mark.slow
def test_checkpoints_written(trained):
    _, _, save, _ = trained
    names = sorted(os.listdir(save))
    assert "ba3" in names and "ba6" in names
    assert os.path.exists(os.path.join(save, "ba6", "meta.json"))


def test_async_checkpoint_marker_semantics(tmp_path):
    """wait=False returns before the completeness marker exists (the disk
    write overlaps training); the marker is written only by finalize — so a
    crash mid-write leaves an unmarked dir autoresume skips — and every
    discovery/load path finalizes first."""
    from diffusion_tpu.train import checkpoint as ckpt

    state = {"params": {"w": jnp.arange(8.0)},
             "step": jnp.zeros((), jnp.int32)}
    folder = str(tmp_path)
    p1 = ckpt.save_checkpoint(folder, 1, state, {"n": 1}, wait=False)
    assert not os.path.exists(os.path.join(p1, "meta.json"))
    assert ckpt.latest_checkpoint_path(folder) == p1  # finalizes in-flight
    assert os.path.exists(os.path.join(p1, "meta.json"))

    p2 = ckpt.save_checkpoint(folder, 2, state, {"n": 2}, wait=False)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored, meta = ckpt.load_checkpoint(p2, abstract)  # finalizes too
    assert meta == {"n": 2}
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(8.0))


def test_prune_checkpoints_retention(tmp_path):
    """save_num_checkpoints_to_keep semantics: oldest complete dirs are
    deleted down to the budget; the in-flight async save counts as newest
    without being blocked on; unmarked (crashed) dirs are never touched."""
    from diffusion_tpu.train import checkpoint as ckpt

    state = {"w": jnp.arange(4.0)}
    folder = str(tmp_path)
    for ba in (1, 2, 3):
        ckpt.save_checkpoint(folder, ba, state, {"n": ba})
    os.makedirs(os.path.join(folder, "ba99", "state"))  # crashed write
    ckpt.prune_checkpoints(folder, keep=2)
    assert sorted(d for d in os.listdir(folder) if d.startswith("ba")) == [
        "ba2", "ba3", "ba99"]

    # async save in flight: counts toward the budget, survives pruning
    ckpt.save_checkpoint(folder, 4, state, {"n": 4}, wait=False)
    ckpt.prune_checkpoints(folder, keep=2)
    ckpt.finalize_pending()
    assert ckpt.latest_checkpoint_path(folder).endswith("ba4")
    assert not os.path.exists(os.path.join(folder, "ba2"))
    assert os.path.exists(os.path.join(folder, "ba3", "meta.json"))

    ckpt.prune_checkpoints(folder, keep=-1)  # keep-all is a no-op
    assert os.path.exists(os.path.join(folder, "ba3"))

    # keep=1 durability window: while a save is UNMARKED, the newest
    # complete dir must survive (else a crash leaves zero resumable ckpts)
    ckpt.save_checkpoint(folder, 5, state, {"n": 5}, wait=False)
    ckpt.prune_checkpoints(folder, keep=1)
    assert os.path.exists(os.path.join(folder, "ba4", "meta.json"))
    ckpt.finalize_pending()
    ckpt.prune_checkpoints(folder, keep=1)  # now ba4 ages out
    assert not os.path.exists(os.path.join(folder, "ba4"))
    assert os.path.exists(os.path.join(folder, "ba5", "meta.json"))


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits(tmp_path):
    """A SIGTERM mid-fit (pod preemption notice) stops the step loop at the
    next batch boundary, writes a durable checkpoint at that batch, and a
    fresh autoresume trainer continues to completion from it."""
    import signal as _signal

    class Preemptor(Callback):
        def run_event(self, event, state, logger):
            if event == Event.BATCH_END and state.timestamp.batch == 2:
                os.kill(os.getpid(), _signal.SIGTERM)

    save = str(tmp_path / "ckpts")

    def build(cbs=()):
        return Trainer(
            model=tiny_stable_diffusion(),
            train_dataloader=make_loader(n_batches=8),
            optimizers=adamw(lr=1e-3),
            callbacks=list(cbs),
            max_duration="6ba",
            image_size=SIZE,
            save_folder=save,
            save_interval="100ba",
            eval_interval="0ba",
            autoresume=True,
            fsdp_config={"min_params": 0},
        )

    tr = build([Preemptor()])
    tr.fit()  # returns instead of dying mid-write
    assert tr.state.timestamp.batch == 2
    assert os.path.exists(os.path.join(save, "ba2", "meta.json"))

    resumed = build()
    assert resumed.state.timestamp.batch == 2  # picked up the preempt ckpt
    resumed.fit()
    assert resumed.state.timestamp.batch == 6


@pytest.mark.slow
def test_remote_checkpoint_mirror_and_resume(tmp_path):
    """save_remote mirrors each finalized checkpoint to an object-store URI
    (local-path backend here); a fresh host with an EMPTY local save_folder
    autoresumes from the remote copy (sync_from_remote downloads, marker
    last)."""
    from diffusion_tpu.train import checkpoint as ckpt

    local = str(tmp_path / "local")
    remote = str(tmp_path / "bucket" / "run1")
    state = {"w": jnp.arange(6.0), "step": jnp.zeros((), jnp.int32)}
    ckpt.save_checkpoint(local, 3, state, {"n": 3}, wait=False, remote=remote)
    ckpt.finalize_pending()
    ckpt.drain_remote_uploads()
    assert os.path.exists(os.path.join(remote, "ba3", "meta.json"))

    fresh = str(tmp_path / "fresh_host")
    got = ckpt.sync_from_remote(fresh, remote)
    assert got == os.path.join(fresh, "ba3")
    assert ckpt.latest_checkpoint_path(fresh) == got
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored, meta = ckpt.load_checkpoint(got, abstract)
    assert meta == {"n": 3}
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(6.0))
    # already current -> no re-download
    assert ckpt.sync_from_remote(fresh, remote) is None


@pytest.mark.slow
def test_skip_nonfinite_updates_guards_params():
    """A poisoned batch (NaN pixels -> NaN loss/grads) leaves params,
    moments, and EMA untouched and reports the skip; a clean batch still
    updates."""
    tr = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(),
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba", update_interval="1ba",
                        ema_start="0ba")],
        max_duration="4ba",
        image_size=SIZE,
        eval_interval="0ba",
        skip_nonfinite_updates=True,
        fsdp_config={"min_params": 0},
    )
    step = tr._train_step_for(BSZ)
    loader = make_loader(n_batches=1)
    clean = {k: jnp.asarray(v) for k, v in loader[0].items()}
    poisoned = dict(clean)
    poisoned["image"] = clean["image"].at[0, 0, 0, 0].set(jnp.nan)

    from diffusion_tpu.train.trainer import make_global_batch
    before = jax.tree.map(lambda x: np.asarray(x), tr.train_state.params)
    ts, metrics = step(tr.train_state,
                       make_global_batch(poisoned, tr.mesh))
    assert float(np.asarray(metrics["trainer/nonfinite_skipped"])) == 1.0
    after = jax.tree.map(lambda x: np.asarray(x), ts.params)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    # EMA untouched on the skip too
    for e, p in zip(jax.tree.leaves(
            jax.tree.map(lambda x: np.asarray(x), ts.ema_params)),
            jax.tree.leaves(after)):
        np.testing.assert_array_equal(e, p)  # ema init == params, unchanged

    ts2, metrics2 = step(ts, make_global_batch(clean, tr.mesh))
    assert float(np.asarray(metrics2["trainer/nonfinite_skipped"])) == 0.0
    changed = any(
        not np.array_equal(b, np.asarray(a)) for b, a in zip(
            jax.tree.leaves(before), jax.tree.leaves(ts2.params)))
    assert changed


@pytest.mark.slow
def test_bucket_save_folder_splits_into_stage_plus_remote():
    """Composer drop-in parity: save_folder may be a bucket URI; the trainer
    stages locally and mirrors to the bucket."""
    tr = Trainer(model=tiny_stable_diffusion(), max_duration="1ba",
                 image_size=SIZE, save_folder="s3://bucket/run/ckpts",
                 run_name="bucket-split-test")
    assert tr.save_remote == "s3://bucket/run/ckpts"
    assert not tr.save_folder.startswith("s3://")
    assert "bucket-split-test" in tr.save_folder


@pytest.mark.slow
def test_trainer_autoresume_from_remote_only(tmp_path):
    """End-to-end: train with save_remote, lose the local folder entirely,
    autoresume on a 'new host' — the trainer pulls the remote checkpoint."""
    remote = str(tmp_path / "bucket")

    def build(folder):
        return Trainer(
            model=tiny_stable_diffusion(),
            train_dataloader=make_loader(),
            optimizers=adamw(lr=1e-3),
            max_duration="2ba",
            image_size=SIZE,
            save_folder=folder,
            save_remote=remote,
            save_interval="2ba",
            eval_interval="0ba",
            autoresume=True,
            fsdp_config={"min_params": 0},
        )

    tr = build(str(tmp_path / "host_a"))
    tr.fit()
    assert os.path.exists(os.path.join(remote, "ba2", "meta.json"))

    tr2 = build(str(tmp_path / "host_b"))  # empty local save_folder
    assert tr2.state.timestamp.batch == 2  # resumed from the remote mirror


@pytest.mark.slow
def test_autoresume_and_load_weights_only(trained):
    tr, _, save, _ = trained
    # autoresume picks up ba6 and continues to 8
    tr2 = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(),
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba")],
        max_duration="8ba", image_size=SIZE,
        save_folder=save, save_interval="100ba", eval_interval="0ba",
        fsdp_config={"min_params": 0},
        autoresume=True,
    )
    assert tr2.state.timestamp.batch == 6
    # training weights restored (checkpoint stored EMA-active, swapped back)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(tr2.train_state.params)[0]),
        np.asarray(jax.tree.leaves(tr.train_state.params)[0]), rtol=1e-6)
    tr2.fit()
    assert tr2.state.timestamp.batch == 8

    # load_weights_only: params come over, time does not
    tr3 = Trainer(
        model=tiny_stable_diffusion(),
        optimizers=adamw(lr=1e-3), max_duration="1ba", image_size=SIZE,
        load_path=os.path.join(save, "ba6"), load_weights_only=True,
        fsdp_config={"min_params": 0},
    )
    assert tr3.state.timestamp.batch == 0
    # ba6 checkpoint holds EMA weights in the params slot (reference
    # semantics: checkpoints are written with EMA swapped in)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(tr3.train_state.params)[0]),
        np.asarray(jax.tree.leaves(tr.train_state.ema_params)[0]), rtol=1e-6)


@pytest.mark.slow
def test_grad_accumulation_runs():
    # micro size 1/device on 8 devices => bsz 16 -> 2 accumulation steps
    tr = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(bsz=16),
        optimizers=adamw(lr=1e-3),
        max_duration="2ba", image_size=SIZE,
        device_train_microbatch_size=1, eval_interval="0ba",
    )
    tr.fit()
    assert tr.state.timestamp.batch == 2
    assert np.isfinite(float(np.asarray(tr.state.loss)))


@pytest.mark.slow
def test_ema_before_start_tracks_params_exactly():
    tr = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(),
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba", ema_start="100ba")],
        max_duration="3ba", image_size=SIZE, eval_interval="0ba",
    )
    tr.fit()
    ts = tr.train_state
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     ts.params, ts.ema_params)
    assert max(jax.tree.leaves(d)) == 0  # smoothing 0 => ema == params


@pytest.mark.slow
def test_single_device_plain_path(tmp_path):
    """mesh.size == 1 uses plain (non-SPMD) executables end-to-end,
    including checkpoint save/restore."""
    from diffusion_tpu.parallel.mesh import create_mesh
    mesh1 = create_mesh(fsdp=1, data=1, dcn=1, devices=jax.devices()[:1])
    tr = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(n_batches=2),
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba")],
        max_duration="2ba", image_size=SIZE, mesh=mesh1,
        save_folder=str(tmp_path), save_interval="2ba", eval_interval="0ba",
    )
    assert tr._plain
    tr.fit()
    assert tr.state.timestamp.batch == 2
    tr2 = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(n_batches=2),
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba")],
        max_duration="3ba", image_size=SIZE, mesh=mesh1,
        save_folder=str(tmp_path), save_interval="100ba", eval_interval="0ba",
        autoresume=True,
    )
    assert tr2.state.timestamp.batch == 2
    tr2.fit()
    assert tr2.state.timestamp.batch == 3


def test_multistep_warmup_lr_schedule():
    sched = multi_step_with_warmup("4ba", ["8ba"], gamma=0.1,
                                   max_duration="10ba")
    assert float(sched(0)) == 0.0
    assert abs(float(sched(2)) - 0.5) < 1e-6
    assert float(sched(4)) == 1.0
    assert abs(float(sched(9)) - 0.1) < 1e-6


def test_interrupted_overwrite_not_autoresumed(tmp_path, monkeypatch):
    """Crash mid-overwrite must not leave a complete-looking checkpoint:
    meta.json (the completeness marker) is deleted before the old state is,
    so autoresume skips the half-written dir (VERDICT r1 #7)."""
    import shutil

    from diffusion_tpu.train import checkpoint as ckpt

    state = {"w": np.zeros((2,), np.float32)}
    folder = str(tmp_path / "ckpts")
    path = ckpt.save_checkpoint(folder, 5, state)
    assert ckpt.latest_checkpoint_path(folder) == path

    real_rmtree = shutil.rmtree

    def exploding_rmtree(p, *a, **k):
        real_rmtree(p, *a, **k)
        raise RuntimeError("simulated crash after state cleanup")

    monkeypatch.setattr(ckpt.shutil, "rmtree", exploding_rmtree)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ckpt.save_checkpoint(folder, 5, state)
    # marker gone first => discovery skips the partial dir
    assert ckpt.latest_checkpoint_path(folder) is None


def test_grad_accum_steps_ceil_semantics():
    """Microbatches never exceed device_train_microbatch_size * n_devices
    (Composer ceil semantics) and always divide the global batch evenly
    (lax.scan needs uniform shapes). The old floor division handed a
    1.5x-cap microbatch to the device (768/512) or reshape-crashed (100/32)."""
    from diffusion_tpu.train.trainer import grad_accum_steps
    for global_batch, micro_global in [(768, 512), (100, 32), (40, 16),
                                       (8, 16), (2048, 128), (10, 3),
                                       (101, 32)]:
        n = grad_accum_steps(global_batch, micro_global)
        assert global_batch % n == 0, (global_batch, micro_global, n)
        assert global_batch // n <= micro_global, (global_batch,
                                                   micro_global, n)
    assert grad_accum_steps(2048, 128) == 16   # exact multiple unchanged
    assert grad_accum_steps(768, 512) == 2     # ceil, not floor(=1)
    assert grad_accum_steps(8, 16) == 1        # batch under the cap


@pytest.mark.slow
def test_load_weights_only_reseeds_ema(trained):
    """load_weights_only must re-copy the LOADED params into ema_params —
    otherwise the EMA starts as the discarded random init and poisons
    EMA-active checkpoints for ~half_life batches (review finding)."""
    from diffusion_tpu.train import checkpoint as ckpt
    _, _, save, _ = trained
    latest = ckpt.latest_checkpoint_path(save)
    tr2 = Trainer(
        model=tiny_stable_diffusion(),
        train_dataloader=make_loader(),
        optimizers=adamw(lr=1e-3),
        algorithms=[EMA(half_life="2ba", update_interval="1ba",
                        ema_start="0ba")],
        max_duration="1ba", image_size=SIZE,
        load_path=latest, load_weights_only=True,
        fsdp_config={"min_params": 0},
    )
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     tr2.train_state.params, tr2.train_state.ema_params)
    assert max(jax.tree.leaves(d)) == 0.0


@pytest.mark.slow
def test_rerun_of_complete_fit_is_a_noop(tmp_path):
    """Autoresume restoring AT max_duration must not re-save the final
    checkpoint: save_overwrite=False would crash, True would delete-and-
    rewrite the only final checkpoint (durability hole if preempted)."""
    from diffusion_tpu.train import checkpoint as ckpt
    save = str(tmp_path / "ckpts")
    kw = dict(model=tiny_stable_diffusion(), optimizers=adamw(lr=1e-3),
              max_duration="2ba", image_size=SIZE, save_folder=save,
              save_interval="1ba", autoresume=True)
    Trainer(train_dataloader=make_loader(n_batches=2), **kw).fit()
    latest = ckpt.latest_checkpoint_path(save)
    assert latest.endswith("ba2")
    mtime = os.path.getmtime(os.path.join(latest, "meta.json"))
    tr2 = Trainer(train_dataloader=make_loader(n_batches=2),
                  save_overwrite=False, **kw)
    tr2.fit()  # restored at ba2 == max: no steps, and no re-save
    assert ckpt.latest_checkpoint_path(save) == latest
    assert os.path.getmtime(os.path.join(latest, "meta.json")) == mtime


class _IndexedDataset:
    """Tiny map-style dataset with the StreamingDataset loader contract."""

    def __init__(self, n=16, size=SIZE):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def partition(self, epoch, rank, world):
        return np.arange(self.n)[rank::world]

    def __getitem__(self, idx):
        rng = np.random.default_rng(int(idx))
        return {
            "image": rng.uniform(-1, 1, (self.size, self.size, 3))
                     .astype(np.float32),
            "captions": rng.integers(0, 500, (77,)).astype(np.int32),
        }


@pytest.mark.slow
def test_eval_scores_same_slice_every_time():
    """eval_subset_num_batches abandons the eval DataLoader mid-epoch; its
    resumable position (a TRAIN-loader autoresume feature) must not shift
    the window — every eval pass scores the same data (review finding)."""
    from diffusion_tpu.data.dataloader import DataLoader
    # big enough that the abandoned position does NOT wrap to a fresh epoch
    # (which would mask the drift on an epoch-independent partition)
    dl = DataLoader(_IndexedDataset(n=64), batch_size=8, num_workers=1)
    tr = Trainer(
        model=tiny_stable_diffusion(),
        eval_dataloader=[Evaluator("e", dl, ("MeanSquaredError",))],
        image_size=SIZE, max_duration="1ba",
        eval_subset_num_batches=1,
    )
    r1 = tr.eval()
    r2 = tr.eval()
    assert r1 == r2  # same slice + same per-batch rng => identical numbers
    tr.close()


@pytest.mark.slow
def test_eval_hooks_respect_evaluator_metric_names():
    """Per-evaluator metric_names select which generation-metric hooks run
    (reference train.py:48-59 composer Evaluators): an MSE-only evaluator
    must not pay for the sampling pass (review finding: metric_names was
    stored but never consulted)."""
    class FakeHook:
        metric_names = ("FrechetInceptionDistance",)

        def __init__(self):
            self.seen = []

        def eval_batch(self, trainer, evaluator, state, batch, rng):
            self.seen.append(evaluator.label)

        def eval_end(self, trainer, evaluator, state):
            return {f"metrics/{evaluator.label}/fake": 1.0}

    hook = FakeHook()
    tr = Trainer(
        model=tiny_stable_diffusion(),
        eval_dataloader=[
            Evaluator("mse-only", make_loader(n_batches=1, bsz=4),
                      ("MeanSquaredError",)),
            Evaluator("with-fid", make_loader(n_batches=1, bsz=4),
                      ("MeanSquaredError", "FrechetInceptionDistance")),
            Evaluator("everything", make_loader(n_batches=1, bsz=4)),
        ],
        image_size=SIZE, max_duration="1ba",
    )
    tr.metric_hooks = [hook]
    results = tr.eval()
    # the FID hook ran only where asked for (or where nothing was pinned)
    assert set(hook.seen) == {"with-fid", "everything"}
    assert "metrics/with-fid/fake" in results
    assert "metrics/mse-only/fake" not in results
