"""Time/Timestamp parsing and arithmetic."""

import pytest

from diffusion_tpu.utils.time import Time, TimeUnit, Timestamp, time_to_batches


def test_parse():
    assert Time.from_str("10000ba") == Time(10000, TimeUnit.BATCH)
    assert Time.from_str("200ep") == Time(200, TimeUnit.EPOCH)
    assert Time.from_str("0.5dur") == Time(0.5, TimeUnit.DURATION)
    assert Time.from_str(5) == Time(5, TimeUnit.BATCH)
    with pytest.raises(ValueError):
        Time.from_str("10 bananas")


def test_compare():
    assert Time.from_str("5ba") < Time.from_str("10ba")
    with pytest.raises(ValueError):
        _ = Time.from_str("5ba") < Time.from_str("5ep")


def test_timestamp_roundtrip():
    ts = Timestamp()
    ts.to_next_batch(samples=32)
    ts.to_next_batch(samples=32)
    ts.to_next_epoch()
    d = ts.state_dict()
    ts2 = Timestamp()
    ts2.load_state_dict(d)
    assert ts2.batch == 2 and ts2.sample == 64 and ts2.epoch == 1 and ts2.batch_in_epoch == 0


def test_time_to_batches():
    assert time_to_batches("10000ba", "550000ba") == 10000
    assert time_to_batches("0.1dur", "550000ba") == 55000
    assert time_to_batches("2ep", "550000ba", batches_per_epoch=100) == 200
    with pytest.raises(ValueError):
        time_to_batches("2ep", "550000ba")


def test_epoch_milestones_without_length_are_skipped():
    """ADVICE r1 high: shipped yamls set milestones ['200ep']; with an unknown
    batches_per_epoch the milestone must be treated as unreachable, not raise."""
    from diffusion_tpu.train.optim import multi_step_with_warmup

    sched = multi_step_with_warmup("2ba", ["200ep"], gamma=0.1,
                                   max_duration="100ba", batches_per_epoch=0)
    assert float(sched(50)) == 1.0  # warmup done, no decay ever


def test_epoch_milestones_resolve_with_length():
    from diffusion_tpu.train.optim import multi_step_with_warmup

    sched = multi_step_with_warmup("0ba", ["2ep"], gamma=0.1,
                                   max_duration="100ba", batches_per_epoch=5)
    assert float(sched(9)) == 1.0
    assert abs(float(sched(10)) - 0.1) < 1e-6


def test_bare_fractional_time_rejected():
    """A bare 0.5 (user means half the run) must not silently truncate to
    0 batches — save_interval: 0.5 used to turn checkpointing OFF."""
    import pytest

    from diffusion_tpu.utils.time import Time, TimeUnit
    with pytest.raises(ValueError, match="dur"):
        Time.from_str(0.5)
    assert Time.from_str(2.0) == Time(2, TimeUnit.BATCH)   # integral ok
    assert Time.from_str("0.5dur").unit == TimeUnit.DURATION


def test_file_logger_flush_interval_zero(tmp_path):
    """flush_interval=0 ('flush always') must not ZeroDivisionError."""
    from diffusion_tpu.utils.logging import FileLogger
    lg = FileLogger(str(tmp_path / "m.jsonl"), flush_interval=0)
    lg.log_metrics({"loss": 1.0}, step=1)
    lg.close()


def test_scheduled_gc_standalone_eval_restores_gc():
    """eval hooks only toggle GC while a fit() owns it — a standalone
    post-fit eval used to leave host GC permanently disabled."""
    import gc

    from diffusion_tpu.callbacks.monitors import ScheduledGarbageCollector
    cb = ScheduledGarbageCollector(batch_interval=10)
    assert gc.isenabled()
    cb.eval_start(None, None)
    cb.eval_end(None, None)
    assert gc.isenabled()          # untouched outside fit
    cb.fit_start(None, None)
    assert not gc.isenabled()
    cb.eval_start(None, None)
    assert gc.isenabled()          # GC on during mid-fit generation
    cb.eval_end(None, None)
    assert not gc.isenabled()      # back to fit's disabled state
    cb.fit_end(None, None)
    assert gc.isenabled()          # restored


def test_runtime_estimator_uses_trainer_max_batches():
    """ETA reads the Trainer-computed max_batches off State (epoch-denominated
    durations used to silently disable the estimate)."""
    from types import SimpleNamespace

    from diffusion_tpu.callbacks.monitors import RuntimeEstimator
    est = RuntimeEstimator(window_size=4)
    state = SimpleNamespace(max_duration="200ep", max_batches=1000)
    est.fit_start(state, None)
    assert est._max_batches == 1000
