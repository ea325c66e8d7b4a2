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
