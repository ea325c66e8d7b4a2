"""Config -> trainer composition (the train.py layer) end-to-end on tiny
geometry: yaml surface parity with the reference's hydra composition."""

import os

import numpy as np
import pytest

from diffusion_tpu.config import loads_config
from diffusion_tpu.data.mds import MDSWriter
from diffusion_tpu.train.train import build_trainer, train

YAML = """
batch_size: 8
seed: 3
name: comp-test
eval_first: true
model:
  _target_: diffusion_tpu.models.models.stable_diffusion_tiny
  val_guidance_scales: []
dataset:
  train_batch_size: ${batch_size}
  eval_batch_size: 8
  train_dataset:
    _target_: diffusion_tpu.data.image_caption.build_streaming_image_caption_dataloader
    remote: {root}/ds
    batch_size: ${batch_size}
    caption_drop_prob: 0.1
    resize_size: 32
    shuffle: true
    num_workers: 1
  eval_dataset:
    _target_: diffusion_tpu.data.image_caption.build_streaming_image_caption_dataloader
    remote: {root}/ds
    batch_size: 8
    resize_size: 32
    shuffle: false
    num_workers: 1
optimizer:
  _target_: diffusion_tpu.train.optim.adamw
  lr: 1.0e-3
  weight_decay: 0.01
scheduler:
  name: multi_step_with_warmup
  t_warmup: 1ba
  milestones: [100ba]
algorithms:
  ema:
    _target_: diffusion_tpu.algorithms.ema.EMA
    half_life: 5ba
callbacks:
  lr_monitor:
    _target_: diffusion_tpu.callbacks.monitors.LRMonitor
logger:
  file:
    _target_: diffusion_tpu.utils.logging.FileLogger
    filename: {root}/metrics.jsonl
trainer:
  max_duration: 2ba
  eval_interval: 0ba
  image_size: 32
  seed: ${seed}
  save_folder: {root}/ckpt
  save_interval: 2ba
  save_overwrite: true
  eval_subset_num_batches: 1
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("comp")
    import io
    from PIL import Image
    rng = np.random.default_rng(0)
    with MDSWriter(str(root / "ds"), {"image": "bytes", "caption": "str"}) as w:
        for i in range(16):
            arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write({"image": buf.getvalue(), "caption": f"sample {i}"})
    return root


def test_train_from_config(workspace):
    cfg = loads_config(YAML.replace("{root}", str(workspace)))
    trainer = train(cfg)  # composes, evals first, fits 2 batches, saves
    assert trainer.state.timestamp.batch == 2
    assert os.path.isdir(workspace / "ckpt" / "ba2")
    assert trainer.ema_algorithm is not None
    assert not trainer.ema_algorithm.ema_weights_active  # swapped back
    trainer.close()  # flushes the FileLogger
    lines = open(workspace / "metrics.jsonl").read().strip().split("\n")
    records = [l for l in lines if "metrics/eval/MeanSquaredError" in l]
    assert records, "eval_first did not log eval metrics"


def test_scheduler_target_respected(workspace):
    """A scheduler declared with _target_ (hydra parity) composes THAT
    factory — the name/milestones heuristic used to silently replace an
    explicit cosine schedule with a constant one."""
    cfg = loads_config(YAML.replace("{root}", str(workspace)), [
        "+scheduler._target_=diffusion_tpu.train.optim.cosine_annealing_with_warmup",
        "~scheduler.name", "~scheduler.milestones",
        "+scheduler.alpha_f=0.0",
        "trainer.max_duration=10ba",
    ])
    tr = build_trainer(cfg)
    # cosine: full LR after warmup, ~0 at the end; a constant schedule
    # would stay at 1.0
    assert abs(float(tr._schedule(1)) - 1.0) < 1e-6
    assert float(tr._schedule(9)) < 0.2
    tr.close()


def test_train_batch_size_must_divide_hosts(workspace):
    """Composer parity: an indivisible global batch raises at composition
    (silent floor-division trained at a different batch than configured).
    On this 1-process host any multiple passes; 0 must fail."""
    cfg = loads_config(YAML.replace("{root}", str(workspace)),
                       ["batch_size=0"])
    with pytest.raises(ValueError, match="multiple of"):
        build_trainer(cfg)
