"""Every shipped yaml must compose (config -> build_trainer) — verdict r1
item 5. Strategy: load the real yaml, override the model to tiny geometry and
the dataset paths to synthetic fixtures of the matching family, then build a
Trainer (the reference's own configs are only exercised manually; here the
whole corpus is CI-guarded)."""

import io
import json
import os
import tarfile

import pytest
import yaml as pyyaml
from PIL import Image

from diffusion_tpu.config import load_config
from diffusion_tpu.data.mds import MDSWriter
from diffusion_tpu.train.train import build_trainer

YAML_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "yamls")


def _jpeg(w=32, h=32, color=(0, 128, 255)):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """One synthetic source per data family."""
    root = tmp_path_factory.mktemp("yaml_fixtures")

    laion = str(root / "laion_mds")
    with MDSWriter(laion, {"jpg": "bytes", "caption": "str"}) as w:
        for i in range(16):
            w.write({"jpg": _jpeg(), "caption": f"sample {i}"})

    coco = str(root / "coco_mds")
    with MDSWriter(coco, {"image": "bytes", "captions": "json"}) as w:
        for i in range(8):
            w.write({"image": _jpeg(), "captions": [f"coco {i}"]})

    tar_dir = root / "tars"
    tar_dir.mkdir()
    for t in range(2):
        with tarfile.open(tar_dir / f"{t}.tar", "w") as tf:
            for i in range(8):
                img = _jpeg()
                info = tarfile.TarInfo(f"s{t}-{i:03d}.jpg")
                info.size = len(img)
                tf.addfile(info, io.BytesIO(img))
                cap = f"tar caption {i}".encode()
                info = tarfile.TarInfo(f"s{t}-{i:03d}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
    wds_manifest = str(root / "shards.json")
    with open(wds_manifest, "w") as f:
        json.dump([str(tar_dir / f"{t}.tar") for t in range(2)], f)

    img_dir = root / "imgs"
    img_dir.mkdir()
    records = []
    for i in range(12):
        p = str(img_dir / f"{i}.jpg")
        with open(p, "wb") as f:
            f.write(_jpeg())
        records.append({"local_paths": [p], "prompts": [f"prompt {i}"],
                        "tags": ["synthetic", "fixture"]})
    pexels_manifest = str(root / "pexels.json")
    with open(pexels_manifest, "w") as f:
        json.dump(records, f)

    return {"laion": laion, "coco": coco, "wds_manifest": wds_manifest,
            "pexels_manifest": pexels_manifest, "tar_dir": str(tar_dir)}


BASE_OVERRIDES = [
    "model._target_=diffusion_tpu.models.models.stable_diffusion_tiny",
    "batch_size=4",
    "dataset.eval_batch_size=4",
    "trainer.max_duration=1ba",
    "name=smoke",
    "project=smoke",
]


def _build(path, overrides):
    cfg = load_config(path, overrides)
    cfg.pop("logger", None)  # no wandb in tests
    trainer = build_trainer(cfg)
    assert trainer.max_batches >= 1
    assert trainer.train_dataloader is not None
    batch = next(iter(trainer.train_dataloader))
    assert "captions" in batch or "caption_latents" in batch
    trainer.close()


@pytest.mark.slow
def test_sd2_base_256_yaml(fixtures):
    _build(os.path.join(YAML_DIR, "SD-2-base-256.yaml"), BASE_OVERRIDES + [
        "model.precomputed_latents=false",
        "dataset.train_dataset.precomputed_latents=false",
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
    ])


@pytest.mark.slow
def test_sd2_base_512_yaml(fixtures):
    _build(os.path.join(YAML_DIR, "SD-2-base-512.yaml"), BASE_OVERRIDES + [
        "model.precomputed_latents=false",
        "dataset.train_dataset.precomputed_latents=false",
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
    ])


@pytest.mark.slow
def test_sd2_base_1024_sp_yaml(fixtures):
    """The sequence-parallel 1024px config composes; the sp mesh reaches
    the Trainer (mesh_config is the yaml surface for ring attention)."""
    cfg = load_config(os.path.join(YAML_DIR, "SD-2-base-1024-sp.yaml"),
                      BASE_OVERRIDES + [
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "+dataset.train_dataset.image_key=jpg",
        "+dataset.train_dataset.caption_key=caption",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
        "trainer.mesh_config.fsdp=2",
        "trainer.mesh_config.data=2",
        "trainer.mesh_config.sp=2",
        "trainer.sequence_parallel_min_seq=16",
        "model.remat=false",
    ])
    cfg.pop("logger", None)
    trainer = build_trainer(cfg)
    assert trainer.mesh.shape["sp"] == 2
    assert trainer.sequence_parallel_min_seq == 16
    batch = next(iter(trainer.train_dataloader))
    assert "captions" in batch
    trainer.close()


@pytest.mark.slow
def test_sd2_base_512_tp_yaml(fixtures):
    """The tensor-parallel 512px config composes; the tp mesh reaches the
    Trainer (mesh_config is the yaml surface for Megatron sharding)."""
    cfg = load_config(os.path.join(YAML_DIR, "SD-2-base-512-tp.yaml"),
                      BASE_OVERRIDES + [
        "model.precomputed_latents=false",
        "dataset.train_dataset.precomputed_latents=false",
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
        "trainer.mesh_config.fsdp=2",
        "trainer.mesh_config.data=2",
        "trainer.mesh_config.tp=2",
    ])
    cfg.pop("logger", None)
    trainer = build_trainer(cfg)
    assert trainer.mesh.shape["tp"] == 2
    batch = next(iter(trainer.train_dataloader))
    assert "captions" in batch
    trainer.close()


@pytest.mark.slow
def test_sd2_base_256_wds_yaml(fixtures):
    _build(os.path.join(YAML_DIR, "SD-2-base-256-wds.yaml"), BASE_OVERRIDES + [
        f"dataset.train_dataset.meta_json={fixtures['wds_manifest']}",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.meta_json={fixtures['wds_manifest']}",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
    ])


@pytest.mark.slow
def test_sd2_base_256_pexels_yaml(fixtures):
    _build(os.path.join(YAML_DIR, "SD-2-base-256-pexels.yaml"), BASE_OVERRIDES + [
        f"dataset.train_dataset.meta_json={fixtures['pexels_manifest']}",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.meta_json={fixtures['pexels_manifest']}",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
    ])


@pytest.mark.slow
def test_sd2_base_256_mixdata_yaml(fixtures):
    _build(os.path.join(YAML_DIR, "SD-2-base-256-mixdata.yaml"), BASE_OVERRIDES + [
        f"dataset.train_dataset.datapipes.pexels.meta_json={fixtures['pexels_manifest']}",
        f"dataset.train_dataset.datapipes.laion.urls={fixtures['tar_dir']}",
        f"dataset.train_dataset.datapipes.coyo.urls={fixtures['tar_dir']}",
        f"dataset.train_dataset.datapipes.cc.urls={fixtures['tar_dir']}",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "+dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
    ])


@pytest.mark.slow
def test_mosaic_dialect_yaml(fixtures):
    """The mcli dialect (tree under `parameters:`) loads + composes
    identically (reference yamls/mosaic-yamls/SD-2-base-256.yaml:20+)."""
    _build(os.path.join(YAML_DIR, "mosaic", "SD-2-base-256.yaml"),
           BASE_OVERRIDES + [
        "model.precomputed_latents=false",
        "dataset.train_dataset.precomputed_latents=false",
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
    ])


@pytest.mark.slow
def test_mosaic_dialect_512_yaml(fixtures):
    """The mcli-dialect 512 job spec composes, including its EMA block
    (reference yamls/mosaic-yamls/SD-2-base-512.yaml:28-33)."""
    _build(os.path.join(YAML_DIR, "mosaic", "SD-2-base-512.yaml"),
           BASE_OVERRIDES + [
        "model.precomputed_latents=false",
        "dataset.train_dataset.precomputed_latents=false",
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
        "algorithms.ema.ema_start=0ba",
    ])


def test_eval_and_inference_yamls_parse():
    """Job-spec yamls (reference yamls/mosaic-yamls/eval.yaml,
    diffusion/inference/mosaic_inference.yaml) parse and carry the keys a
    launcher needs."""
    with open(os.path.join(YAML_DIR, "eval.yaml")) as f:
        ev = pyyaml.safe_load(f)
    assert "fid_clip_evaluation" in ev["command"]
    assert "compute" in ev
    with open(os.path.join(YAML_DIR, "inference.yaml")) as f:
        inf = pyyaml.safe_load(f)
    assert inf["model"]["model_handler"].endswith("StableDiffusionInference")
    assert "serve" in inf["command"]
    with open(os.path.join(YAML_DIR, "mosaic", "eval.yaml")) as f:
        mev = pyyaml.safe_load(f)
    assert "fid_clip_evaluation" in mev["command"]
    assert "--wandb" in mev["command"] and "compute" in mev


@pytest.mark.slow
def test_sd2_base_256_lora_yaml(fixtures):
    """The LoRA finetune recipe composes: adapter-only trainable tree,
    frozen base, tiny optimizer surface."""
    cfg = load_config(os.path.join(YAML_DIR, "SD-2-base-256-lora.yaml"),
                      BASE_OVERRIDES + [
        f"dataset.train_dataset.remote={fixtures['laion']}",
        "+dataset.train_dataset.image_key=jpg",
        "+dataset.train_dataset.caption_key=caption",
        "dataset.train_dataset.num_workers=1",
        "dataset.train_dataset.resize_size=32",
        f"dataset.eval_dataset.remote={fixtures['coco']}",
        "dataset.eval_dataset.num_workers=1",
        "dataset.eval_dataset.resize_size=32",
        "trainer.image_size=32",
        "model.lora_rank=4",
    ])
    cfg.pop("logger", None)
    trainer = build_trainer(cfg)
    from flax import traverse_util

    from diffusion_tpu.models.lora import is_lora_key
    flat = traverse_util.flatten_dict(trainer.train_state.params)
    assert flat and all(is_lora_key(k) for k in flat)
    assert "unet_base" in trainer.frozen
    batch = next(iter(trainer.train_dataloader))
    assert "captions" in batch
    trainer.close()
