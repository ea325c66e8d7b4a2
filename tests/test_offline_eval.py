"""Offline FID/CLIPScore protocol end-to-end (VERDICT r2 item 7): the
scripts/fid_clip_evaluation.py main() path — COCO loader -> model ->
Trainer.eval with per-scale generation -> finite FID + CLIPScore — has
actually run, at CI size on the 8-device mesh (reference:
scripts/fid-clip-evaluation.py:39-109)."""

import io
import json
import math

import numpy as np
import pytest
from PIL import Image

from diffusion_tpu.data.mds import MDSWriter


@pytest.fixture(scope="module")
def coco_mds(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_eval")
    path = str(root / "mds")
    rng = np.random.default_rng(0)
    with MDSWriter(path, {"image": "bytes", "captions": "json"}) as w:
        for i in range(16):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write({"image": buf.getvalue(),
                     "captions": [f"a synthetic photo number {i}"]})
    return path


@pytest.mark.slow
def test_coco_eval_multiscale_wrapper(coco_mds):
    """The multi-scale wrapper (reference scripts/coco_eval.py / README
    protocol table) runs its whole main(): per-scale FID+CLIPScore out."""
    from scripts.coco_eval import main

    results = main([
        "--remote", coco_mds,
        "--builder", "diffusion_tpu.models.models.stable_diffusion_tiny",
        "--allow_random_towers",
        "--size", "32",
        "--batch_size", "8",
        "--guidance_scales", "1.0", "3.0",
        "--subset_num_batches", "1",
        "--num_inference_steps", "2",
    ])
    for scale in ("1p0", "3p0"):
        keys = [k for k in results if k.endswith(f"scale-{scale}")
                and "FrechetInceptionDistance" in k]
        assert keys, (scale, sorted(results))
        assert all(math.isfinite(float(results[k])) for k in keys)


@pytest.mark.slow
def test_fid_clip_protocol_end_to_end(coco_mds, tmp_path):
    from scripts.fid_clip_evaluation import main

    out = str(tmp_path / "eval_metrics.jsonl")
    results = main([
        "--remote", coco_mds,
        "--builder", "diffusion_tpu.models.models.stable_diffusion_tiny",
        "--allow_random_towers",
        "--size", "32",
        "--batch_size", "8",
        "--num_inference_steps", "2",
        "--subset_num_batches", "2",
        "--guidance_scale", "3.0",
        "--out", out,
        "--wandb",          # no-op logger in this image (wandb absent) but
                            # exercises the reference's --wandb surface
    ])
    fid_keys = [k for k in results if "FrechetInceptionDistance" in k]
    clip_keys = [k for k in results if "CLIPScore" in k]
    assert fid_keys and clip_keys, results
    for k in fid_keys + clip_keys:
        assert math.isfinite(float(results[k])), (k, results[k])
    # the scale suffix matches the reference's metric name mangling
    # ('FrechetInceptionDistance-scale-3p0', stable_diffusion.py:114-134)
    assert any(k.endswith("scale-3p0") for k in fid_keys), fid_keys
    # metrics landed in the jsonl log too
    records = [json.loads(l) for l in open(out)]
    assert any(any("FrechetInceptionDistance" in k for k in r) for r in records)


@pytest.mark.slow
def test_sampling_bench_smoke():
    """scripts/bench_sampling.py (the BASELINE.md samples/min metric) runs
    end-to-end at tiny geometry and reports a finite positive rate."""
    from scripts.bench_sampling import main

    result = main(["--tiny", "--size", "32", "--batch", "2",
                   "--steps", "2", "--iters", "1"])
    assert result["metric"] == "ddim2_samples_per_min_32px"
    assert math.isfinite(result["value"]) and result["value"] > 0


@pytest.mark.slow
def test_sampling_bench_dpm_smoke():
    """--scheduler dpm++2m drives the multistep scan path through the same
    serving bench surface (schedulers/dpm.py)."""
    from scripts.bench_sampling import main

    result = main(["--tiny", "--size", "32", "--batch", "2",
                   "--steps", "2", "--iters", "1",
                   "--scheduler", "dpm++2m"])
    assert result["metric"] == "dpmpp2m2_samples_per_min_32px"
    assert math.isfinite(result["value"]) and result["value"] > 0
