"""The driver-facing bench contract: `python bench.py` must print ONE valid
JSON line with metric/value/unit/vs_baseline. Runs the REAL bench path
(step bench + e2e Trainer.fit over an on-disk MDS) at tiny geometry on the
CPU mesh, so a regression in bench.py is caught in CI instead of at the
end-of-round driver run."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_driver_contract(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "BENCH_BUILDER": "diffusion_tpu.models.models.stable_diffusion_tiny",
        "BENCH_RES": "32",
        "BENCH_CTX_DIM": "32",
        "BENCH_BATCH_PER_CHIP": "2",
        # convergence phase at CI scale (keys must appear; the loss only
        # actually falls in the driver's real-chip run)
        "BENCH_CONVERGE_STEPS": "6",
        "BENCH_CONVERGE_UNIQUE": "16",
        "BENCH_CONVERGE_BATCH": "1",
        "BENCH_CONVERGE_GEN_STEPS": "4",
        # the sampling subprocesses have their own scripts/ test surface;
        # skipping them keeps this smoke within the CI budget
        "BENCH_SAMPLING": "0",
        # the slow-relay e2e retry is a real-chip concern; on the CPU mesh
        # e2e < step is normal and the retry would double this smoke
        "BENCH_E2E_RETRY": "0",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        # keep the synthetic dataset inside the test sandbox
        "TMPDIR": str(tmp_path),
    })
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)  # exactly parseable
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, (key, result)
    assert result["value"] > 0
    assert result["unit"] == "img/s/chip"
    # e2e ran and the step bench priced the program
    assert result["metric"].startswith("trainer_e2e_throughput")
    assert result["flops_per_batch"] > 0
    assert result["e2e_steps_timed"] > 0
    # the convergence phase merged its keys into the one driver line,
    # including the held-out generalization probe
    for key in ("loss_start", "loss_end", "ema_loss", "converge_steps",
                "converge_val_mse", "converge_val_samples",
                "sample_nn_mse", "caption_match_frac"):
        assert key in result, (key, result)
    assert result["converge_steps"] == 6


def test_data_bench_emits_pipeline_contract(tmp_path):
    """BENCH_DATA=1 mode: host-only input-pipeline rates, incl. the
    precomputed-latent production-feed rate (verdict r3 item 3)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "BENCH_DATA": "1",
        "BENCH_DATA_SAMPLES": "96",
        "BENCH_DATA_SRC": "64",
        "BENCH_RES": "64",
        "BENCH_CTX_DIM": "32",
        "BENCH_DATA_WORKERS": "2",
        # a fixed demand avoids reading whatever BENCH_r*.json the repo has
        "BENCH_DATA_DEMAND": "100.0",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        "TMPDIR": str(tmp_path),
    })
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["metric"].startswith("input_pipeline_mds_img_per_sec")
    for key in ("value", "wds_img_per_sec", "latent_loader_img_per_sec",
                "mds_process_workers_img_per_sec", "chips_one_host_can_feed",
                "chips_fed_precomputed_latents", "demand_img_per_sec_per_chip"):
        assert key in result, (key, result)
    assert result["value"] > 0
    assert result["latent_loader_img_per_sec"] > 0
    # the latent (no-decode) path must beat raw JPEG decode
    assert result["latent_loader_img_per_sec"] > result["value"]
    assert result["demand_img_per_sec_per_chip"] == 100.0
