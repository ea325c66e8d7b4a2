#!/usr/bin/env python
"""Offline FID + CLIPScore evaluation on COCO-2014-val.

TPU-native equivalent of the reference's offline eval script (reference:
scripts/fid-clip-evaluation.py): builds the COCO val loader (ref :39-49),
an SD2 model with FID+CLIPScore at one guidance scale (ref :58-79), loads a
checkpoint weights-only (ref :101-108), runs the eval loop (ref :109), and
logs 10 fixed prompts' images (ref :88-95).

Usage:
  python scripts/fid_clip_evaluation.py --remote <coco-mds> \
      --load_path <ckpt-dir> --guidance_scale 3.0 [--size 256] [--seed 1138]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPTS = [
    "a couple waiting to cross the street",
    "a kitchen with a refrigerator, stove and sink",
    "a man riding skis down a snow covered slope",
    "a group of people standing on a beach flying kites",
    "a bathroom with a toilet, sink and mirror",
    "two giraffes standing next to each other in a field",
    "a bus driving down a city street next to tall buildings",
    "a plate of food with broccoli and meat",
    "a baseball player swinging a bat at a ball",
    "a vase filled with flowers on a table",
]


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--remote", required=True)
    p.add_argument("--local", default=None)
    p.add_argument("--load_path", default=None)
    p.add_argument("--guidance_scale", type=float, default=3.0)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=1138)
    p.add_argument("--subset_num_batches", type=int, default=-1)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--builder",
                   default="diffusion_tpu.models.models.stable_diffusion_2",
                   help="model builder dotted path (the tiny builder makes "
                        "the whole protocol runnable in CI)")
    p.add_argument("--allow_random_towers", action="store_true",
                   help="permit random metric-tower weights (CI/smoke only "
                        "- FID numbers are meaningless without real towers)")
    p.add_argument("--scheduler", default="ddim",
                   choices=["ddim", "dpm++2m", "euler"],
                   help="sampler for eval generation; dpm++2m at "
                        "--num_inference_steps 20 matches 50-step DDIM "
                        "quality at ~2.5x the eval throughput")
    p.add_argument("--out", default="eval_metrics.jsonl")
    p.add_argument("--wandb", action="store_true",
                   help="log to wandb (reference fid-clip-evaluation.py:32; "
                        "no-op if wandb is not installed)")
    p.add_argument("--project", default="diffusion-eval",
                   help="wandb project (ref :33)")
    p.add_argument("--name", default="fid-clip-evaluation",
                   help="wandb run name (ref :34)")
    args = p.parse_args(argv)

    from diffusion_tpu.callbacks.log_diffusion_images import LogDiffusionImages
    from diffusion_tpu.config.loader import _import_target
    from diffusion_tpu.data.coco import build_streaming_cocoval_dataloader
    from diffusion_tpu.parallel import dist
    from diffusion_tpu.train.trainer import Evaluator, Trainer
    from diffusion_tpu.utils.logging import (ConsoleLogger, FileLogger,
                                             WandBLogger)

    dist.initialize()
    loader = build_streaming_cocoval_dataloader(
        remote=args.remote, local=args.local, batch_size=args.batch_size,
        resize_size=args.size, tokenizer_name_or_path=args.tokenizer)
    builder = _import_target(args.builder)
    model = builder(
        model_name=args.tokenizer, pretrained=False,
        val_metrics=["FrechetInceptionDistance", "CLIPScore"],
        val_guidance_scales=[args.guidance_scale], val_seed=args.seed,
        allow_random_tower_weights=args.allow_random_towers,
        inference_scheduler=args.scheduler,
        fsdp=True)
    trainer = Trainer(
        model=model,
        eval_dataloader=[Evaluator("coco-val", loader,
                                   model.val_metric_names)],
        loggers=[ConsoleLogger(log_interval=1), FileLogger(args.out)]
        + ([WandBLogger(project=args.project,
                        name=args.name + ("-pretrained" if not args.load_path
                                          else ""))]
           if args.wandb else []),
        callbacks=[LogDiffusionImages(PROMPTS, size=args.size,
                                      guidance_scale=args.guidance_scale,
                                      seed=args.seed)],
        load_path=args.load_path, load_weights_only=True,
        image_size=args.size, max_duration="1ba",
        eval_num_inference_steps=args.num_inference_steps,
        eval_subset_num_batches=args.subset_num_batches)
    results = trainer.eval()
    trainer.close()  # flush buffered metric records to --out
    for k, v in sorted(results.items()):
        print(f"{k}: {v}")
    return results


if __name__ == "__main__":
    main()
