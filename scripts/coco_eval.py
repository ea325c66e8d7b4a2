#!/usr/bin/env python
"""Quick COCO eval wrapper (reference scripts/coco_eval.py parity): builds the
COCO val loader + SD2 with FID at guidance scales {1,3,7} and evaluates.
Thin front-end over fid_clip_evaluation.py for the multi-scale protocol
(reference README.md:96-110)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--remote", required=True)
    p.add_argument("--local", default=None)
    p.add_argument("--load_path", default=None)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--guidance_scales", type=float, nargs="+",
                   default=[1.0, 3.0, 7.0])
    p.add_argument("--subset_num_batches", type=int, default=-1)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--builder",
                   default="diffusion_tpu.models.models.stable_diffusion_2",
                   help="model builder dotted path (the tiny builder makes "
                        "the multi-scale protocol runnable at CI size)")
    p.add_argument("--allow_random_towers", action="store_true")
    args = p.parse_args(argv)

    from diffusion_tpu.config.loader import _import_target
    from diffusion_tpu.data.coco import build_streaming_cocoval_dataloader
    from diffusion_tpu.parallel import dist
    from diffusion_tpu.train.trainer import Evaluator, Trainer
    from diffusion_tpu.utils.logging import ConsoleLogger

    dist.initialize()
    loader = build_streaming_cocoval_dataloader(
        remote=args.remote, local=args.local, batch_size=args.batch_size,
        resize_size=args.size, tokenizer_name_or_path=args.tokenizer)
    model = _import_target(args.builder)(
        model_name=args.tokenizer, pretrained=False,
        val_metrics=["FrechetInceptionDistance", "CLIPScore"],
        allow_random_tower_weights=args.allow_random_towers,
        val_guidance_scales=list(args.guidance_scales))
    trainer = Trainer(
        model=model,
        eval_dataloader=[Evaluator("coco-val", loader, model.val_metric_names)],
        loggers=[ConsoleLogger(log_interval=1)],
        load_path=args.load_path, load_weights_only=True,
        image_size=args.size, max_duration="1ba",
        eval_subset_num_batches=args.subset_num_batches,
        eval_num_inference_steps=args.num_inference_steps)
    results = trainer.eval()
    for k, v in sorted(results.items()):
        print(f"{k}: {v}")
    return results


if __name__ == "__main__":
    main()
