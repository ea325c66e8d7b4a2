#!/usr/bin/env python
"""Port HuggingFace SD2 checkpoints (safetensors) into this framework's
Flax param layout — offline CLI for SURVEY.md §7 hard-part 1.

The porter functions live in diffusion_tpu/models/port_hf.py (also used at
runtime by models/pretrained.py for `pretrained=True` model init); this
script is the batch entry point. The reference loads UNet/VAE/CLIP via
`from_pretrained` (reference: diffusion/models/models.py:74-89); in this
zero-egress TPU environment the equivalent is: download the
`stabilityai/stable-diffusion-2-base` folder elsewhere, then

  python tools/port_weights.py --model-dir /path/to/stable-diffusion-2-base \
      --out ported/

which writes unet.msgpack / vae.msgpack / text_encoder.msgpack readable by
models/pretrained.py:load_pretrained_params (and by
flax.serialization.msgpack_restore directly).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from diffusion_tpu.models.port_hf import (load_safetensors_dir,  # noqa: F401
                                          port_clip_metric, port_clip_text,
                                          port_clip_vision, port_inception,
                                          port_unet, port_vae)

__all__ = [
    "load_safetensors_dir", "port_unet", "port_vae", "port_clip_text",
    "port_clip_vision", "port_clip_metric", "port_inception",
]


def main() -> None:
    import flax.serialization

    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", required=True,
                   help="local HF stable-diffusion-2-base dir")
    p.add_argument("--out", required=True)
    p.add_argument("--inception-pth", default=None,
                   help="optional torchvision/FID InceptionV3 .pth; ports "
                        "the FID tower to <out>/inception.npz "
                        "(DIFFUSION_TPU_INCEPTION_WEIGHTS target)")
    p.add_argument("--clip-metric-dir", default=None,
                   help="optional local HF clip-vit-large-patch14 dir; ports "
                        "the CLIPScore tower to <out>/clip_metric.npz "
                        "(DIFFUSION_TPU_CLIP_WEIGHTS target)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for sub, porter in (("unet", port_unet), ("vae", port_vae),
                        ("text_encoder", port_clip_text)):
        src = os.path.join(args.model_dir, sub)
        tensors = load_safetensors_dir(src)
        tree = porter(tensors)
        blob = flax.serialization.msgpack_serialize(tree)
        out_path = os.path.join(args.out, f"{sub}.msgpack")
        with open(out_path, "wb") as f:
            f.write(blob)
        print(f"ported {sub}: {len(tensors)} tensors -> {out_path}")

    if args.inception_pth:
        import torch
        sd = torch.load(args.inception_pth, map_location="cpu")
        sd = sd.get("state_dict", sd)
        flat = port_inception({k: v.numpy() for k, v in sd.items()})
        out_path = os.path.join(args.out, "inception.npz")
        np.savez(out_path, **flat)
        print(f"ported inception: {len(flat)} tensors -> {out_path}")

    if args.clip_metric_dir:
        tensors = load_safetensors_dir(args.clip_metric_dir)
        flat = port_clip_metric(tensors)
        out_path = os.path.join(args.out, "clip_metric.npz")
        np.savez(out_path, **flat)
        print(f"ported clip metric tower: {len(flat)} tensors -> {out_path}")


if __name__ == "__main__":
    main()
