#!/usr/bin/env python
"""Precompute VAE + CLIP latents into new MDS shards.

TPU-native equivalent of the reference's GPU batch job (reference:
scripts/precompute_latents.py): reads an image-caption MDS, encodes each
image at the requested resolutions with the frozen VAE (x0.18215) and the
caption with the frozen CLIP text tower (ref :289-294), and writes a new MDS
with extra byte columns `caption_latents` / `latents_<size>` — empty when the
source image is smaller than the target resolution (ref :252-281,302-328).
Output shards land under out/<host_rank>/ (the reference's per-GPU sharding,
ref :274-276); hosts synchronize per batch with a barrier (ref :332).

TPU-first: encoding is one jitted program over both resolutions; the host
loop only decodes JPEGs and writes shards. Latents are stored as raw fp16
NCHW bytes, byte-compatible with what data/laion.py expects.

This is the job the reference prices at 3,784 A100-hours (README.md:52).
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--remote", required=True, help="source MDS dir/bucket")
    p.add_argument("--local", default=None)
    p.add_argument("--out", required=True, help="local output root")
    p.add_argument("--out-remote", default=None,
                   help="optional remote root (s3://, gs://, or path): output "
                        "shards upload in the background as they complete "
                        "(the reference uploads per bucket, ref :274-276)")
    p.add_argument("--sizes", type=int, nargs="+", default=[256, 512])
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--image-key", default="jpg")
    p.add_argument("--caption-key", default="caption")
    p.add_argument("--model-name", default=None,
                   help="local HF dir for tokenizer/weights")
    p.add_argument("--keep-local", action="store_true",
                   help="with --out-remote: keep local output shards after "
                        "upload (default deletes them — the output dataset "
                        "is LARGER than the input, and filling the host "
                        "disk defeats the incremental input-shard deletion)")
    p.add_argument("--keep-inputs", action="store_true",
                   help="do not delete consumed input shards from the local "
                        "cache (deletion is the reference default, "
                        "ref :335-351; it only ever removes cached copies)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from diffusion_tpu.data.mds import MDSWriter
    from diffusion_tpu.data.streaming import StreamingDataset
    from diffusion_tpu.data.transforms import LargestCenterSquare, sd_normalize
    from diffusion_tpu.models.models import stable_diffusion_2
    from diffusion_tpu.parallel import dist

    dist.initialize()
    model = stable_diffusion_2(model_name=args.model_name, pretrained=False,
                               encode_latents_in_fp16=True, fsdp=False)
    _, frozen = model.init_params(jax.random.key(0), image_size=max(args.sizes))

    @jax.jit
    def encode(images_by_size, caption_ids, rng):
        out = {}
        for size, imgs in images_by_size.items():
            posterior = model.vae.apply(frozen["vae"], imgs,
                                        method=model.vae.encode)
            lat = posterior.sample(rng) * model.latent_scale
            out[f"latents_{size}"] = lat.astype(jnp.float16)
        hidden, _ = model.text_encoder.apply(frozen["text_encoder"], caption_ids)
        out["caption_latents"] = hidden.astype(jnp.float16)
        return out

    dataset = StreamingDataset(remote=args.remote, local=args.local,
                               shuffle=False)
    rank, world = dist.get_process_index(), max(jax.process_count(), 1)
    ids = dataset.partition(0, rank, world)
    crops = {s: LargestCenterSquare(s) for s in args.sizes}

    # incremental deletion of consumed input shards from the local cache
    # (ref :335-351): count this host's samples per shard, release at zero
    shard_remaining: dict = {}
    for gid in ids:
        f = dataset.flat_shard_of(int(gid))
        shard_remaining[f] = shard_remaining.get(f, 0) + 1

    columns = {args.image_key: "bytes", args.caption_key: "str",
               "caption_latents": "bytes"}
    columns.update({f"latents_{s}": "bytes" for s in args.sizes})
    out_dir = os.path.join(args.out, str(rank))
    out = out_dir if not args.out_remote else \
        (out_dir, f"{args.out_remote.rstrip('/')}/{rank}")

    with MDSWriter(out, columns,
                   keep_local=args.keep_local or not args.out_remote
                   ) as writer:
        for start in range(0, len(ids), args.batch_size):
            chunk = ids[start:start + args.batch_size]
            raws, imgs_by_size, captions, valid_by_size = [], {s: [] for s in args.sizes}, [], {s: [] for s in args.sizes}
            for gid in chunk:
                raw = dataset.get_sample(int(gid))
                raws.append(raw)
                img = Image.open(io.BytesIO(raw[args.image_key])).convert("RGB")
                captions.append(str(raw.get(args.caption_key, "")))
                for s in args.sizes:
                    # empty latents when source smaller than target (ref :252-281)
                    ok = min(img.size) >= s
                    valid_by_size[s].append(ok)
                    imgs_by_size[s].append(
                        sd_normalize(crops[s](img)) if ok
                        else np.zeros((s, s, 3), np.float32))
            batch_imgs = {s: jnp.asarray(np.stack(v))
                          for s, v in imgs_by_size.items()}
            cap_ids = jnp.asarray(model.tokenizer(captions)["input_ids"])
            encoded = encode(batch_imgs, cap_ids,
                             jax.random.fold_in(jax.random.key(0), start))
            encoded = {k: np.asarray(v) for k, v in encoded.items()}
            for i, raw in enumerate(raws):
                sample = {args.image_key: raw[args.image_key],
                          args.caption_key: captions[i],
                          "caption_latents": encoded["caption_latents"][i].tobytes()}
                for s in args.sizes:
                    lat = encoded[f"latents_{s}"][i]
                    # store NCHW fp16 bytes (loader transposes to NHWC)
                    sample[f"latents_{s}"] = (
                        lat.transpose(2, 0, 1).tobytes()
                        if valid_by_size[s][i] else b"")
                writer.write(sample)
            if not args.keep_inputs:
                for gid in chunk:
                    f = dataset.flat_shard_of(int(gid))
                    shard_remaining[f] -= 1
                    if shard_remaining[f] == 0:
                        dataset.release_shard(f)
            dist.barrier("precompute_batch")
    print(f"rank {rank}: wrote {len(ids)} samples to {out_dir}")


if __name__ == "__main__":
    main()
