#!/usr/bin/env python
"""Long-running parquet -> MDS converter with resolution bucketing.

TPU-native equivalent of the reference's cloudwriter (reference:
scripts/laion_cloudwriter.py): polls a download directory for parquet shards
whose img2dataset `*_stats.json` marks them complete (ref :78-98), decodes
and validates every image (ref :166-175), writes MDS samples with the LAION
metadata columns (ref :177-195), routes each sample to a **resolution
bucket** [0,64,128,256,512,768,1024,inf) with one writer per bucket
(ref :299-309), and deletes consumed parquets once all buckets finish them
(ref :254-287).

Single-process with per-bucket writers (the reference uses one uploader
process per bucket; on a TPU host the bottleneck is network, not CPU
fan-out — swap in a process pool if needed).
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_tpu.data.mds import MDSWriter

BUCKETS = [0, 64, 128, 256, 512, 768, 1024]

COLUMNS = {
    "jpg": "bytes", "caption": "str", "url": "str", "key": "str",
    "width": "int", "height": "int", "original_width": "int",
    "original_height": "int", "status": "str", "error_message": "str",
    "exif": "str", "similarity": "str", "punsafe": "str", "pwatermark": "str",
    "aesthetic": "str", "hash": "str",
}


def bucket_of(width: int, height: int) -> int:
    side = min(width or 0, height or 0)
    b = 0
    for i, lo in enumerate(BUCKETS):
        if side >= lo:
            b = i
    return BUCKETS[b]


def completed_parquets(download_dir: str) -> list:
    """Parquet shards whose img2dataset stats sidecar exists (ref :78-98)."""
    done = []
    for stats in sorted(glob.glob(os.path.join(download_dir, "*_stats.json"))):
        pq = stats.replace("_stats.json", ".parquet")
        if os.path.exists(pq):
            done.append(pq)
    return done


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--download-dir", required=True)
    p.add_argument("--out", required=True, help="output root; per-bucket subdirs")
    p.add_argument("--poll-interval", type=float, default=30.0)
    p.add_argument("--remove-consumed", action="store_true")
    p.add_argument("--one-shot", action="store_true",
                   help="convert what exists and exit (no polling)")
    args = p.parse_args()

    import pyarrow.parquet as pq
    from PIL import Image

    writers = {}
    for lo in BUCKETS:
        writers[lo] = MDSWriter(os.path.join(args.out, f"bucket_{lo}"), COLUMNS)

    consumed = set()
    try:
        while True:
            new = [f for f in completed_parquets(args.download_dir)
                   if f not in consumed]
            for parquet in new:
                table = pq.read_table(parquet)
                rows = table.to_pylist()
                n_ok = 0
                for row in rows:
                    data = row.get("jpg") or row.get("image")
                    if not data:
                        continue
                    try:  # decode/validate every image (ref :166-175)
                        img = Image.open(io.BytesIO(data))
                        img.verify()
                        w, h = img.size
                    except Exception:
                        continue
                    sample = {k: "" for k in COLUMNS}
                    sample.update({
                        "jpg": data,
                        "caption": str(row.get("caption") or ""),
                        "url": str(row.get("url") or ""),
                        "key": str(row.get("key") or ""),
                        "width": int(w), "height": int(h),
                        "original_width": int(row.get("original_width") or w),
                        "original_height": int(row.get("original_height") or h),
                        "status": str(row.get("status") or "ok"),
                        "error_message": str(row.get("error_message") or ""),
                        "exif": str(row.get("exif") or ""),
                        "similarity": str(row.get("similarity") or ""),
                        "punsafe": str(row.get("punsafe") or ""),
                        "pwatermark": str(row.get("pwatermark") or ""),
                        "aesthetic": str(row.get("AESTHETIC_SCORE")
                                         or row.get("aesthetic") or ""),
                        "hash": str(row.get("hash") or ""),
                    })
                    writers[bucket_of(w, h)].write(sample)
                    n_ok += 1
                consumed.add(parquet)
                print(f"converted {parquet}: {n_ok}/{len(rows)} samples")
                if args.remove_consumed:
                    os.remove(parquet)  # ref :254-287 remover process
            if args.one_shot:
                break
            time.sleep(args.poll_interval)
    finally:
        for w in writers.values():
            w.finish()


if __name__ == "__main__":
    main()
