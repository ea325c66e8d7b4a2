#!/usr/bin/env bash
# LAION parquet download via img2dataset (reference parity:
# scripts/laion_download_all.sh / laion_download_aesthetic.sh — downloads the
# laion2B-en parquet shards with the metadata columns the cloudwriter and the
# filters consume, then drops a `done` sentinel).
#
# Requires img2dataset (not in this zero-egress image — run where you have
# network). Follow with scripts/laion_cloudwriter.py for parquet -> MDS.
set -euo pipefail

PARQUET_DIR=${1:?usage: laion_download.sh <parquet-metadata-dir> <output-dir> [processes]}
OUTPUT_DIR=${2:?missing output dir}
PROCESSES=${3:-16}

img2dataset \
  --url_list "$PARQUET_DIR" \
  --input_format parquet \
  --url_col URL \
  --caption_col TEXT \
  --output_format parquet \
  --output_folder "$OUTPUT_DIR" \
  --processes_count "$PROCESSES" \
  --thread_count 64 \
  --image_size 512 \
  --resize_only_if_bigger True \
  --resize_mode keep_ratio \
  --skip_reencode True \
  --save_additional_columns '["similarity","hash","punsafe","pwatermark","AESTHETIC_SCORE"]' \
  --enable_wandb False

touch "$OUTPUT_DIR/done"   # completion sentinel (reference :25)
