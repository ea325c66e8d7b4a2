#!/bin/sh
# LAION-2B-en aesthetic-4.5+ download via img2dataset (reference parity:
# scripts/laion_download_aesthetic.sh — uppercase URL/TEXT columns and the
# AESTHETIC_SCORE side column the metadata filter consumes,
# diffusion_tpu/data/filters.py). Requires img2dataset + network.

if hash wandb 2> /dev/null; then
    wandb login
    ENABLE_WANDB=True
else
    ENABLE_WANDB=False
fi

RAW_DIR=${1:-/tmp/laion2b-4.5-raw}
OUT_DIR=${2:-/tmp/laion2b-processed}

# Use half the CPU cores so the cloudwriter can use the other half
img2dataset \
    --url_list "$RAW_DIR" \
    --input_format parquet \
    --url_col URL \
    --caption_col TEXT \
    --output_format parquet \
    --output_folder "$OUT_DIR" \
    --processes_count 32 \
    --thread_count 64 \
    --resize_mode no \
    --save_additional_columns '["punsafe","pwatermark","similarity","hash","AESTHETIC_SCORE"]' \
    --enable_wandb "$ENABLE_WANDB" \
    --wandb_project laion-dataset

touch "$OUT_DIR/done"   # completion sentinel (reference :25)
