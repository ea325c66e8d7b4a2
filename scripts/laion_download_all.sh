#!/bin/sh
# LAION-2B-en full download via img2dataset (reference parity:
# scripts/laion_download_all.sh — lowercase url/caption columns, md5
# verification, punsafe/pwatermark/similarity/hash side columns, `done`
# sentinel). Requires img2dataset + network — run on a download host, then
# feed scripts/laion_cloudwriter.py.

if hash wandb 2> /dev/null; then
    wandb login
    ENABLE_WANDB=True
else
    ENABLE_WANDB=False
fi

RAW_DIR=${1:-/tmp/laion2b-raw}
OUT_DIR=${2:-/tmp/laion2b-processed}

# Use half the CPU cores so the cloudwriter can use the other half
img2dataset \
    --url_list "$RAW_DIR" \
    --input_format parquet \
    --url_col url \
    --caption_col caption \
    --output_format parquet \
    --output_folder "$OUT_DIR" \
    --processes_count 32 \
    --thread_count 64 \
    --resize_mode no \
    --compute_hash "md5" \
    --verify_hash '["md5","md5"]' \
    --save_additional_columns '["punsafe","pwatermark","similarity","hash"]' \
    --enable_wandb "$ENABLE_WANDB" \
    --wandb_project laion-dataset

touch "$OUT_DIR/done"   # completion sentinel (reference :27)
