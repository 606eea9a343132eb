#!/usr/bin/env bash
# Paper-reproduction pipeline (mirrors the reference run.sh:9-13:
# pretrain 300 ep -> finetune 1000 ep -> few-shot test).
set -euo pipefail

DATA="${DATA:-./data/FSC147}"
OUT="${OUT:-./out}"
MODEL="${MODEL:-mae_vit_base6_patch16}"

# 1) MAE pre-training on FSC147 train images (--resident_data keeps
#    the decoded split in HBM; ~38x the host-pipeline step rate)
python -m countr_tpu.cli.pretrain \
    --data_path "$DATA" --output_dir "$OUT/pretrain" \
    --epochs 300 --batch_size 16 --lr 5e-6 --weight_decay 0.05 \
    --resident_data --ckpt_last_every 10

# 2) supervised fine-tuning of the counting decoder (encoder
#    initialized from the pretrained MAE)
python -m countr_tpu.cli.finetune \
    --data_path "$DATA" --output_dir "$OUT/finetune" \
    --model "$MODEL" --epochs 1000 --batch_size 8 --lr 1e-5 \
    --resident_data --ckpt_last_every 10 \
    --init_from_mae "$OUT/pretrain/ckpt_params"

# 3) few-shot evaluation on the FSC147 test split
python -m countr_tpu.cli.test \
    --data_path "$DATA" --output_dir "$OUT/test" \
    --model "$MODEL" --resume "$OUT/finetune/ckpt_minMAE" --split test
