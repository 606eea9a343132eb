#!/usr/bin/env bash
# End-to-end framework validation without FSC147 (zero-egress): train
# the FULL-SIZE fim6 counting model from scratch on a synthetic
# FSC147-format blob dataset through the resident-data pipeline, then
# evaluate the held-out split through the real test CLI with the
# acceptance gate.
#
# Measured on the tunneled v5e (2026-08-17): val MAE reaches ~6 by
# epoch 29 (5.4 s/epoch compute at batch 8, encoder unfrozen);
# test MAE 6.64 / RMSE 7.81 / NAE 0.27 over 32 images — far below the
# ~13 MAE of a predict-the-mean baseline; gate at --expect_mae 10
# passes. This drives every layer: dataset build, HBM store, device
# affine/mosaic/photometric augmentation, density synthesis, training
# engine, orbax checkpoints, batched sliding-window inference, TTN.
set -euo pipefail

DATA=${DATA:-/tmp/synth_fsc}
OUT=${OUT:-/tmp/synth_ft}

python scripts/make_synthetic_fsc.py --out "$DATA"

python -m countr_tpu.cli.finetune \
    --data_path "$DATA" --model mae_vit_base6_patch16 --dtype bf16 \
    --unfreeze_encoder --resident_data \
    --epochs 30 --batch_size 8 --lr 3e-4 --warmup_epochs 2 \
    --num_workers 2 --output_dir "$OUT" \
    --ckpt_every 0 --ckpt_last_every 10 --panel_every 0

python -m countr_tpu.cli.test \
    --data_path "$DATA" --model mae_vit_base6_patch16 --dtype bf16 \
    --resume "$OUT/ckpt_minMAE" --split test --output_dir "$OUT/test" \
    --expect_mae 10 --expect_tol_pct 5
