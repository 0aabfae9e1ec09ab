#!/bin/bash
# Eval launcher (parity with the reference's scripts/run_eval.sh).
#
# RICES (--rices): retrieval needs REAL CLIP ViT-B-32 weights via
# --rices_vision_encoder_pretrained (a local .pt/HF dir — no network in
# this env). Without weights the retrieval encoder is RANDOMLY
# INITIALIZED and demo selection is meaningless; the harness prints a
# warning but still runs (mechanics-only mode for tests).
#
# int8 decode: add --int8_decode for int8 weight-streaming generation
# (halves the per-token weight DMA; prefill/scoring stay bf16).
set -euo pipefail

python -m open_flamingo_tpu.eval.evaluate \
  --vision_encoder_path ViT-L-14 \
  --lm_path mosaicml/mpt-1b-redpajama-200b \
  --checkpoint_path "${CKPT_PATH:?set CKPT_PATH}" \
  --cross_attn_every_n_layers 1 \
  --precision bf16 \
  --results_file results.json \
  --batch_size 8 \
  --shots 0 4 8 16 32 \
  --eval_coco \
  --coco_image_dir_path "${COCO_TRAIN_IMAGES:-}" \
  --coco_val_image_dir_path "${COCO_VAL_IMAGES:-}" \
  --coco_karpathy_json_path "${COCO_KARPATHY_JSON:-}" \
  --eval_vqav2 \
  --vqav2_train_image_dir_path "${VQAV2_TRAIN_IMAGES:-}" \
  --vqav2_train_questions_json_path "${VQAV2_TRAIN_Q:-}" \
  --vqav2_train_annotations_json_path "${VQAV2_TRAIN_A:-}" \
  --vqav2_test_image_dir_path "${VQAV2_TEST_IMAGES:-}" \
  --vqav2_test_questions_json_path "${VQAV2_TEST_Q:-}" \
  --vqav2_test_annotations_json_path "${VQAV2_TEST_A:-}" \
  "$@"
