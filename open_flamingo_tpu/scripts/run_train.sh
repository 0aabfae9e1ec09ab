#!/bin/bash
# TPU pod training launcher (parity with the reference's Slurm
# scripts/run_train.sh). On Cloud TPU pods, run this on every host
# (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`);
# jax.distributed.initialize autodetects the topology.
set -euo pipefail

export PYTHONFAULTHANDLER=1

python -m open_flamingo_tpu.train.cli \
  --lm_path mosaicml/mpt-1b-redpajama-200b \
  --tokenizer_path "${TOKENIZER_PATH:-}" \
  --cross_attn_every_n_layers 1 \
  --precision bf16 \
  --run_name "${RUN_NAME:-OpenFlamingo-3B-TPU}" \
  --batch_size_mmc4 32 \
  --batch_size_laion 64 \
  --train_num_samples_mmc4 125000 \
  --train_num_samples_laion 250000 \
  --loss_multiplier_laion 0.2 \
  --workers 8 \
  --dataset_resampled \
  --mmc4_shards "${MMC4_SHARDS:?set MMC4_SHARDS}" \
  --laion_shards "${LAION_SHARDS:?set LAION_SHARDS}" \
  --gradient_checkpointing \
  --num_epochs 480 \
  --warmup_steps 1875 \
  --mmc4_textsim_threshold 0.24 \
  --mesh_model 1 \
  --report_to_wandb \
  "$@"
