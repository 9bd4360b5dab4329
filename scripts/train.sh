#!/bin/bash
# Single-host training + continuous evaluation.
#
# Replaces the reference's parameter-server cluster launchers
# (train_wsod.sh / train_cap2det.sh: 1 ps + chief + 3 workers over
# TF_CONFIG): this framework is synchronous SPMD — one training process
# drives every local TPU chip through a jax.sharding.Mesh, so "the
# cluster" is just trainer + evaluator.
#
# Usage: scripts/train.sh <config_name> [model_dir]
set -euo pipefail

NAME="${1:?usage: train.sh <config-name> [model_dir]}"
PIPELINE="configs/${NAME}.pbtxt"
MODEL_DIR="${2:-logs/${NAME}}"

mkdir -p "${MODEL_DIR}"

python -m cap2det_tpu.cli.evaluate_main \
  --pipeline_proto "${PIPELINE}" \
  --model_dir "${MODEL_DIR}" \
  >> "${MODEL_DIR}/eval.log" 2>&1 &
EVAL_PID=$!
trap 'kill ${EVAL_PID} 2>/dev/null || true' EXIT

python -m cap2det_tpu.cli.train_main \
  --pipeline_proto "${PIPELINE}" \
  --model_dir "${MODEL_DIR}" \
  "${@:3}"
