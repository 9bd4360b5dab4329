#!/bin/bash
# One-shot evaluation of the latest checkpoint.
set -euo pipefail
NAME="${1:?usage: eval_once.sh <config-name> [model_dir]}"
PIPELINE="configs/${NAME}.pbtxt"
MODEL_DIR="${2:-logs/${NAME}}"
python -m cap2det_tpu.cli.evaluate_main \
  --pipeline_proto "${PIPELINE}" --model_dir "${MODEL_DIR}" --run_once "${@:3}"
