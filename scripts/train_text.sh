#!/bin/bash
# Text-classifier pretraining (reference train_text.sh): trains the
# caption classifier whose checkpoint warm-starts the
# text_classifier_match label extractor.
set -euo pipefail
NAME="${1:?usage: train_text.sh <config-name> [model_dir]}"
exec scripts/train.sh "${NAME}" "${2:-logs/${NAME}}"
