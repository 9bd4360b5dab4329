#!/bin/bash
# Hardware quality-trajectory run (the strongest quality evidence this
# sandbox permits — real datasets cannot ship here; BASELINE.md states
# the remaining real-data gap):
#
#   rich multi-object synthetic scenes -> REAL C++ selective-search
#   proposals -> TFRecords -> cli.train_main on the TPU at paper-config
#   shapes (min-dim 1000 canvas, P<=500, 3 OICR iterations, crop 14),
#   then the eval daemon walks EVERY retained checkpoint
#   (--all_checkpoints) -> mAP-vs-step curve in eval_metrics.jsonl + TB
#   events + best-ckpt promotion.
#
# Train and eval run sequentially, not as concurrent processes: this
# sandbox's single TPU chip is exclusively held by one process (probed:
# a second JAX process hangs at init), so the reference's train/eval
# process split — exercised for real on the CPU mesh in
# tests/test_orchestration.py — is replaced here by post-hoc curve
# reconstruction over keep_checkpoint_max history.
#
# Usage: quality_run.sh <workdir> [num_images] [max_steps] [nproc] [extractor] [caption_style] [class_set]
#   class_set: 9 (default) or 80 — the coco17-regime class count
#   (OICR heads [P,81], 80-column NMS, 80-row extend table).
#   extractor: groundtruth (default) reads the class names the captions
#   carry through object_texts; exact_match runs the caption-token path —
#   labels extracted from the caption token ids alone (the paper's
#   Cap2Det contract, reference models/label_extractor.py:124-150);
#   extend_match additionally matches a synonym table
#   (reference models/label_extractor.py:153-207).
#   caption_style: exact (default) writes class names into captions;
#   synonyms replaces most class mentions with out-of-vocabulary
#   synonyms — the regime where exact_match degrades and extend_match
#   recovers (the paper's central comparison, README.md:210-216).
set -euo pipefail
WORK="${1:?usage: quality_run.sh <workdir> [num_images] [max_steps] [nproc] [extractor] [caption_style]}"
NUM_IMAGES="${2:-240}"
MAX_STEPS="${3:-1500}"
NPROC="${4:-1}"
EXTRACTOR="${5:-groundtruth}"
CAPTION_STYLE="${6:-exact}"
CLASS_SET="${7:-9}"
EVAL_N=$(( NUM_IMAGES * 15 / 100 ))
case "$EXTRACTOR" in
  groundtruth) EXTRACTOR_LINE="groundtruth_extractor { label_file: '__WORK__/labels.txt' }" ;;
  exact_match) EXTRACTOR_LINE="exact_match_extractor { label_file: '__WORK__/labels.txt' }" ;;
  extend_match) EXTRACTOR_LINE="extend_match_extractor { label_file: '__WORK__/synonyms.txt' }" ;;
  word_vector) EXTRACTOR_LINE="word_vector_match_extractor { label_file: '__WORK__/labels.txt' open_vocabulary_file: '__WORK__/open_vocab.txt' open_vocabulary_word_embedding_file: '__WORK__/embeddings.npy' }" ;;
  # Requires a trained text classifier at $WORK/text_model first:
  #   python -m cap2det_tpu.cli.train_main \
  #     --pipeline_proto <text pipeline over $WORK/train.record> \
  #     --model_dir $WORK/text_model
  # (hidden_units/label_threshold here must match that training config).
  text_classifier) EXTRACTOR_LINE="text_classifier_match_extractor { label_file: '__WORK__/labels.txt' open_vocabulary_file: '__WORK__/open_vocab.txt' open_vocabulary_word_embedding_file: '__WORK__/embeddings.npy' text_classifier_checkpoint_file: '__WORK__/text_model' hidden_units: 100 label_threshold: 0.5 }" ;;
  *) echo "unknown extractor: $EXTRACTOR" >&2; exit 2 ;;
esac
EXTRACTOR_LINE="${EXTRACTOR_LINE//__WORK__/$WORK}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p "$WORK"

# 1) scenes
python tools/make_rich_synthetic_dataset.py --phase images \
  --out "$WORK" --num_images "$NUM_IMAGES" --class_set "$CLASS_SET"

# 2) real C++ selective-search proposals (restartable workers)
pids=()
for ((i=0; i<NPROC; i++)); do
  python tools/create_selective_search_data.py \
    --image_dir "$WORK/images" --output_dir "$WORK/ss_npy" \
    --process_indicator "${i}/${NPROC}" --max_boxes 500 &
  pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done

# 3) records + labels (+ synonyms.txt for extend_match)
python tools/make_rich_synthetic_dataset.py --phase records --out "$WORK" \
  --caption_style "$CAPTION_STYLE" --class_set "$CLASS_SET"

# 3b) warm-start backbone: the passthrough stand-in for the ImageNet
#     checkpoint (zero-egress sandbox), loaded through the real
#     --pretrained_checkpoint overlay path. Required: the voc07-style
#     first-stage freeze below only makes sense over a warm start —
#     freezing a RANDOM first stage trains against noise features
#     (measured: mAP stays 0.0).
[ -d "$WORK/passthrough_ckpt" ] || \
  python tools/make_passthrough_checkpoint.py --output "$WORK/passthrough_ckpt"

# 4) pipeline config (voc07-style shapes; groundtruth extractor reads
#    the class names the captions carry, the exact-match contract)
# Per-(extractor, caption_style) pipeline + model dir so repeated
# invocations share one dataset (images/SS/records are reused or
# rewritten identically) while training runs stay isolated.
TAG="$EXTRACTOR-$CAPTION_STYLE"
cat > "$WORK/pipeline-$TAG.pbtxt" <<EOF
train_reader {
  cap2det_reader {
    input_pattern: "$WORK/train.record"
    is_training: true
    shuffle_buffer_size: 64
    batch_size: 2
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 1000 } }
    preprocess_options { random_flip_left_right_prob: 0.5 }
    max_num_proposals: 500
    batch_resize_scale_value: 1.0
    map_num_parallel_calls: 4
  }
}
eval_reader {
  cap2det_reader {
    input_pattern: "$WORK/eval.record"
    is_training: false
    batch_size: 1
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 600 } }
    max_num_proposals: 500
  }
}
model {
  [Cap2DetModel.ext] {
    midn_loss_weight: 1.0
    oicr_loss_weight: 0.5
    frcnn_options {
      feature_extractor { type: 'faster_rcnn_inception_v2' }
      initial_crop_size: 14
      maxpool_kernel_size: 2
      maxpool_stride: 2
      dropout_keep_prob: 0.8
      dropout_on_feature_map: false
    }
    fc_hyperparams {
      regularizer { l2_regularizer { weight: 0.000001 } }
      initializer { truncated_normal_initializer { stddev: 0.01 } }
    }
    oicr_iterations: 3
    oicr_iou_threshold: 0.5
    eval_min_dimension: 400
    eval_min_dimension: 600
    midn_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.4
      max_size_per_class: 20 max_total_size: 40
    }
    oicr_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.4
      max_size_per_class: 20 max_total_size: 40
    }
    label_extractor { $EXTRACTOR_LINE }
  }
}
train_config {
  max_steps: $MAX_STEPS
  learning_rate: 0.01
  learning_rate_decay { decay_steps: 2000 decay_rate: 0.5 staircase: true }
  optimizer { adagrad {} }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier { scope: 'second_stage_feature_extraction' multiplier: 1.0 }
  save_checkpoints_steps: 250
  keep_checkpoint_max: 50
  log_step_count_steps: 25
}
eval_config { steps: $EVAL_N }
EOF

MODEL_DIR="$WORK/model-$TAG"
mkdir -p "$MODEL_DIR"

# 5) train on the chip (exclusive holder)
python -m cap2det_tpu.cli.train_main \
  --pipeline_proto "$WORK/pipeline-$TAG.pbtxt" --model_dir "$MODEL_DIR" \
  --pretrained_checkpoint "$WORK/passthrough_ckpt" \
  > "$WORK/train-$TAG.log" 2>&1

# 6) walk every retained checkpoint -> mAP-vs-step curve
python -m cap2det_tpu.cli.evaluate_main \
  --pipeline_proto "$WORK/pipeline-$TAG.pbtxt" --model_dir "$MODEL_DIR" \
  --max_eval_examples "$EVAL_N" --all_checkpoints --max_idle_polls 1 \
  --poll_interval 1 \
  > "$WORK/eval-$TAG.log" 2>&1

echo "quality run done; curves: $MODEL_DIR/eval_metrics.jsonl"
