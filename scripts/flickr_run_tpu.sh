#!/bin/bash
# flickr30k_text_classifier_match on the TPU, end-to-end through the
# REAL flickr tooling path (reference train.sh + configs/
# flickr30k_text_classifier_match.pbtxt + dataset-tools/
# create_flickr30k_tf_record.py):
#
#   synthetic scenes -> results_20130124.token caption TSV -> REAL C++
#   selective-search proposals -> create_flickr30k_tf_record.py (the
#   caption-only flickr schema: no gt boxes in the train records) ->
#   create_vocab.py over the token TSV + a GloVe-format stand-in ->
#   text classifier trained on labeled records (the stand-in for the
#   reference's COCO-trained zoo/coco17_text) -> Cap2Det trained from
#   flickr records with the text_classifier_match extractor on the
#   chip -> mAP eval over a held-out gt split (standing in for the
#   reference's VOC07-test eval reader).
#
# Real Flickr30k images/GloVe cannot ship in this sandbox (zero
# egress); every TOOL in the chain is the real one.
#
# Usage: flickr_run_tpu.sh <workdir> [num_images] [max_steps]
set -euo pipefail
WORK="${1:?usage: flickr_run_tpu.sh <workdir> [num_images] [max_steps]}"
NUM_IMAGES="${2:-120}"
MAX_STEPS="${3:-500}"
TEXT_STEPS="${4:-600}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p "$WORK"
EVAL_N=$(( NUM_IMAGES * 15 / 100 ))

# 1) scenes (+ gt.jsonl for the eval split)
python tools/make_rich_synthetic_dataset.py --phase images \
  --out "$WORK" --num_images "$NUM_IMAGES"

# 2) real C++ selective-search proposals
python tools/create_selective_search_data.py \
  --image_dir "$WORK/images" --output_dir "$WORK/ss_npy" --max_boxes 500

# 3) labeled records (text-model training + gt eval split) + labels.txt
python tools/make_rich_synthetic_dataset.py --phase records --out "$WORK"

# 4) flickr caption TSV (<image>.jpg#<k>\t<caption>) for the TRAIN
#    split + a GloVe-text-format embedding stand-in covering the
#    caption vocabulary (same unit-vector scheme as write_embeddings).
python - "$WORK" <<'EOF'
import json, os, sys
import numpy as np
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
from make_rich_synthetic_dataset import (
    CLASSES, SYNONYMS, _FILLER, make_captions)

work = sys.argv[1]
rows = [json.loads(l) for l in open(os.path.join(work, "gt.jsonl"))]
rows.sort(key=lambda r: r["image_id"])
n_eval = max(1, int(len(rows) * 0.15))
train_rows = rows[n_eval:]
rng = np.random.default_rng(7)
with open(os.path.join(work, "results_20130124.token"), "w") as fid:
    for row in train_rows:
        caps = make_captions(rng, row["classes"], "exact")
        for k, cap in enumerate(caps):
            fid.write("%s.jpg#%d\t%s\n" % (row["image_id"], k, " ".join(cap)))

# GloVe text stand-in: classes get unit vectors, synonyms their class
# vector + noise, fillers independent — create_vocab.py parses this
# with the real GloVe loader.
dims = 50
erng = np.random.default_rng(11)
unit = lambda v: v / max(np.linalg.norm(v), 1e-12)
vecs = {}
for cls in CLASSES:
    vecs[cls] = unit(erng.normal(size=dims))
for cls in CLASSES:
    for syn in SYNONYMS[cls]:
        vecs[syn] = unit(vecs[cls] + 0.25 * erng.normal(size=dims))
for filler in _FILLER:
    vecs[filler] = unit(erng.normal(size=dims))
with open(os.path.join(work, "glove_synth.txt"), "w") as fid:
    for word, v in vecs.items():
        fid.write("%s %s\n" % (word, " ".join("%.6f" % x for x in v)))
print("token TSV over %d train images; glove stand-in %d words"
      % (len(train_rows), len(vecs)))
EOF

# 5) REAL flickr record builder (caption-only schema, SS proposals)
mkdir -p "$WORK/records"
python tools/create_flickr30k_tf_record.py \
  --image_source "$WORK/images" \
  --annotation_path "$WORK/results_20130124.token" \
  --proposal_data_path "$WORK/ss_npy" \
  --output_path "$WORK/records/flickr30k_trainval.record" --num_shards 2

# 6) REAL vocab builder over the token TSV
python tools/create_vocab.py \
  --caption_tsv_file "$WORK/results_20130124.token" \
  --glove_file "$WORK/glove_synth.txt" \
  --output_vocabulary_file "$WORK/open_vocab.txt" \
  --output_vocabulary_word_embedding_file "$WORK/open_vocab_50d.npy" \
  --min_word_freq 1

# 7) text classifier (the zoo/coco17_text stand-in), trained on the
#    LABELED records — mirrors the reference training it on COCO and
#    applying it to flickr captions.
cat > "$WORK/pipeline-text.pbtxt" <<EOF
train_reader {
  cap2det_reader {
    decode_image: false
    input_pattern: "$WORK/train.record"
    is_training: true
    shuffle_buffer_size: 256
    batch_size: 20
    max_num_proposals: 500
  }
}
eval_reader {
  cap2det_reader {
    decode_image: false
    input_pattern: "$WORK/eval.record"
    is_training: false
    batch_size: 1
    max_num_proposals: 500
  }
}
model {
  [TextModel.ext] {
    label_extractor { label_file: '$WORK/labels.txt' }
    text_classifier {
      label_file: '$WORK/labels.txt'
      open_vocabulary_file: '$WORK/open_vocab.txt'
      open_vocabulary_word_embedding_file: '$WORK/open_vocab_50d.npy'
      hidden_units: 400
      dropout_keep_proba: 0.5
      regularizer: 1e-5
      label_threshold: 0.7
    }
  }
}
train_config {
  max_steps: $TEXT_STEPS
  learning_rate: 0.1
  moving_average_decay: 0.0
  optimizer { adagrad {} }
  save_checkpoints_steps: $TEXT_STEPS
  keep_checkpoint_max: 2
  log_step_count_steps: 100
}
eval_config { steps: $EVAL_N }
EOF
python -m cap2det_tpu.cli.train_main \
  --pipeline_proto "$WORK/pipeline-text.pbtxt" \
  --model_dir "$WORK/text_model" \
  > "$WORK/train-text.log" 2>&1 || { tail -5 "$WORK/train-text.log"; exit 1; }

# 8) warm-start backbone (passthrough ImageNet stand-in)
[ -d "$WORK/passthrough_ckpt" ] || \
  python tools/make_passthrough_checkpoint.py --output "$WORK/passthrough_ckpt"

# 9) Cap2Det from the flickr records; shapes/extractor/freeze per
#    configs/flickr30k_text_classifier_match.pbtxt (paths + eval reader
#    adjusted: flickr has no gt boxes, the reference evals on VOC07
#    test — here the held-out gt split stands in).
cat > "$WORK/pipeline-flickr.pbtxt" <<EOF
train_reader {
  cap2det_reader {
    input_pattern: "$WORK/records/flickr30k_trainval.record*"
    is_training: true
    shuffle_buffer_size: 64
    batch_size: 2
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 1000 } }
    preprocess_options { random_flip_left_right_prob: 0.5 }
    max_num_proposals: 500
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
      dropout_keep_prob: 0.5
      dropout_on_feature_map: false
    }
    fc_hyperparams {
      regularizer { l2_regularizer { weight: 0.000001 } }
      initializer { truncated_normal_initializer { stddev: 0.01 } }
    }
    oicr_iterations: 3
    oicr_iou_threshold: 0.6
    eval_min_dimension: 400
    eval_min_dimension: 600
    midn_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.4
      max_size_per_class: 20 max_total_size: 40
    }
    oicr_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.3
      max_size_per_class: 20 max_total_size: 40
    }
    oicr_use_proba_r_given_c: true
    label_extractor {
      text_classifier_match_extractor {
        label_file: '$WORK/labels.txt'
        open_vocabulary_file: '$WORK/open_vocab.txt'
        open_vocabulary_word_embedding_file: '$WORK/open_vocab_50d.npy'
        text_classifier_checkpoint_file: '$WORK/text_model'
        hidden_units: 400
        label_threshold: 0.7
      }
    }
  }
}
train_config {
  max_steps: $MAX_STEPS
  learning_rate: 0.01
  moving_average_decay: 0.0
  optimizer { adagrad {} }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier { scope: 'second_stage_feature_extraction' multiplier: 1.0 }
  save_checkpoints_steps: 250
  keep_checkpoint_max: 10
  log_step_count_steps: 25
}
eval_config { steps: $EVAL_N }
EOF
MODEL_DIR="$WORK/model-flickr"
mkdir -p "$MODEL_DIR"
python -m cap2det_tpu.cli.train_main \
  --pipeline_proto "$WORK/pipeline-flickr.pbtxt" --model_dir "$MODEL_DIR" \
  --pretrained_checkpoint "$WORK/passthrough_ckpt" \
  > "$WORK/train-flickr.log" 2>&1 || { tail -5 "$WORK/train-flickr.log"; exit 1; }

python -m cap2det_tpu.cli.evaluate_main \
  --pipeline_proto "$WORK/pipeline-flickr.pbtxt" --model_dir "$MODEL_DIR" \
  --max_eval_examples "$EVAL_N" --all_checkpoints --max_idle_polls 1 \
  --poll_interval 1 \
  > "$WORK/eval-flickr.log" 2>&1 || { tail -5 "$WORK/eval-flickr.log"; exit 1; }
echo "flickr run done; curves: $MODEL_DIR/eval_metrics.jsonl"
