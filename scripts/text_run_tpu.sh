#!/bin/bash
# coco17_text on the TPU: trains the caption text classifier (embedding
# -> FC -> masked-max -> FC -> sigmoid CE, reference train_text.sh +
# configs/coco17_text.pbtxt) at the reference's training shapes
# (batch 20, hidden 400, adagrad 0.1) on the attached chip, then runs
# the P/R@{.3,.5,.7} + P/R@k{1,5} evaluation.
#
# Real COCO captions/GloVe cannot ship in this sandbox; records are the
# standard synthetic caption examples over the REAL 80-class COCO label
# list (data/coco_label.txt) and the REAL 7.4k-word COCO open vocabulary
# (data/coco_open_vocab.txt, extended with the multi-word class names the
# tokenizer emits as single tokens), with a synthetic embedding table
# standing in for GloVe (zero-egress sandbox). The classifier trains on
# top of the frozen table exactly as in the reference.
#
# Usage: text_run_tpu.sh <workdir> [max_steps]
set -euo pipefail
WORK="${1:?usage: text_run_tpu.sh <workdir> [max_steps]}"
MAX_STEPS="${2:-100000}"   # reference configs/coco17_text.pbtxt max_steps
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p "$WORK"

python - "$WORK" <<'EOF'
import os, sys
import numpy as np

work = sys.argv[1]
sys.path.insert(0, ".")
from cap2det_tpu.data import synthetic

classes = [l.strip() for l in open("data/coco_label.txt") if l.strip()]
assert len(classes) == 80
synthetic.write_synthetic_dataset(
    os.path.join(work, "text_train.record"), num_examples=600, seed=0,
    classes=classes, with_image=False, num_proposals=8,
)
synthetic.write_synthetic_dataset(
    os.path.join(work, "text_eval.record"), num_examples=120, seed=1,
    classes=classes, with_image=False, num_proposals=8,
)

# Open vocabulary: the real COCO list + any class names it lacks as
# single tokens (multi-word COCO names like 'traffic light' arrive as
# one caption token from the record builder).
vocab = [l.rstrip("\n") for l in open("data/coco_open_vocab.txt")]
have = set(vocab)
vocab += [c for c in classes if c not in have]
with open(os.path.join(work, "open_vocab.txt"), "w") as fid:
    fid.write("\n".join(vocab))
rs = np.random.RandomState(0)
# GloVe-300d vectors have per-vector norms ~6-9; a 0.1-scale stand-in
# starves the frozen-embedding features (measured: P@1 0.058 after 3k
# steps at scale 0.1 vs 0.658 after 600 steps at scale 0.5).
emb = (rs.randn(len(vocab), 300) * 0.5).astype(np.float32)
np.save(os.path.join(work, "open_vocab_300d.npy"), emb)
print("records + vocab(%d) + embeddings ready" % len(vocab))
EOF

# Pipeline mirrors configs/coco17_text.pbtxt (paths + max_steps adjusted;
# eval runs over the 120 held-out examples).
cat > "$WORK/pipeline-text.pbtxt" <<EOF
train_reader {
  cap2det_reader {
    decode_image: false
    input_pattern: "$WORK/text_train.record"
    is_training: true
    shuffle_buffer_size: 2000
    batch_size: 20
    max_num_proposals: 500
  }
}
eval_reader {
  cap2det_reader {
    decode_image: false
    input_pattern: "$WORK/text_eval.record"
    is_training: false
    batch_size: 1
    max_num_proposals: 500
  }
}
model {
  [TextModel.ext] {
    label_extractor { label_file: 'data/coco_label.txt' }
    text_classifier {
      label_file: 'data/coco_label.txt'
      open_vocabulary_file: '$WORK/open_vocab.txt'
      open_vocabulary_word_embedding_file: '$WORK/open_vocab_300d.npy'
      hidden_units: 400
      dropout_keep_proba: 0.5
      regularizer: 1e-5
      label_threshold: 0.7
    }
  }
}
train_config {
  max_steps: $MAX_STEPS
  learning_rate: 0.1
  learning_rate_decay { decay_steps: 20000 decay_rate: 1.0 staircase: false }
  moving_average_decay: 0.0
  optimizer { adagrad {} }
  save_summary_steps: 2000
  save_checkpoints_steps: 1000
  keep_checkpoint_max: 10
  log_step_count_steps: 100
}
eval_config { steps: 120 }
EOF

MODEL_DIR="$WORK/model"
mkdir -p "$MODEL_DIR"

echo "training on $(python -c 'import jax; print(jax.devices())' 2>/dev/null | tail -1) ..."
python -m cap2det_tpu.cli.train_main \
  --pipeline_proto "$WORK/pipeline-text.pbtxt" --model_dir "$MODEL_DIR" \
  > "$WORK/train.log" 2>&1 || { tail -5 "$WORK/train.log"; exit 1; }
tail -2 "$WORK/model/metrics.jsonl" || true

python -m cap2det_tpu.cli.evaluate_main \
  --pipeline_proto "$WORK/pipeline-text.pbtxt" --model_dir "$MODEL_DIR" \
  --run_once --max_eval_examples 120 \
  > "$WORK/eval.log" 2>&1 || { tail -5 "$WORK/eval.log"; exit 1; }
tail -20 "$WORK/eval.log"
echo "text run done; logs in $WORK"
