#!/bin/bash
# Offline COCO-2017 dataset build (reference
# download_and_preprocess_mscoco.sh): selective-search proposals (N
# parallel worker processes, restartable), sharded caption TFRecords,
# and the GloVe-intersected caption vocabulary + embedding matrix.
# Expects train2017/ val2017/ annotations/ and glove.6B.300d.txt already
# downloaded under $1.
set -euo pipefail
DOWNLOAD=0
args=()
for a in "$@"; do
  [ "$a" = "--download" ] && DOWNLOAD=1 || args+=("$a")
done
set -- "${args[@]}"
DATA_DIR="${1:?usage: build_coco_dataset.sh <coco-dir> <output-dir> [num_procs] [--download]}"
OUT="${2:?output dir}"
NPROC="${3:-10}"
mkdir -p "${OUT}/ss_npy" "${OUT}/records"

if [ "$DOWNLOAD" = 1 ]; then
  # Mirrors reference dataset-tools/download_and_preprocess_mscoco.sh.
  mkdir -p "${DATA_DIR}"
  for z in train2017 val2017; do
    [ -d "${DATA_DIR}/${z}" ] || {
      [ -f "${DATA_DIR}/${z}.zip" ] || wget -q -O "${DATA_DIR}/${z}.zip" \
        "http://images.cocodataset.org/zips/${z}.zip"
      unzip -q -n "${DATA_DIR}/${z}.zip" -d "${DATA_DIR}"
    }
  done
  [ -d "${DATA_DIR}/annotations" ] || {
    [ -f "${DATA_DIR}/annotations_trainval2017.zip" ] || wget -q \
      -O "${DATA_DIR}/annotations_trainval2017.zip" \
      "http://images.cocodataset.org/annotations/annotations_trainval2017.zip"
    unzip -q -n "${DATA_DIR}/annotations_trainval2017.zip" -d "${DATA_DIR}"
  }
  [ -f "${DATA_DIR}/glove.6B.300d.txt" ] || {
    [ -f "${DATA_DIR}/glove.6B.zip" ] || wget -q -O "${DATA_DIR}/glove.6B.zip" \
      "http://nlp.stanford.edu/data/glove.6B.zip"
    unzip -q -n "${DATA_DIR}/glove.6B.zip" glove.6B.300d.txt -d "${DATA_DIR}"
  }
fi

for SPLIT in train2017 val2017; do
  pids=()
  for ((i=0; i<NPROC; i++)); do
    python tools/create_selective_search_data.py \
      --image_dir "${DATA_DIR}/${SPLIT}" \
      --output_dir "${OUT}/ss_npy" \
      --process_indicator "${i}/${NPROC}" &
    pids+=($!)
  done
  for pid in "${pids[@]}"; do wait "$pid"; done
done

python tools/create_coco_tf_record.py \
  --image_dir "${DATA_DIR}/train2017" \
  --caption_annotations_file "${DATA_DIR}/annotations/captions_train2017.json" \
  --instance_annotations_file "${DATA_DIR}/annotations/instances_train2017.json" \
  --proposal_data_path "${OUT}/ss_npy" \
  --output_path "${OUT}/records/coco17_train.record" --num_shards 100

python tools/create_coco_tf_record.py \
  --image_dir "${DATA_DIR}/val2017" \
  --caption_annotations_file "${DATA_DIR}/annotations/captions_val2017.json" \
  --instance_annotations_file "${DATA_DIR}/annotations/instances_val2017.json" \
  --proposal_data_path "${OUT}/ss_npy" \
  --output_path "${OUT}/records/coco17_val.record" --num_shards 5

python tools/create_vocab.py \
  --caption_annotations_file "${DATA_DIR}/annotations/captions_train2017.json" \
  --glove_file "${DATA_DIR}/glove.6B.300d.txt" \
  --output_vocabulary_file data/coco_open_vocab.txt \
  --output_vocabulary_word_embedding_file data/coco_open_vocab_300d.npy \
  --min_word_freq 20
