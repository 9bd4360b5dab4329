#!/bin/bash
# Offline Flickr30k dataset build (reference
# download_and_preprocess_flickr30k.sh): selective-search proposals,
# one trainval TFRecord set from the caption TSV, and the vocabulary /
# embedding matrix. Expects flickr30k_images/ and results_20130124.token
# (caption TSV) plus glove.6B.300d.txt under $1.
set -euo pipefail
DOWNLOAD=0
args=()
for a in "$@"; do
  [ "$a" = "--download" ] && DOWNLOAD=1 || args+=("$a")
done
set -- "${args[@]}"
DATA_DIR="${1:?usage: build_flickr30k_dataset.sh <flickr30k-dir> <output-dir> [num_procs] [--download]}"
OUT="${2:?output dir}"
NPROC="${3:-10}"
mkdir -p "${OUT}/ss_npy" "${OUT}/records"

if [ "$DOWNLOAD" = 1 ]; then
  # GloVe only: the Flickr30k images/captions require a signed agreement
  # (no public URL — same limitation as the reference's instructions).
  mkdir -p "${DATA_DIR}"
  [ -f "${DATA_DIR}/glove.6B.300d.txt" ] || {
    [ -f "${DATA_DIR}/glove.6B.zip" ] || wget -q -O "${DATA_DIR}/glove.6B.zip" \
      "http://nlp.stanford.edu/data/glove.6B.zip"
    unzip -q -n "${DATA_DIR}/glove.6B.zip" glove.6B.300d.txt -d "${DATA_DIR}"
  }
  if [ ! -d "${DATA_DIR}/flickr30k_images" ]; then
    echo "NOTE: flickr30k_images/ + results_20130124.token must be" \
         "obtained via the dataset's request form; --download only" \
         "fetches GloVe." >&2
  fi
fi

pids=()
for ((i=0; i<NPROC; i++)); do
  python tools/create_selective_search_data.py \
    --image_dir "${DATA_DIR}/flickr30k_images" \
    --output_dir "${OUT}/ss_npy" \
    --process_indicator "${i}/${NPROC}" &
  pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done

python tools/create_flickr30k_tf_record.py \
  --image_source "${DATA_DIR}/flickr30k_images" \
  --annotation_path "${DATA_DIR}/results_20130124.token" \
  --proposal_data_path "${OUT}/ss_npy" \
  --output_path "${OUT}/records/flickr30k_trainval.record" --num_shards 20

python tools/create_vocab.py \
  --caption_tsv_file "${DATA_DIR}/results_20130124.token" \
  --glove_file "${DATA_DIR}/glove.6B.300d.txt" \
  --output_vocabulary_file data/flickr30k_open_vocab.txt \
  --output_vocabulary_word_embedding_file data/flickr30k_open_vocab_300d.npy \
  --min_word_freq 10
