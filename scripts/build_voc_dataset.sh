#!/bin/bash
# Offline VOC dataset build (reference download_and_preprocess_voc.sh):
# selective-search proposals (N parallel worker processes, restartable)
# then TFRecords. Expects VOCdevkit already downloaded under $1.
set -euo pipefail
DATA_DIR="${1:?usage: build_voc_dataset.sh <VOCdevkit-dir> <output-dir> [num_procs]}"
OUT="${2:?output dir}"
NPROC="${3:-10}"
mkdir -p "${OUT}/ss_npy" "${OUT}/records"

for YEAR in VOC2007 VOC2012; do
  [ -d "${DATA_DIR}/${YEAR}" ] || continue
  pids=()
  for ((i=0; i<NPROC; i++)); do
    python tools/create_selective_search_data.py \
      --image_dir "${DATA_DIR}/${YEAR}/JPEGImages" \
      --output_dir "${OUT}/ss_npy" \
      --process_indicator "${i}/${NPROC}" &
    pids+=($!)
  done
  for pid in "${pids[@]}"; do wait "$pid"; done
  for SPLIT in trainval test; do
    [ -f "${DATA_DIR}/${YEAR}/ImageSets/Main/${SPLIT}.txt" ] || continue
    python tools/create_pascal_tf_record.py \
      --data_dir "${DATA_DIR}" --year "${YEAR}" --set "${SPLIT}" \
      --proposal_data_path "${OUT}/ss_npy" \
      --output_path "${OUT}/records/${YEAR}_${SPLIT}.record" --num_shards 5
  done
done
