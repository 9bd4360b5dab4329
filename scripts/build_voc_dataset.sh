#!/bin/bash
# Offline VOC dataset build (reference download_and_preprocess_voc.sh):
# selective-search proposals (N parallel worker processes, restartable)
# then TFRecords. Expects VOCdevkit already downloaded under $1, or pass
# --download to fetch the standard tars first (restartable: existing
# archives/dirs are kept).
set -euo pipefail
DOWNLOAD=0
args=()
for a in "$@"; do
  [ "$a" = "--download" ] && DOWNLOAD=1 || args+=("$a")
done
set -- "${args[@]}"
DATA_DIR="${1:?usage: build_voc_dataset.sh <VOCdevkit-dir> <output-dir> [num_procs] [--download]}"
OUT="${2:?output dir}"
NPROC="${3:-10}"
mkdir -p "${OUT}/ss_npy" "${OUT}/records"

if [ "$DOWNLOAD" = 1 ]; then
  # Mirrors reference dataset-tools/download_and_preprocess_voc.sh:13.
  mkdir -p "${DATA_DIR}"
  VOC_URL="http://host.robots.ox.ac.uk/pascal/VOC"
  for tar in voc2007/VOCtrainval_06-Nov-2007.tar \
             voc2007/VOCtest_06-Nov-2007.tar \
             voc2012/VOCtrainval_11-May-2012.tar; do
    name="$(basename "$tar")"
    [ -f "${DATA_DIR}/${name}" ] || wget -q -O "${DATA_DIR}/${name}" \
      "${VOC_URL}/${tar}"
    tar -xf "${DATA_DIR}/${name}" -C "${DATA_DIR}"
  done
  # Archives unpack to ${DATA_DIR}/VOCdevkit/VOC{2007,2012}.
  [ -d "${DATA_DIR}/VOCdevkit" ] && DATA_DIR="${DATA_DIR}/VOCdevkit"
fi

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
