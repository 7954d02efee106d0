#!/usr/bin/env bash
# One-shot dataset setup: download -> prepare -> print the train command.
# Counterpart of /root/reference/datasets/setup_dataset.sh.
set -euo pipefail

SCENE="${1:-garden}"
RAW_DIR="${2:-data/raw}"
OUT_DIR="${3:-data/${SCENE}}"
DOWNSAMPLE="${4:-4}"

HERE="$(cd "$(dirname "$0")" && pwd)"

echo "== downloading Mip-NeRF 360 scene '${SCENE}' =="
python "${HERE}/prepare_dataset.py" download --scene "${SCENE}" \
    --output_dir "${RAW_DIR}"

echo "== preparing training layout =="
python "${HERE}/prepare_dataset.py" mipnerf \
    --input_dir "${RAW_DIR}/${SCENE}" \
    --output_dir "${OUT_DIR}" \
    --scene_name "${SCENE}" \
    --downsample "${DOWNSAMPLE}"

echo
echo "Ready. Train with:"
echo "  python ${HERE}/train.py --data_dir ${OUT_DIR} --output_dir output/${SCENE}"
