#!/usr/bin/env bash
# Zero-shot CLIP evaluation launcher — analogue of the reference's legacy
# scripts/zsclip.sh (ref: project/my_code/scripts/zsclip.sh, trainer
# ZeroshotCLIP_dense): scores a directory of images with "a photo of a {}"
# prompts (dense + global logits) and writes predictions; skips if the
# output dir already exists, like the reference.
#
# Usage: bash scripts/zsclip.sh <IMAGES_DIR> <WEIGHTS.pt> [SAVE_DIR] [--templates]
set -euo pipefail

IMAGES=${1:?images directory}
WEIGHTS=${2:?CLIP checkpoint (.pt)}
SAVE=${3:-output/evaluation/zsclip}
shift $(( $# > 3 ? 3 : $# ))

if [ -d "$SAVE" ]; then
  echo "Results are available in ${SAVE}. Skip this job"
  exit 0
fi
mkdir -p "$SAVE"
echo "Run this job and save the output to ${SAVE}"
python -m leclip_tpu.cli.zeroshot \
  --weights "$WEIGHTS" \
  --images-dir "$IMAGES" \
  --out "${SAVE}/preds.json" \
  "$@"
