#!/usr/bin/env bash
# Train all six ensemble prompt models and collect the epochs the winning
# submission shipped (the train_2.sh equivalent; ref: /root/reference/train_2.sh).
#
# Usage: bash scripts/train_all.sh <DATA_ROOT> <CAPTION_ROOT> <CLIP_WEIGHTS.pt> [OUT_DIR]
set -euo pipefail

DATA=${1:?data root}
CAPS=${2:?caption feature root (parent of generated_captions/)}
WEIGHTS=${3:?CLIP RN50 checkpoint}
OUT=${4:-./train_output}

common=(--weights "$WEIGHTS" DATASET.ROOT "$DATA" DATASET.caption_feat_root "$CAPS" DATASET.dataset_select B)

# model  config        seed  picked epoch (train_2.sh:30-52)
train_one() { # name cfg seed epoch
  local name=$1 cfg=$2 seed=$3 epoch=$4
  python -m leclip_tpu.cli.train --trainer-config "configs/trainers/${cfg}.yaml" \
    --output-dir "${OUT}/${name}" --seed "${seed}" "${common[@]}"
  mkdir -p best_model/${name}
  cp "${OUT}/${name}/prompt_learner/model.ckpt-${epoch}" "best_model/${name}/model.ckpt"
}

train_one best  best  0 4
train_one ema   ema   1 79
train_one zema  zema  1 79
train_one diffh diffh 1 79
train_one diff  diff  1 9
train_one difft difft 1 9
