#!/usr/bin/env bash
# Full competition inference: one TTA pass over the test images scoring all
# six prompt checkpoints, fused to impreds.json (the test.sh + run_eval.sh +
# gen_final_ans.py equivalent, collapsed into a single pass).
#
# Usage: bash scripts/eval_all.sh <DATA_ROOT> <CAPTION_ROOT> <CLIP_WEIGHTS.pt> \
#          [MODEL_DIR] [CAPTION_BANK.pkl] [FREQ_STATS.pkl]
set -euo pipefail

DATA=${1:?data root}
CAPS=${2:?caption feature root}
WEIGHTS=${3:?CLIP RN50 checkpoint}
MODELS=${4:-best_model}
BANK=${5:-}
FREQ=${6:-}

args=(--weights "$WEIGHTS" --model-dir "$MODELS" --out impreds.json --save-dir eval_output
      DATASET.NAME chatglm_caption_mix DATASET.ROOT "$DATA"
      DATASET.caption_feat_root "$CAPS" TEST.multi_scale "(2,3,4)" TEST.use_freq True)
[ -n "$BANK" ] && args+=(--caption-bank "$BANK")
[ -n "$FREQ" ] && args+=(--freq-stats "$FREQ")

python -m leclip_tpu.cli.eval "${args[@]}"
