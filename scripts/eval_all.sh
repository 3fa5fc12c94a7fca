#!/usr/bin/env bash
# Full competition inference: one TTA pass over the test images scoring all
# six prompt checkpoints, fused to impreds.json (the test.sh + run_eval.sh +
# gen_final_ans.py equivalent, collapsed into a single pass).
#
# Usage: bash scripts/eval_all.sh <DATA_ROOT> <CAPTION_ROOT> <CLIP_WEIGHTS.pt> \
#          [MODEL_DIR] [CAPTION_BANK.pkl] [FREQ_STATS.pkl]
#
# SCALES / EVAL_BATCH env overrides select the crop pyramid and batch size;
# SCALES="(2,3,4,5)" EVAL_BATCH=8 reproduces the reference's
# run_eval_4scales.sh variant (ref run_eval_4scales.sh: scales 2/3/4/5,
# batch 8; default mirrors run_eval.sh's 2/3/4).
set -euo pipefail

DATA=${1:?data root}
CAPS=${2:?caption feature root}
WEIGHTS=${3:?CLIP RN50 checkpoint}
MODELS=${4:-best_model}
BANK=${5:-}
FREQ=${6:-}
SCALES=${SCALES:-(2,3,4)}

args=(--weights "$WEIGHTS" --model-dir "$MODELS" --out impreds.json --save-dir eval_output
      DATASET.NAME chatglm_caption_mix DATASET.ROOT "$DATA"
      DATASET.caption_feat_root "$CAPS" TEST.multi_scale "$SCALES" TEST.use_freq True)
[ -n "$BANK" ] && args+=(--caption-bank "$BANK")
[ -n "$FREQ" ] && args+=(--freq-stats "$FREQ")
[ -n "${EVAL_BATCH:-}" ] && args+=(--batch-size "$EVAL_BATCH")

python -m leclip_tpu.cli.eval "${args[@]}"
