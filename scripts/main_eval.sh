#!/usr/bin/env bash
# Single-model eval-only launcher — arg-for-arg analogue of the reference's
# legacy scripts/main_eval.sh (ref: project/my_code/scripts/main_eval.sh):
# positional DATASET CONFIG CLASS_TOKEN_POSITION N_CTX CSC RUN_ID, loads the
# checkpoints a main.sh run wrote under output/<run_id>/... and writes
# evaluation output to output/evaluation/<run_id>/... per seed.
#
# Usage: bash scripts/main_eval.sh <DATASET> <CFG> <CTP> <NCTX> <CSC> \
#            <RUN_ID> [WEIGHTS.pt] [SEEDS...]
set -euo pipefail

DATASET=${1:?dataset yaml name (configs/datasets/<name>.yaml)}
CFG=${2:?trainer yaml name (configs/trainers/<name>.yaml)}
CTP=${3:?class token position (end|middle|front)}
NCTX=${4:?number of context tokens}
CSC=${5:?class-specific context (True|False)}
RUN_ID=${6:?run id}
WEIGHTS=${7:-}
shift $(( $# > 7 ? 7 : $# ))
SEEDS=(${@:-1})

wflag=()
[ -n "$WEIGHTS" ] && wflag=(--weights "$WEIGHTS") || wflag=(--backbone RN50)

for SEED in "${SEEDS[@]}"; do
  MODEL_DIR=output/${RUN_ID}/${CFG}/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
  DIR=output/evaluation/${RUN_ID}/${CFG}/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
  echo "Run this job and save the output to ${DIR}"
  mkdir -p "${DIR}"
  python -m leclip_tpu.cli.eval \
    --dataset-config "configs/datasets/${DATASET}.yaml" \
    --trainer-config "configs/trainers/${CFG}.yaml" \
    --model-dir "${MODEL_DIR}" \
    --out "${DIR}/impreds.json" \
    "${wflag[@]}" \
    TRAINER.N_CTX "${NCTX}" \
    TRAINER.CSC "${CSC}" \
    TRAINER.CLASS_TOKEN_POSITION "${CTP}"
done
