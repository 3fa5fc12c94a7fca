#!/usr/bin/env bash
# Single-model train/test launcher — arg-for-arg analogue of the reference's
# legacy scripts/main.sh (ref: project/my_code/scripts/main.sh): positional
# DATASET CONFIG CLASS_TOKEN_POSITION N_CTX CSC RUN_ID, per-seed output dirs
# output/<run_id>/<cfg>/nctx<N>_csc<C>_ctp<P>/seed<S>.
#
# Usage: bash scripts/main.sh <DATASET> <CFG> <CTP> <NCTX> <CSC> <RUN_ID> \
#            [WEIGHTS.pt] [SEEDS...]
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
  DIR=output/${RUN_ID}/${CFG}/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
  echo "Run this job and save the output to ${DIR}"
  python -m leclip_tpu.cli.train \
    --dataset-config "configs/datasets/${DATASET}.yaml" \
    --trainer-config "configs/trainers/${CFG}.yaml" \
    --output-dir "${DIR}" \
    --seed "${SEED}" \
    "${wflag[@]}" \
    TRAINER.N_CTX "${NCTX}" \
    TRAINER.CSC "${CSC}" \
    TRAINER.CLASS_TOKEN_POSITION "${CTP}" \
    TRAIN.ema False
done
