#!/usr/bin/env bash
# Multi-device train launcher — analogue of the reference's legacy
# scripts/main_mul.sh (ref: project/my_code/scripts/main_mul.sh, which sets
# CUDA_VISIBLE_DEVICES=0,1 for 2-GPU DDP). On TPU the data-parallel mesh is
# built over every visible device automatically (engine/trainer.py uses
# parallel.mesh.data_mesh), so this wrapper is main.sh's contract with the
# multi-device note made explicit; restrict devices with JAX_VISIBLE_DEVICES
# if needed.
#
# Usage: bash scripts/main_mul.sh <DATASET> <CFG> <CTP> <NCTX> <CSC> \
#            <RUN_ID> [WEIGHTS.pt] [SEEDS...]
set -euo pipefail

exec bash "$(dirname "$0")/main.sh" "$@"
