#!/usr/bin/env bash
# Run the full offline caption-generation stage — the train_1.sh equivalent
# (ref: /root/reference/train_1.sh — single / challenge / composition /
# caption / filter generation in sequence).
#
# Usage: bash scripts/gen_captions_all.sh <OUT_ROOT> [LLM_DIR]
#   OUT_ROOT  output directory for the caption artifacts
#   LLM_DIR   local LLM checkpoint: a ChatGLM dir (default backend) or any
#             HuggingFace causal-LM dir via GEN_BACKEND=hf
set -euo pipefail

OUT=${1:?output root}
LLM=${2:-THUDM/chatglm-6b}
BACKEND_FLAG=--chatglm
[ "${GEN_BACKEND:-chatglm}" = hf ] && BACKEND_FLAG=--hf

mkdir -p "$OUT"
gen() { python -m leclip_tpu.cli.gen_captions "$BACKEND_FLAG" "$LLM" "$@"; }

# single-label corpora (ref gen_caption_single.py, loop_num 5)
gen single --loops 5 --out-dir "$OUT"

# class co-occurrence compositions (ref gen_compositions.py, 6000 chats)
gen compositions --n 6000 --out "$OUT/compositions_of_image.json"

# challenge hard-class corpus (ref gen_caption_challenge.py)
mkdir -p "$OUT/challenge"
gen challenge --compositions "$OUT/compositions_of_image.json" \
    --out "$OUT/challenge/captions_score_challenge.jsonl"

# multi-label caption raw dumps (ref gen_caption.py, st/ed shards, loop_num 4)
gen captions --compositions "$OUT/compositions_of_image.json" \
    --save-root "$OUT/gen_caption" --st "${ST:-0}" --ed "${ED:-25000}" --loops 4

# rule (+ optional LLM-judge) filtering → labeled training corpus
# (ref filter_caption.py)
gen filter --captions "$OUT/gen_caption" \
    --out "$OUT/ChatGLM_multi_labels_filtered.json"
