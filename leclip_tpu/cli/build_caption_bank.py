"""Caption feature-bank precompute CLI — the reference's
`generate_caption_text_features.py` (ref :77-97): encode every caption of the
training corpora with the frozen CLIP text encoder into the L2-normalised
retrieval bank used by test-time retrieval augmentation.

Usage:
    python -m leclip_tpu.cli.build_caption_bank \
        --weights RN50.pt \
        --caption-root .../generated_captions \
        --corpora "ChatGLM_multi_labels_filtered challenge_captions_5w" \
        --out caption_bank.pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="")
    ap.add_argument("--backbone", default="RN50")
    ap.add_argument("--caption-root", required=True)
    ap.add_argument("--corpora", required=True, help="space-separated corpus names")
    ap.add_argument("--out", default="caption_bank.pkl")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--precision", default="default",
                    choices=["default", "bf16", "int8"],
                    help="int8: W8A8 kernels; bf16: fused bf16 block kernels "
                         "(no quantization noise)")
    args = ap.parse_args(argv)

    from ..data.corpora import load_multi_label_corpus
    from ..data.labeling import CaptionLabeler
    from ..inference.pipeline import build_caption_bank
    from .train import load_clip

    class _A:
        weights = args.weights
        backbone = args.backbone

    from ..engine.config import setup_config

    cfg = setup_config()
    clip_cfg, clip_params = load_clip(cfg, _A)

    labeler = CaptionLabeler()
    tokens = []
    for name in args.corpora.split():
        toks, _ = load_multi_label_corpus(args.caption_root, name, labeler)
        tokens.append(toks)
    tokens = np.concatenate(tokens)
    print(f"encoding {len(tokens)} captions…")
    bank = build_caption_bank(
        clip_params, clip_cfg, tokens, args.batch_size, precision=args.precision
    )
    with open(args.out, "wb") as f:
        pickle.dump(bank, f)
    print(f"wrote {args.out}: {bank.shape}")


if __name__ == "__main__":
    main()
