"""Evaluation / full-competition-inference CLI.

One pass replaces the reference's three sequential eval runs + gen_final_ans
(ref: project/my_code/run_eval.sh:17-95, test.sh, gen_final_ans.py:114-162):
loads the six prompt checkpoints with their run_eval.sh groupings, TTA-scores
every test image once (image features shared across members), applies
fuse/fuse6 + per-class routing, and writes `impreds.json`.

Usage:
    python -m leclip_tpu.cli.eval \
        --model-dir best_model --weights RN50.pt \
        --images-root /data/official_a --out impreds.json
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="leclip_tpu ensemble TTA inference")
    ap.add_argument("--dataset-config", default="")
    ap.add_argument("--trainer-config", default="")
    ap.add_argument("--model-dir", default="best_model")
    ap.add_argument("--weights", default="")
    ap.add_argument("--backbone", default="")
    ap.add_argument("--caption-bank", default="", help="pickled [N,E] caption feature bank")
    ap.add_argument("--freq-stats", default="", help="freq_stats.pkl (adj + nums)")
    ap.add_argument("--out", default="impreds.json")
    ap.add_argument("--save-dir", default="")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    return ap.parse_args(argv)


def run_eval(cfg, clip_params, clip_cfg, model_dir, caption_bank=None,
             freq_stats=None, out_json="impreds.json", save_dir="", batch_size=8):
    from ..data.datasets import build_dataset
    from ..inference.pipeline import (
        load_ensemble_specs,
        make_engine,
        run_full_inference,
    )

    dataset = build_dataset(cfg)
    specs = load_ensemble_specs(cfg, clip_params, clip_cfg, dataset.classnames, model_dir)
    engine = make_engine(cfg, clip_params, clip_cfg, specs,
                         caption_bank=caption_bank, freq_stats=freq_stats)
    images = dataset.test_images
    if not images:
        raise SystemExit("no test images found — check DATASET.ROOT / imnames json")
    return run_full_inference(
        engine, images, batch_size=batch_size,
        save_dir=save_dir or None, out_json=out_json,
    )


def main(argv=None):
    args = parse_args(argv)
    from ..engine.config import setup_config
    from .train import load_clip

    cfg = setup_config(
        dataset_yaml=args.dataset_config,
        trainer_yaml=args.trainer_config,
        opts=args.opts,
        eval_only=True,
    )
    clip_cfg, clip_params = load_clip(cfg, args)
    bank = None
    if args.caption_bank and os.path.exists(args.caption_bank):
        with open(args.caption_bank, "rb") as f:
            bank = pickle.load(f)
        # accept the reference's own bank artifact (a pickled torch.Tensor,
        # generate_caption_text_features.py:93-97) as well as our ndarray
        import numpy as np

        bank = np.asarray(bank, np.float32)
    freq = None
    if args.freq_stats and os.path.exists(args.freq_stats):
        with open(args.freq_stats, "rb") as f:
            freq = pickle.load(f)
    run_eval(cfg, clip_params, clip_cfg, args.model_dir, caption_bank=bank,
             freq_stats=freq, out_json=args.out, save_dir=args.save_dir,
             batch_size=args.batch_size)


if __name__ == "__main__":
    main()
