"""Training CLI — mirrors the reference entry point's argument surface
(ref: project/my_code/train_caption.py:169-250 and the run_seed*.sh
launchers): dataset/trainer config YAMLs, free-form KEY VALUE overrides,
seed, output dir, resume, eval-only.

Usage:
    python -m leclip_tpu.cli.train \
        --trainer-config configs/trainers/best.yaml \
        --output-dir output/best \
        --weights /path/to/RN50.pt \
        TRAIN.ema True OPTIM.LR 1e-5
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="leclip_tpu prompt-tuning trainer")
    ap.add_argument("--dataset-config", default="", help="dataset yaml")
    ap.add_argument("--trainer-config", default="", help="trainer yaml")
    ap.add_argument("--output-dir", default="./output")
    ap.add_argument("--weights", default="", help="OpenAI CLIP checkpoint (.pt)")
    ap.add_argument("--backbone", default="", help="backbone preset when no weights (RN50, ViT-B/16, ...)")
    ap.add_argument("--trainer", default="",
                    help="TRAINER_REGISTRY name (ref --trainer; default "
                         "Caption_distill_double)")
    ap.add_argument("--resume", default="")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--model-dir", default="", help="checkpoint dir for eval-only")
    ap.add_argument("opts", nargs=argparse.REMAINDER, help="KEY VALUE overrides")
    return ap.parse_args(argv)


def load_clip(cfg, args):
    """CLIP weights from an OpenAI checkpoint, or random init from a preset
    (for dry runs / CI — real runs should pass --weights)."""
    import jax
    import jax.numpy as jnp

    from ..models.clip import PRESETS, init_clip_params
    from ..models.convert import load_clip_weights

    path = args.weights or cfg.MODEL.WEIGHTS
    if path and os.path.exists(path):
        return load_clip_weights(path)
    name = args.backbone or cfg.MODEL.BACKBONE_NAME
    clip_cfg = PRESETS[name]
    print(f"WARNING: no CLIP weights found; random-initialising {name}")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_clip_params(jax.random.PRNGKey(0), clip_cfg, dtype=jnp.float32)
    return clip_cfg, params


def main(argv=None):
    args = parse_args(argv)
    from ..engine.config import setup_config
    from ..engine.trainer import CaptionDistillTrainer
    from ..parallel.multihost import initialize as multihost_initialize
    from ..utils.logging import set_random_seed, setup_logger

    # joins the multi-process runtime on TPU pods (auto-detected); no-op on
    # a single host — the SPMD analogue of the reference's
    # dist.init_process_group (train_caption.py:176-179)
    multihost_initialize()
    cfg = setup_config(
        dataset_yaml=args.dataset_config,
        trainer_yaml=args.trainer_config,
        # --trainer lands before the free-form opts, like the reference's
        # reset_cfg → merge_from_list order (train_caption.py:158-162)
        opts=(["TRAINER.NAME", args.trainer] if args.trainer else []) + (args.opts or []),
        OUTPUT_DIR=args.output_dir,
        RESUME=args.resume,
        SEED=args.seed,
        eval_only=args.eval_only,
    )
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logger(cfg.OUTPUT_DIR)
    set_random_seed(cfg.SEED)
    print("config:", cfg.to_dict())

    clip_cfg, clip_params = load_clip(cfg, args)

    if args.eval_only:
        from .eval import run_eval

        return run_eval(cfg, clip_params, clip_cfg, args.model_dir or cfg.OUTPUT_DIR)

    from ..engine.trainer import build_trainer

    trainer = build_trainer(cfg, clip_params, clip_cfg)
    trainer.train(resume=bool(args.resume))
    if not cfg.TEST.NO_TEST:
        # reference after_train final test (dassl trainer.py:415-436); with
        # TRAIN.probe_holdout set this reports REAL mAP on held-out captions
        trainer.validate()


if __name__ == "__main__":
    main()
