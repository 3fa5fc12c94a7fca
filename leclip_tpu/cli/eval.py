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
    import jax.numpy as jnp

    from ..data.datasets import build_dataset
    from ..inference.pipeline import load_ensemble_specs, run_full_inference
    from ..inference.tta import TTAEngine
    from ..ops.ensemble import normalized_cooccurrence

    dataset = build_dataset(cfg)
    specs = load_ensemble_specs(cfg, clip_params, clip_cfg, dataset.classnames, model_dir)

    # TEST.use_freq is the master switch; WHICH members get co-occurrence
    # modulation is per-member (ModelSpec.use_freq from the run_eval.sh
    # grouping: best/difft only — ref run_eval.sh:17-40)
    cooc = None
    if freq_stats is not None and cfg.TEST.use_freq:
        cooc = normalized_cooccurrence(
            np.asarray(freq_stats["adj"], np.float32),
            np.asarray(freq_stats["nums"], np.float32),
        )
    import jax

    from ..parallel.mesh import data_mesh

    # multi-chip slice → batch-shard the TTA engine over a 1-D data mesh
    # (skipped on the virtual CPU mesh used by tests — engine-level mesh
    # behavior is covered by tests/test_tta.py::test_engine_mesh_sharded_*)
    mesh = (
        data_mesh()
        if jax.device_count() > 1 and jax.default_backend() != "cpu"
        else None
    )
    from ..engine.config import resolve_test_precision

    prec = resolve_test_precision(cfg.TEST.PREC, clip_cfg)
    if prec != cfg.TEST.PREC:
        print(f"TEST.PREC {cfg.TEST.PREC!r} resolved to {prec!r} for "
              f"{'ViT' if clip_cfg.is_vit else 'ResNet'} backbone")
    engine = TTAEngine(
        clip_params, clip_cfg, specs, scales=cfg.TEST.multi_scale,
        caption_bank=jnp.asarray(caption_bank) if caption_bank is not None else None,
        cooccurrence=cooc, use_freq=False,
        topk=cfg.TEST.retrieval_topk,
        block_threshold=cfg.TEST.block_threshold,
        block_coef=cfg.TEST.block_fuse_coef,
        crop_size=clip_cfg.image_resolution,
        mesh=mesh,
        compute_dtype=jnp.float32 if prec == "fp32" else jnp.bfloat16,
        precision="int8" if prec == "int8" else "bf16",
    )
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
