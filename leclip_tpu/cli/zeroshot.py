"""Zero-shot multi-label scoring CLI — BASELINE config 1 ("CLIP RN50
zero-shot multi-label scoring") and the dense zero-shot baseline the
reference's zsclip.sh points at (ZeroshotCLIP_dense, not shipped there).

Scores images against "a photo of a {}" prompts (optionally averaged over
the 80 ImageNet templates), global + dense logits merged with GL_merge_rate,
reports mAP when a label file is given.

Usage:
    python -m leclip_tpu.cli.zeroshot --weights RN50.pt \
        --images-dir ./imgs [--labels labels.json] [--templates]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def zero_shot_text_features(clip_params, clip_cfg, classnames, use_templates=False):
    import jax
    import jax.numpy as jnp

    from ..data.tokenizer import tokenize
    from ..data.vocab import IMAGENET_TEMPLATES, PROMPT_TEMPLATE
    from ..models.clip import clip_encode_text

    templates = IMAGENET_TEMPLATES if use_templates else [PROMPT_TEMPLATE]

    @jax.jit
    def encode(tokens):
        f = clip_encode_text(clip_params, clip_cfg, tokens)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    feats = []
    for t in templates:
        toks = jnp.asarray(tokenize([t.format(c) for c in classnames]))
        feats.append(np.asarray(encode(toks)))
    mean = np.mean(feats, axis=0)
    mean /= np.linalg.norm(mean, axis=-1, keepdims=True)
    return mean


def zero_shot_scores(clip_params, clip_cfg, images, text_feats, gl_merge=0.5,
                     spatial_scale=50.0):
    """Global + dense zero-shot logits for a batch of CLIP-normalised images."""
    import jax
    import jax.numpy as jnp

    from ..models.dense_clip import DenseFlags, _aggregate_local, encode_image_features

    flags = DenseFlags(spatial_scale_image=spatial_scale)

    @jax.jit
    def score(imgs):
        feats = encode_image_features(clip_params, clip_cfg, imgs, flags)
        tf = {"pos": jnp.asarray(text_feats), "neg": jnp.asarray(text_feats)}
        logits_global = 4.0 * feats.global_feat @ tf["pos"].T
        logits_local, _ = _aggregate_local(
            feats.spatial_feats, tf, 4.0, spatial_scale, use_evidence=False
        )
        return logits_global, logits_local

    g, l = score(images)
    return np.asarray(g) * gl_merge + np.asarray(l) * (1 - gl_merge)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="")
    ap.add_argument("--backbone", default="RN50")
    ap.add_argument("--images-dir", required=True)
    ap.add_argument("--labels", default="", help="json {filename: [class indices]}")
    ap.add_argument("--templates", action="store_true", help="average 80 ImageNet templates")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..data.loader import ImageBatcher
    from ..data.vocab import COCO_OBJECT_CATEGORIES
    from ..engine.config import setup_config
    from ..engine.evaluator import mAP
    from ..ops.preprocess import preprocess_eval
    from .train import load_clip

    cfg = setup_config()
    clip_cfg, clip_params = load_clip(cfg, args)
    text_feats = zero_shot_text_features(
        clip_params, clip_cfg, COCO_OBJECT_CATEGORIES, args.templates
    )
    paths = sorted(
        os.path.join(args.images_dir, f)
        for f in os.listdir(args.images_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    import jax

    pre = jax.jit(lambda im: preprocess_eval(im, clip_cfg.image_resolution))
    all_scores, all_names = [], []
    for images, names in ImageBatcher(paths, args.batch_size):
        batch = jnp.stack([pre(jnp.asarray(im)) for im in images])
        all_scores.append(zero_shot_scores(clip_params, clip_cfg, batch, text_feats))
        all_names.extend(names)
    scores = np.concatenate(all_scores)

    if args.labels:
        with open(args.labels) as f:
            lab = json.load(f)
        targets = np.zeros_like(scores, dtype=np.int64)
        for i, p in enumerate(all_names):
            for c in lab.get(os.path.basename(p), []):
                targets[i, c] = 1
        print(f"zero-shot mAP: {mAP(targets, scores):.2f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({os.path.basename(p): s.tolist() for p, s in zip(all_names, scores)}, f)
    print(f"scored {len(all_names)} images")


if __name__ == "__main__":
    main()
