"""Labeled synthetic IMAGE closed loop — the accuracy proof for the image
TTA + ensemble pipeline (round-5 headline experiment).

Round 4 proved the ensemble machinery adds accuracy on a CAPTION benchmark,
but the image path (crops → blocks → fuse → use_freq → retrieval → routing)
had only parity evidence (golden vs the executed gen_final_ans.py), and the
caption token-window fuse analogue COST accuracy. This script settles the
question on images with spatially-localized signal:

  A. Pretrain a tiny CLIP (RN-SYN) contrastively on rendered glyph scenes
     (leclip_tpu/data/synth_images.py) until zero-shot multi-label mAP is
     far above chance — a real, image-grounded CLIP stand-in.
  B. Train the six competition prompt recipes (train_2.sh set) against the
     trained towers on a matching synthetic caption workspace
     (scripts/train_rehearsal.py machinery).
  C. Score a fresh labeled image benchmark through the full TTA engine and
     ablate every pipeline stage:
       S0 global-only                  (crop 0 global logits)
       S1 +local GL merge              (r·g + (1−r)·l — the standard score)
       S2 +block aggregation α-β-γ     (test() path, ref Caption_distill_double.py:658-673)
       S3 +fuse/fuse6, retrieval OFF   (gen_final_ans path, sims zeroed)
       S4 +fuse/fuse6 with retrieval   (ref gen_final_ans.py:18-71,444-448)
       S5 +use_freq co-occurrence      (ref Caption_distill_double.py:614-636)
       S6 learned per-class routing    (ops/ensemble.learn_routing over S4)
     writing per-stage mAPs per member + routed ensembles to
     {workspace}/image_accuracy.json (committed as image_accuracy_r5.json).

Resumable: each phase skips when its artifact already exists.

Usage:
    python scripts/image_rehearsal.py --workspace /tmp/image_rehearsal
    python scripts/image_rehearsal.py --cpu --smoke   # tiny CPU end-to-end
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from train_rehearsal import RECIPES, _sentence, run_recipe, synth_workspace

CLIP_MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
CLIP_STD = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)


def normalize_batch(imgs_u8: np.ndarray) -> np.ndarray:
    return (imgs_u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


# --------------------------------- phase A ----------------------------------


def make_pair_pool(n: int, seed: int, size: int, classnames):
    """n (scene, caption, labels) pretraining pairs at size×size."""
    from leclip_tpu.data.synth_images import make_labeled_images
    from leclip_tpu.data.tokenizer import tokenize

    imgs, labels, caps = make_labeled_images(
        n, classnames, seed=seed, sizes=((size, size),), k_range=(1, 3),
        scale_range=(0.25, 0.85),
        caption_fn=lambda rng, names: _sentence(rng, names),
    )
    tokens = np.asarray(tokenize(caps), np.int32)
    return np.stack(imgs), tokens, labels


def zeroshot_map(params, clip_cfg, images_u8, labels, classnames,
                 batch: int = 256) -> float:
    """Zero-shot multi-label mAP: global image features vs 'a photo of a X.'
    prompt features."""
    import jax
    import jax.numpy as jnp

    from leclip_tpu.data.tokenizer import tokenize
    from leclip_tpu.engine.evaluator import mAP
    from leclip_tpu.models.clip import clip_encode_image, clip_encode_text

    toks = jnp.asarray(tokenize([f"a photo of a {c}." for c in classnames]),
                       jnp.int32)

    @jax.jit
    def text_fn(p, t):
        f = clip_encode_text(p, clip_cfg, t)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    @jax.jit
    def img_fn(p, x):
        f = clip_encode_image(p, clip_cfg, x)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    tf = np.asarray(text_fn(params, toks), np.float32)
    feats = []
    for i in range(0, len(images_u8), batch):
        x = normalize_batch(images_u8[i:i + batch])
        feats.append(np.asarray(img_fn(params, jnp.asarray(x)), np.float32))
    sims = np.concatenate(feats) @ tf.T
    return mAP(labels, sims)


def pretrain_clip(ws: str, args, classnames) -> dict:
    """Phase A → fp32 host params saved at {ws}/clip/clip_params.msgpack."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from leclip_tpu.engine.finetune import CLIPFineTuner
    from leclip_tpu.models.clip import PRESETS, init_clip_params

    clip_cfg = PRESETS[args.backbone]
    clip_dir = os.path.join(ws, "clip")
    params_path = os.path.join(clip_dir, "clip_params.msgpack")
    log_path = os.path.join(clip_dir, "pretrain_log.json")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        init = init_clip_params(jax.random.PRNGKey(0), clip_cfg, jnp.float32)
    if os.path.exists(params_path):
        with open(params_path, "rb") as f:
            params = serialization.from_bytes(init, f.read())
        with open(log_path) as f:
            log = json.load(f)
        print(f"[image] phase A: reusing pretrained CLIP "
              f"(zs mAP {log['zs_mAP']})", flush=True)
        return {"params": params, "cfg": clip_cfg, "log": log}

    size = clip_cfg.image_resolution
    t0 = time.perf_counter()
    print(f"[image] phase A: rendering {args.pairs} pretraining pairs…",
          flush=True)
    imgs, tokens, _ = make_pair_pool(args.pairs, 42, size, classnames)
    vimgs, vlabels = make_eval_images(args.zs_eval_n, 4242, size, classnames)
    render_s = time.perf_counter() - t0

    steps_per_epoch = len(imgs) // args.batch
    tuner = CLIPFineTuner(
        init, clip_cfg, lr=args.lr, weight_decay=0.1,
        warmup_steps=min(200, steps_per_epoch),
        total_steps=args.epochs * steps_per_epoch, remat=False,
    )

    def epoch_batches(rng):
        order = rng.permutation(len(imgs))
        for i in range(steps_per_epoch):
            idx = order[i * args.batch:(i + 1) * args.batch]
            yield {"image": normalize_batch(imgs[idx]),
                   "tokens": tokens[idx]}

    rng = np.random.default_rng(7)
    history = []
    best = -1.0
    stale = 0
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        tuner.fit(epoch_batches(rng), log_every=100)
        params = jax.device_get(tuner.state.params)
        zs = zeroshot_map(params, clip_cfg, vimgs, vlabels, classnames)
        history.append(round(zs, 2))
        print(f"[image] phase A epoch {epoch}: zero-shot mAP {zs:.2f}",
              flush=True)
        if zs > best + 0.2:
            best, stale = zs, 0
        else:
            stale += 1
        if zs >= args.zs_target or stale >= 4:
            break
    train_s = time.perf_counter() - t0

    params = jax.device_get(tuner.state.params)
    os.makedirs(clip_dir, exist_ok=True)
    with open(params_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    log = {"zs_mAP": history[-1], "zs_history": history,
           "pairs": args.pairs, "epochs_run": len(history),
           "render_s": round(render_s, 1), "train_s": round(train_s, 1),
           "backbone": args.backbone}
    with open(log_path, "w") as f:
        json.dump(log, f, indent=2)
    print(f"[image] phase A done: zs mAP {history[-1]} "
          f"({train_s:.0f}s train)", flush=True)
    return {"params": params, "cfg": clip_cfg, "log": log}


def make_eval_images(n: int, seed: int, size: int, classnames):
    from leclip_tpu.data.synth_images import make_labeled_images

    imgs, labels, _ = make_labeled_images(
        n, classnames, seed=seed, sizes=((size, size),), k_range=(1, 3),
        scale_range=(0.25, 0.85))
    return np.stack(imgs), labels


# --------------------------------- phase B ----------------------------------


def train_members(ws: str, args, clip_params, repo_root: str) -> dict:
    results_path = os.path.join(ws, "rehearsal_results.jsonl")
    done = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                r = json.loads(line)
                done[r["recipe"]] = r
    synth_workspace(ws, args.corpus_scale)
    wanted = [r for r in RECIPES
              if not args.recipes or r[0] in args.recipes.split(",")]
    extra = list(args.opts or [])
    if args.smoke:
        # cap the 80-epoch recipes for the CPU end-to-end check; picked
        # epochs clamp to the capped last epoch so every member still lands
        # in best_model/
        extra += ["OPTIM.MAX_EPOCH", "2", "TRAIN.early_stop_epoch", "-1"]
        wanted = [(n, y, s, min(p, 1)) for n, y, s, p in wanted]
    for name, yaml_name, seed, pick in wanted:
        if name in done:
            print(f"[image] phase B {name}: done (probe mAP "
                  f"{done[name]['probe_mAP']}) — skipping", flush=True)
            continue
        print(f"[image] phase B === {name} ({yaml_name}.yaml) ===", flush=True)
        rec = run_recipe(name, yaml_name, seed, pick, ws, args.precision,
                         repo_root, extra_opts=extra,
                         backbone=args.backbone, clip_params=clip_params)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        done[name] = rec
        print(f"[image] phase B {name}: probe mAP {rec['probe_mAP']} "
              f"({rec['wall_s']}s)", flush=True)
    return done


# --------------------------------- phase C ----------------------------------


STAGES = ("S0_global", "S1_gl_merge", "S2_block_agg", "S3_fuse_noretr",
          "S4_fuse_retr", "S5_fuse_retr_freq")


def stage_scores(outs: dict, sims_blocks: np.ndarray, cooc, name: str,
                 base: str, r: float) -> dict:
    """All ablation-stage [B, C] scores for one member's raw dump."""
    from leclip_tpu.ops.ensemble import adjust_predictions, model_result

    use6 = name == base
    aux = 1.5 if name == base else 1.0
    freq_outs = dict(outs)
    if cooc is not None:
        for k in ("output_pos", "output_pos_blocks"):
            freq_outs[k] = adjust_predictions(outs[k], cooc)
    zeros = np.zeros_like(sims_blocks)
    return {
        "S0_global": outs["output"],
        "S1_gl_merge": r * outs["output"] + (1 - r) * outs["output_pos"],
        "S2_block_agg": r * outs["output_final"]
        + (1 - r) * outs["output_pos_final"],
        "S3_fuse_noretr": model_result(outs, zeros, use_fuse6=use6,
                                       aux_coef=aux),
        "S4_fuse_retr": model_result(outs, sims_blocks, use_fuse6=use6,
                                     aux_coef=aux),
        "S5_fuse_retr_freq": model_result(freq_outs, sims_blocks,
                                          use_fuse6=use6, aux_coef=aux),
    }


def evaluate_images(ws: str, args, clip_params, clip_cfg, repo_root: str):
    import jax
    import jax.numpy as jnp

    from leclip_tpu.data.labeling import CaptionLabeler
    from leclip_tpu.data.freq_stats import build_freq_stats
    from leclip_tpu.data.synth_images import make_labeled_images
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.evaluator import mAP
    from leclip_tpu.inference.pipeline import (build_caption_bank,
                                               load_ensemble_specs)
    from leclip_tpu.inference.tta import TTAEngine
    from leclip_tpu.ops.ensemble import (learn_routing, normalized_cooccurrence,
                                         route_ensemble)

    classnames = list(COCO_OBJECT_CATEGORIES)
    cfg = setup_config()
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, clip_params)
    specs = load_ensemble_specs(cfg, params_bf16, clip_cfg, classnames,
                                os.path.join(ws, "best_model"))
    print(f"[image] phase C members: {sorted(specs)}", flush=True)

    # retrieval bank + co-occurrence stats from the TRAINING corpus
    croot = os.path.join(ws, "text_result", "generated_captions")
    tok_path = os.path.join(
        croot, "ChatGLM_multi_labels_filtered_all_caption_tokenized.pkl")
    bank = None
    cooc = None
    if not args.no_bank and os.path.exists(tok_path):
        with open(tok_path, "rb") as f:
            bank_tokens = np.asarray(pickle.load(f))
        if args.bank_size:
            bank_tokens = bank_tokens[:args.bank_size]
        t0 = time.time()
        bank = build_caption_bank(params_bf16, clip_cfg, bank_tokens,
                                  precision="bf16")
        print(f"[image] caption bank: {bank.shape[0]} rows in "
              f"{time.time() - t0:.1f}s", flush=True)
    with open(os.path.join(croot, "ChatGLM_multi_labels_filtered.json")) as f:
        corpus = json.load(f)
    labeler = CaptionLabeler()
    train_labels = np.stack([
        np.asarray(labeler(rec["caption"]), np.float32)
        for rec in corpus[:20000]])
    stats = build_freq_stats(train_labels)
    nums = np.maximum(stats["nums"], 1.0)
    cooc = normalized_cooccurrence(stats["adj"] + 1e-6, nums)

    sizes = tuple(tuple(map(int, s.split("x"))) for s in args.test_sizes.split(","))
    n_test = (args.n_test // (len(sizes) * args.tta_batch)) \
        * len(sizes) * args.tta_batch
    print(f"[image] rendering {n_test} test images {sizes}…", flush=True)
    imgs, labels, _ = make_labeled_images(
        n_test, classnames, seed=777, sizes=sizes, k_range=(1, 4),
        scale_range=(0.2, 0.6))

    engine = TTAEngine(
        params_bf16, clip_cfg, specs, scales=cfg.TEST.multi_scale,
        caption_bank=jnp.asarray(bank) if bank is not None else None,
        topk=cfg.TEST.retrieval_topk,
        crop_size=clip_cfg.image_resolution,
        compute_dtype=jnp.bfloat16, precision="bf16",
    )

    base = "best" if "best" in specs else sorted(specs)[0]
    r = cfg.TRAINER.GL_merge_rate
    acc = {name: {s: [] for s in STAGES} for name in specs}
    order = []  # image indices in scored order (grouped by size bucket)
    by_size = {}
    for i, im in enumerate(imgs):
        by_size.setdefault(im.shape[:2], []).append(i)

    def consume(handle, idxs):
        results = engine.finish_batch_dump(handle)
        sims_blocks = results.pop("_sims")["sims_blocks_all"]
        for name, outs in results.items():
            st = stage_scores(outs, sims_blocks, cooc, name, base, r)
            for s in STAGES:
                acc[name][s].append(st[s])
        order.extend(idxs)

    t0 = time.time()
    pending = deque()
    n_batches = sum(len(v) // args.tta_batch for v in by_size.values())
    bi = 0
    for hw, idxs in by_size.items():
        for j in range(0, len(idxs), args.tta_batch):
            chunk = idxs[j:j + args.tta_batch]
            pending.append(
                (engine.dispatch_batch_dump([imgs[i] for i in chunk]), chunk))
            if len(pending) >= 2:
                consume(*pending.popleft())
            bi += 1
            if bi % 10 == 0:
                print(f"[image] TTA batch {bi}/{n_batches}", flush=True)
    while pending:
        consume(*pending.popleft())
    score_s = time.time() - t0

    # scored row i is original image order[i]; argsort restores input order
    inv = np.argsort(np.asarray(order))
    per_stage = {
        name: {s: np.concatenate(v)[inv] for s, v in stages.items()}
        for name, stages in acc.items()
    }

    n = len(labels)
    val_idx = np.arange(0, n, 2)
    test_idx = np.arange(1, n, 2)
    report = {"members": {}, "n_test_images": n}
    for name in sorted(per_stage):
        row = {}
        for s in STAGES:
            row[s] = round(mAP(labels[test_idx],
                               per_stage[name][s][test_idx]), 3)
        report["members"][name] = row
        print(f"[image] {name}: " + " ".join(
            f"{s.split('_')[0]}={row[s]}" for s in STAGES), flush=True)

    # routed ensembles at EVERY stage: base member chosen by validation mAP
    # (the programmatic analogue of the reference hand-picking its strongest
    # run as the base, gen_final_ans.py:152-158), fit on val, report on test
    routed = {}
    for s in STAGES:
        val_scores = {m: per_stage[m][s][val_idx] for m in per_stage}
        test_scores = {m: per_stage[m][s][test_idx] for m in per_stage}
        base_s = max(val_scores,
                     key=lambda m: mAP(labels[val_idx], val_scores[m]))
        routing = learn_routing(val_scores, labels[val_idx], base=base_s,
                                margin=args.margin, min_pos=args.min_pos,
                                confirm_splits=2)
        fused = route_ensemble(test_scores, routing, base=base_s)
        routed[s] = {
            "routed_mAP": round(mAP(labels[test_idx], fused), 3),
            "base": base_s,
            "routed_classes": {m: len(c) for m, c in routing.items()},
            "routing": {m: list(map(int, c)) for m, c in routing.items()},
        }
        print(f"[image] routed@{s}: {routed[s]['routed_mAP']} "
              f"(base {base_s})", flush=True)

    np.savez_compressed(
        os.path.join(ws, "image_stage_scores.npz"), labels=labels,
        val_idx=val_idx, test_idx=test_idx,
        **{f"{m}_{s}": per_stage[m][s] for m in per_stage for s in STAGES})

    best_by_stage = {
        s: max((report["members"][m][s], m) for m in report["members"])
        for s in STAGES}
    per_member_deltas = {
        m: {"block_agg": round(report["members"][m]["S2_block_agg"]
                               - report["members"][m]["S1_gl_merge"], 3),
            "retrieval": round(report["members"][m]["S4_fuse_retr"]
                               - report["members"][m]["S3_fuse_noretr"], 3),
            "use_freq": round(report["members"][m]["S5_fuse_retr_freq"]
                              - report["members"][m]["S4_fuse_retr"], 3)}
        for m in report["members"]}
    summary = {
        "metric": "image-benchmark per-stage mAP (labeled synthetic glyph scenes)",
        "best_member_per_stage": {s: {"member": m, "mAP": v}
                                  for s, (v, m) in best_by_stage.items()},
        "routed": {s: routed[s]["routed_mAP"] for s in routed},
        "block_agg_helps": bool(
            best_by_stage["S2_block_agg"][0] > best_by_stage["S1_gl_merge"][0]),
        "fuse_helps_on_images": bool(
            max(best_by_stage["S3_fuse_noretr"][0],
                best_by_stage["S4_fuse_retr"][0])
            > best_by_stage["S1_gl_merge"][0]),
        "per_member_stage_deltas": per_member_deltas,
        # NOTE: benchmark labels are drawn INDEPENDENTLY per class, so the
        # training-corpus co-occurrence matrix carries no structure here —
        # use_freq cannot help on this benchmark BY CONSTRUCTION; its delta
        # measures the cost of modulating with an uninformative P-hat, not
        # the stage's value on correlated real data
        "score_seconds": round(score_s, 1),
        "bank_rows": int(bank.shape[0]) if bank is not None else 0,
        "n_test_images": n,
        "tta_scales": list(cfg.TEST.multi_scale),
        "margin": args.margin, "min_pos": args.min_pos,
    }
    # embed the upstream phases' context so the artifact is self-contained
    try:
        with open(os.path.join(ws, "clip", "pretrain_log.json")) as f:
            report["pretrain"] = json.load(f)
        with open(os.path.join(ws, "rehearsal_results.jsonl")) as f:
            report["members_caption_probe_mAP"] = {
                r["recipe"]: r["probe_mAP"]
                for r in (json.loads(l) for l in f)}
    except FileNotFoundError:
        pass
    report.update(summary, routed_detail=routed)
    out = os.path.join(ws, "image_accuracy.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(summary))
    return report


# ----------------------------------- main ------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/image_rehearsal")
    ap.add_argument("--backbone", default="RN-SYN")
    ap.add_argument("--pairs", type=int, default=40_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--zs-target", type=float, default=80.0)
    ap.add_argument("--zs-eval-n", type=int, default=1000)
    ap.add_argument("--corpus-scale", type=float, default=0.05)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--recipes", default="")
    ap.add_argument("--n-test", type=int, default=1536)
    ap.add_argument("--test-sizes", default="192x192,160x224")
    ap.add_argument("--tta-batch", type=int, default=16)
    ap.add_argument("--bank-size", type=int, default=0)
    ap.add_argument("--no-bank", action="store_true")
    ap.add_argument("--margin", type=float, default=0.02)
    ap.add_argument("--min-pos", type=int, default=20)
    ap.add_argument("--phases", default="ABC",
                    help="subset of phases to run (e.g. 'A', 'BC')")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny counts for an end-to-end CPU check")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    if args.smoke:
        args.pairs = min(args.pairs, 2000)
        args.batch = min(args.batch, 64)
        args.epochs = min(args.epochs, 3)
        args.zs_eval_n = 200
        args.corpus_scale = min(args.corpus_scale, 0.002)
        args.n_test = min(args.n_test, 64)
        args.tta_batch = min(args.tta_batch, 8)
        args.bank_size = args.bank_size or 512
        args.min_pos = 2

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ws = os.path.abspath(args.workspace)
    os.makedirs(ws, exist_ok=True)

    pre = pretrain_clip(ws, args, list(COCO_OBJECT_CATEGORIES))
    if "B" in args.phases:
        train_members(ws, args, pre["params"], repo_root)
    if "C" in args.phases:
        evaluate_images(ws, args, pre["params"], pre["cfg"], repo_root)


if __name__ == "__main__":
    main()
