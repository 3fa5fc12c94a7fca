"""Measured end-to-end TRAINING rehearsal: the full train_2.sh six-recipe
suite, run for real on one chip with the actual trainer and the whole host
pipeline ON the clock — reference-scale dataset synthesis, caption labeling
and BPE tokenization (first build + the reference's pickle-cache artifacts),
per-epoch shuffled batching, host→device staging, XLA compiles, EMA twins,
checkpointing, and the held-out probe validation each recipe ships with.

This replaces the round-2 "projects to ~5 h on one chip" extrapolation
(chained step timings × epoch counts) with a measurement — the training
analogue of scripts/rehearsal.py for inference. The reference's number this
is measured against: 40–50 h for the six models on an A40
(ref /root/reference/README.md:16; runs + picked epochs train_2.sh:30-52).

The corpus is synthetic (real ChatGLM captions are unobtainable here — zero
egress) but matches the reference artifacts item-for-item in format and
count: 220k-entry ChatGLM_multi_labels_filtered.json, 50k challenge_captions_5w,
the shipped 2k_v2 (1,556) / 2k_v3 (2,935) corpora, five single-label JSONs
(80 classes × 10 numbered lines), the 122,218-line category_sets.txt, the
few-shot components JSON, and 20,543 challenge JSONL lines. Captions embed
1–4 class names so synonym labeling produces realistic multi-hot densities.

CLIP RN50 weights are random-initialised (same compute as trained weights).
Frozen towers run bf16 by default — the documented TPU training posture
(STATUS.md round-2 training measurements); pass --precision fp32 for the
reference's own fp32 posture.

Usage:
    python scripts/train_rehearsal.py --workspace /tmp/train_rehearsal
    python scripts/train_rehearsal.py --workspace W --recipes best,difft
    python scripts/train_rehearsal.py --workspace W --scale 0.01  # smoke

Results append to {workspace}/rehearsal_results.jsonl (one record per
recipe; completed recipes are skipped on re-run, so the rehearsal is
resumable after interruption) and the final summary prints as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


# The six shipped runs: (model name, trainer yaml, seed, picked epoch) —
# exactly scripts/train_all.sh, i.e. the reference's train_2.sh:30-52.
RECIPES = [
    ("best", "best", 0, 4),
    ("ema", "ema", 1, 79),
    ("zema", "zema", 1, 79),
    ("diffh", "diffh", 1, 79),
    ("diff", "diff", 1, 9),
    ("difft", "difft", 1, 9),
]

# Reference artifact counts (measured on /root/reference/project/output/
# text_result/generated_captions/): see module docstring.
N_FILTERED = 220_000
N_CHALLENGE_5W = 50_000
N_2K_V2 = 1_556
N_2K_V3 = 2_935
N_CATEGORY_SETS = 122_218
N_CHALLENGE_JSONL = 20_543
SINGLE_LABEL_LINES = 10  # per class per file, 5 files


_FILLERS = [
    "on a sunny afternoon", "in the middle of a busy street", "near the window",
    "under warm evening light", "at the edge of the park", "inside a small room",
    "next to the old wooden fence", "during a quiet morning", "by the river bank",
    "in front of a brick wall", "on the kitchen counter", "beside the road",
]
_OPENERS = [
    "A photo of", "An image showing", "There is", "You can see",
    "The picture captures", "A scene with", "A close-up of",
]


def _sentence(rng, names) -> str:
    opener = _OPENERS[rng.integers(len(_OPENERS))]
    filler = _FILLERS[rng.integers(len(_FILLERS))]
    body = " and a ".join(names)
    return f"{opener} a {body} {filler}."


def synth_workspace(ws: str, scale: float, seed: int = 0) -> str:
    """Write the reference-scale caption workspace (idempotent per scale)."""
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES as CLS

    croot = os.path.join(ws, "text_result", "generated_captions")
    droot = os.path.join(ws, "data", "official_b")
    marker = os.path.join(croot, ".synth_marker.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("scale") == scale:
                return croot
        # scale changed: stale corpus AND stale pickle caches — rebuild
        shutil.rmtree(croot)
    os.makedirs(croot, exist_ok=True)
    os.makedirs(os.path.join(croot, "challenge"), exist_ok=True)
    os.makedirs(droot, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = lambda count: max(2, int(count * scale))

    t0 = time.perf_counter()

    def multi_label_corpus(path, count):
        out = []
        for i in range(count):
            k = int(rng.integers(1, 5))
            names = [CLS[j] for j in rng.choice(len(CLS), k, replace=False)]
            out.append({"id": i, "caption": _sentence(rng, names)})
        with open(path, "w") as f:
            json.dump(out, f)

    multi_label_corpus(os.path.join(croot, "ChatGLM_multi_labels_filtered.json"),
                       n(N_FILTERED))
    multi_label_corpus(os.path.join(croot, "challenge_captions_5w.json"),
                       n(N_CHALLENGE_5W))
    multi_label_corpus(os.path.join(croot, "ChatGLM_multi_labels_2k_v2.json"),
                       n(N_2K_V2))
    multi_label_corpus(os.path.join(croot, "ChatGLM_multi_labels_2k_v3.json"),
                       n(N_2K_V3))

    # five single-label files: {class_idx: [numbered lines]} (ref
    # gen_caption_single.py output; loader corpora.load_single_label_corpus)
    for t in range(1, 6):
        info = {}
        for ci, cname in enumerate(CLS):
            info[str(ci)] = [
                f"{k + 1}. A {cname} {_FILLERS[rng.integers(len(_FILLERS))]}."
                for k in range(SINGLE_LABEL_LINES)
            ]
        with open(os.path.join(croot, f"ChatGLM_single_label_{t}.json"), "w") as f:
            json.dump(info, f)

    # category_sets.txt: one comma-joined class combination per line
    # (ref format: "sink,toothbrush,vase,clock,bottle")
    with open(os.path.join(croot, "category_sets.txt"), "w") as f:
        for _ in range(n(N_CATEGORY_SETS)):
            k = int(rng.integers(2, 11))
            names = [CLS[j] for j in rng.choice(len(CLS), k, replace=False)]
            f.write(",".join(names) + "\n")

    # few-shot components (ref components_of_few_shot_classes.json: 20
    # classes × ~5 component nouns)
    parts = ["handle", "button", "surface", "cover", "frame", "cord", "edge",
             "lid", "stand", "strap"]
    few = {}
    for j in rng.choice(len(CLS), 20, replace=False):
        few[CLS[int(j)]] = [parts[int(p)] for p in rng.choice(len(parts), 5,
                                                              replace=False)]
    with open(os.path.join(croot, "components_of_few_shot_classes.json"), "w") as f:
        json.dump(few, f)

    # challenge JSONL: lines {labels: [classnames], captions: [header, '',
    # 4 numbered sentences]} (ref gen_caption_challenge.py output)
    with open(os.path.join(croot, "challenge",
                           "captions_score_challenge.jsonl"), "w") as f:
        for _ in range(n(N_CHALLENGE_JSONL)):
            k = int(rng.integers(1, 4))
            names = [CLS[j] for j in rng.choice(len(CLS), k, replace=False)]
            caps = ["Sure, here are 4 simple sentences describing the scene:", ""]
            caps += [f"{k2 + 1}. {_sentence(rng, names)}" for k2 in range(4)]
            f.write(json.dumps({"labels": names, "captions": caps}) + "\n")

    with open(os.path.join(droot, "classes.txt"), "w") as f:
        f.write("\n".join(CLS))
    # no test images: training-only workspace; the labeled accuracy signal is
    # the probe holdout every recipe ships with (TRAIN.probe_holdout 100)

    with open(marker, "w") as f:
        json.dump({"scale": scale, "seed": seed,
                   "synth_seconds": round(time.perf_counter() - t0, 1)}, f)
    print(f"[rehearsal] workspace synthesised in "
          f"{time.perf_counter() - t0:.1f}s at scale {scale}")
    return croot


def run_recipe(name: str, yaml_name: str, seed: int, pick: int, ws: str,
               precision: str, repo_root: str, extra_opts=(),
               backbone: str = "RN50", clip_params=None) -> dict:
    """``clip_params`` (host fp32 pytree) overrides the default random init —
    the image closed loop (scripts/image_rehearsal.py) passes its
    contrastively-pretrained towers so prompts train against REAL
    image-aligned text features."""
    import jax
    import jax.numpy as jnp

    from leclip_tpu.data.datasets import build_dataset
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.trainer import build_trainer
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.utils.logging import set_random_seed

    out_dir = os.path.join(ws, "train_output", name)
    cfg = setup_config(
        trainer_yaml=os.path.join(repo_root, "configs", "trainers",
                                  f"{yaml_name}.yaml"),
        opts=[
            "DATASET.ROOT", os.path.join(ws, "data"),
            "DATASET.caption_feat_root", os.path.join(ws, "text_result"),
            "DATASET.dataset_select", "B",
            "TRAINER.PREC", precision,
        ] + list(extra_opts),
        OUTPUT_DIR=out_dir,
        SEED=seed,
        # resume from the newest checkpoint if a previous session was cut
        # short (the axon tunnel can wedge one in-flight RPC forever — see
        # STATUS.md environment lessons; scripts/run_train_rehearsal_supervised.sh
        # restarts the process and this makes the restart continue, not redo)
        RESUME=out_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    set_random_seed(seed)

    rec = {"recipe": name, "yaml": yaml_name, "seed": seed,
           "precision": precision, "backbone": backbone}
    t0 = time.perf_counter()
    # dataset build ON the clock: corpus reads, synonym labeling, BPE
    # tokenization, template/category-set synthesis, pickle-cache writes
    # (caches shared across recipes exactly like the reference's artifacts)
    dataset = build_dataset(cfg)
    t1 = time.perf_counter()
    rec["samples"] = int(len(dataset))

    clip_cfg = PRESETS[backbone]
    if clip_params is None:
        # random init: real OpenAI weights are unobtainable here (zero
        # egress); identical compute and memory traffic to trained weights
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                                           dtype=jnp.float32)
    trainer = build_trainer(cfg, clip_params, clip_cfg, dataset=dataset)
    t2 = time.perf_counter()

    from leclip_tpu.engine.checkpoint import latest_checkpoint

    prior = latest_checkpoint(out_dir, trainer.model_name)
    if prior:  # wall_s then covers only this final session — flag it
        rec["resumed_from_ckpt"] = os.path.basename(prior)
    trainer.train(resume=True)
    t3 = time.perf_counter()

    probe = trainer.validate()
    t4 = time.perf_counter()

    # collect the picked epoch like train_all.sh / train_2.sh:30-52
    src = os.path.join(out_dir, "prompt_learner", f"model.ckpt-{pick}")
    picked = os.path.exists(src)
    if picked:
        dst_dir = os.path.join(ws, "best_model", name)
        os.makedirs(dst_dir, exist_ok=True)
        shutil.copy(src, os.path.join(dst_dir, "model.ckpt"))

    steps = trainer.batcher.steps_per_epoch()
    epochs = cfg.OPTIM.MAX_EPOCH
    if 0 <= cfg.TRAIN.early_stop_epoch < epochs:
        epochs = cfg.TRAIN.early_stop_epoch
    bs = cfg.DATALOADER.BATCH_SIZE_TRAIN
    rec.update(
        steps_per_epoch=steps,
        epochs=epochs,
        batch=bs,
        data_build_s=round(t1 - t0, 1),
        setup_s=round(t2 - t1, 1),
        train_s=round(t3 - t2, 1),
        validate_s=round(t4 - t3, 1),
        wall_s=round(t4 - t0, 1),
        captions_per_s=round(steps * epochs * bs / (t3 - t2), 1),
        probe_mAP=round(float(probe.get("mAP", float("nan"))), 4),
        picked_epoch=pick if picked else None,
    )
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/train_rehearsal")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="corpus scale factor (1.0 = reference counts)")
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"],
                    help="frozen-tower precision (bf16 = TPU posture)")
    ap.add_argument("--backbone", default="RN50",
                    help="CLIP preset (RN50 = the reference's; RN-TEST for "
                         "CPU smoke/e2e tests)")
    ap.add_argument("--recipes", default="",
                    help="comma-separated subset (default: all six)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="extra KEY VALUE config overrides (smoke runs)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ws = os.path.abspath(args.workspace)
    os.makedirs(ws, exist_ok=True)
    synth_workspace(ws, args.scale)

    results_path = os.path.join(ws, "rehearsal_results.jsonl")
    done = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                r = json.loads(line)
                done[r["recipe"]] = r

    wanted = [r for r in RECIPES
              if not args.recipes or r[0] in args.recipes.split(",")]
    t_suite = time.perf_counter()
    for name, yaml_name, seed, pick in wanted:
        if name in done:
            print(f"[rehearsal] {name}: already measured "
                  f"({done[name]['wall_s']}s) — skipping")
            continue
        print(f"[rehearsal] === {name} ({yaml_name}.yaml, seed {seed}) ===",
              flush=True)
        rec = run_recipe(name, yaml_name, seed, pick, ws, args.precision,
                         repo_root, extra_opts=args.opts or [],
                         backbone=args.backbone)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        done[name] = rec
        print(f"[rehearsal] {name}: {rec['wall_s']}s wall "
              f"({rec['train_s']}s train, {rec['captions_per_s']} captions/s, "
              f"probe mAP {rec['probe_mAP']})", flush=True)

    measured = [done[n] for n, *_ in wanted if n in done]
    total = sum(r["wall_s"] for r in measured)
    summary = {
        "metric": "six-recipe training suite wall-clock (measured end-to-end)",
        "value": round(total, 1),
        "unit": "seconds",
        "recipes": {r["recipe"]: r["wall_s"] for r in measured},
        "train_seconds": round(sum(r["train_s"] for r in measured), 1),
        "precision": args.precision,
        "backbone": args.backbone,
        "scale": args.scale,
        "suite_session_s": round(time.perf_counter() - t_suite, 1),
        # ref README.md:16: 40-50 h on an A40 for the same six runs
        "vs_reference_midpoint_45h": round(45 * 3600 / total, 1) if total else None,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
