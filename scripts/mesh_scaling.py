"""Virtual-mesh scaling curve (round-5, VERDICT r4 #5).

No multi-chip hardware exists in this environment, so this measures the
SHAPE of the multi-chip story on the 8-virtual-device CPU backend: with a
FIXED global batch, the production training step and the fused TTA dispatch
are compiled and executed over 1/2/4/8-device `data` meshes, recording
per-step wall time and the per-device batch shard.

What this evidences (and what it does not): the sharded programs compile
and execute at every mesh size, shardings divide the global batch exactly,
and the gradient all-reduce / replicated-param structure holds at each
width. CPU timing on a 1-core box is NOT TPU timing — all devices timeshare
one core, so ideal scaling shows roughly FLAT wall time here (same total
work, more collective overhead), while a pathological sharding (e.g. a
gather forcing full replication) shows superlinear blowup. The real-pod
performance playbook lives in docs/GUIDE.md §6.

Usage:  python scripts/mesh_scaling.py --out MESH_SCALING_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def measure_train(n_dev: int, steps: int, global_batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from leclip_tpu.data.datasets import CaptionDataset
    from leclip_tpu.data.tokenizer import tokenize
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.trainer import CaptionDistillTrainer
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.parallel.mesh import data_mesh, shard_batch

    mesh = data_mesh(jax.devices()[:n_dev])
    clip_cfg = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    rng = np.random.default_rng(0)
    names = list(COCO_OBJECT_CATEGORIES)
    caps = [f"a photo of a {names[rng.integers(80)]} and a "
            f"{names[rng.integers(80)]}." for _ in range(global_batch * 2)]
    tokens = np.asarray(tokenize(caps), np.int32)
    labels = (rng.random((len(caps), 80)) < 0.05).astype(np.float32)
    ds = CaptionDataset(tokens, labels, [], names)
    cfg = setup_config(opts=[
        "DATALOADER.BATCH_SIZE_TRAIN", str(global_batch),
        "TRAIN.PRINT_FREQ", "100000", "TRAIN.CHECKPOINT_FREQ", "-1",
        "TRAIN.probe_holdout", "-1",
    ])
    tr = CaptionDistillTrainer(cfg, clip_params, clip_cfg, dataset=ds,
                               mesh=mesh)
    batch = {"img": tokens[:global_batch], "label": labels[:global_batch]}
    sb = shard_batch(batch, mesh)
    shard_rows = sb["img"].sharding.shard_shape(sb["img"].shape)[0]
    for _ in range(2):  # compile + warm
        tr.state, m = tr.train_step(tr.state, sb["img"], sb["label"])
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        tr.state, m = tr.train_step(tr.state, sb["img"], sb["label"])
        float(m["loss"])  # host-sync every step (CPU collectives rule)
    dt = (time.perf_counter() - t0) / steps
    return {"devices": n_dev, "global_batch": global_batch,
            "per_device_rows": int(shard_rows),
            "step_ms": round(dt * 1e3, 1)}


def measure_tta(n_dev: int, batches: int, global_batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from leclip_tpu.inference.tta import TTAEngine, build_model_spec
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(jax.devices()[:n_dev])
    clip_cfg = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    trainable, constants = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, list(COCO_OBJECT_CATEGORIES),
        n_ctx=4)
    spec = build_model_spec(clip_params, clip_cfg, trainable, constants,
                            DenseFlags())
    bank = np.random.default_rng(0).normal(
        size=(4096, clip_cfg.embed_dim)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    engine = TTAEngine(clip_params, clip_cfg, {"best": spec}, scales=(2,),
                       caption_bank=jnp.asarray(bank), crop_size=64,
                       mesh=mesh, shard_bank=n_dev > 1)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (96, 128, 3), np.uint8)
            for _ in range(global_batch)]
    engine.run_batch_fused(imgs)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(batches):
        out = engine.run_batch_fused(imgs)
    dt = (time.perf_counter() - t0) / batches
    return {"devices": n_dev, "global_batch": global_batch,
            "bank_rows_per_device": 4096 // n_dev,
            "dispatch_ms": round(dt * 1e3, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tta-batches", type=int, default=4)
    ap.add_argument("--train-batch", type=int, default=256)
    ap.add_argument("--tta-batch", type=int, default=8)
    ap.add_argument("--out", default="MESH_SCALING_r5.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    train_rows, tta_rows = [], []
    for n in (1, 2, 4, 8):
        r = measure_train(n, args.steps, args.train_batch)
        print(f"[mesh] train {n} dev: {r}", flush=True)
        train_rows.append(r)
        t = measure_tta(n, args.tta_batches, args.tta_batch)
        print(f"[mesh] tta   {n} dev: {t}", flush=True)
        tta_rows.append(t)
    out = {
        "metric": "virtual-mesh scaling shapes (8 virtual CPU devices on a "
                  "1-core box — shape evidence, NOT TPU timing)",
        "train_step": train_rows,
        "tta_fused_dispatch": tta_rows,
        "note": "fixed global batch; per-device rows halve as devices "
                "double; sharded-bank rows halve likewise (ring-kNN). CPU "
                "wall time is expected ~flat (one physical core).",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"train_step_ms": [r["step_ms"] for r in train_rows],
                      "tta_dispatch_ms": [r["dispatch_ms"] for r in tta_rows]}))


if __name__ == "__main__":
    main()
