"""Real-geometry task-level int8 convergence gate (round-5, VERDICT r4 #2).

The in-suite task gate (tests/test_quant_gate.py test_int8_task_level_map_gate)
trains at width 128/6 layers; the real-width geometries were covered only by
distributional cosine floors. This script runs the SAME convergence-gate
protocol at the actual auto-int8 tower geometries — prompts trained to
convergence on a labeled 80-class caption corpus against a tower carrying
*fitted channel statistics at physical outlier density* (log-normal body
σ≈0.25 + 0.8% of channels at 50×, per LLM.int8 §3 / SmoothQuant §3,
function-preservingly injected) — and measures the held-out probe-mAP delta
between the fp and int8 towers. The production default (`TEST.PREC auto` →
int8, engine/config.py resolve_test_precision) rests on this number staying
inside the reference's ±0.2 run-to-run reproduction tolerance
(ref /root/reference/README.md:12-13).

Geometries: 512-wide 12-layer causal text (ViT-B + RN50 text towers) and
768-wide 12-layer causal text (ViT-L text). [The vision towers' task-level
evidence comes from the image benchmark path — scripts/image_rehearsal.py.]

Usage (chip):
    python scripts/quant_gate_realwidth.py --out quant_gate_realwidth.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


GEOMETRIES = {
    # name: (transformer_width, heads, layers)
    "text-512x12 (ViT-B/RN50)": (512, 8, 12),
    "text-768x12 (ViT-L)": (768, 12, 12),
}


def build_corpus(n: int, seed: int):
    from train_rehearsal import _sentence

    from leclip_tpu.data.labeling import CaptionLabeler
    from leclip_tpu.data.tokenizer import tokenize
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES as CLS

    rng = np.random.default_rng(seed)
    labeler = CaptionLabeler()
    captions, labels = [], []
    while len(captions) < n:
        k = int(rng.integers(1, 5))
        names = [CLS[j] for j in rng.choice(len(CLS), k, replace=False)]
        cap = _sentence(rng, names)
        lab = np.asarray(labeler(cap), np.float32)
        if not lab.any():
            continue
        captions.append(cap)
        labels.append(lab)
    return np.asarray(tokenize(captions), np.int32), np.stack(labels)


_CORPUS_CACHE = {}


def _corpus(n: int, seed: int):
    key = (n, seed)
    if key not in _CORPUS_CACHE:
        _CORPUS_CACHE[key] = build_corpus(n, seed)
    return _CORPUS_CACHE[key]


def run_geometry(name: str, width: int, heads: int, layers: int, args) -> dict:
    import jax
    import jax.numpy as jnp

    from leclip_tpu.data.datasets import CaptionDataset
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.evaluator import mAP
    from leclip_tpu.engine.trainer import CaptionDistillTrainer
    from leclip_tpu.models.clip import CLIPConfig, init_clip_params
    from leclip_tpu.models.dense_clip import (encode_captions,
                                              train_logits_from_features)
    from leclip_tpu.ops.quant import quantize_block_stack
    from leclip_tpu.ops.quant_stress import (apply_outlier_profile,
                                             fitted_channel_scales)
    from leclip_tpu.parallel.mesh import shard_batch

    clip_cfg = CLIPConfig(
        embed_dim=width, image_resolution=64, vision_layers=2,
        vision_width=64, vision_patch_size=16,  # vision tower unused here
        transformer_width=width, transformer_heads=heads,
        transformer_layers=layers,
    )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    profile = fitted_channel_scales(layers, width, seed=args.seed,
                                    outlier_frac=args.outlier_frac,
                                    outlier_mult=args.outlier_mult)
    clip_params["text"]["blocks"] = apply_outlier_profile(
        clip_params["text"]["blocks"], profile)

    tokens, labels = _corpus(args.captions, seed=0)
    probe_tokens, probe_labels = _corpus(args.probe, seed=123)
    ds = CaptionDataset(tokens, labels, [], list(COCO_OBJECT_CATEGORIES))
    cfg = setup_config(opts=[
        "OPTIM.MAX_EPOCH", str(args.epochs), "OPTIM.LR", str(args.lr),
        "OPTIM.WARMUP_EPOCH", "-1",
        "DATALOADER.BATCH_SIZE_TRAIN", str(args.batch),
        "TRAINER.N_CTX", "16",
        "TRAIN.PRINT_FREQ", "100000", "TRAIN.CHECKPOINT_FREQ", "-1",
    ])
    tr = CaptionDistillTrainer(cfg, clip_params, clip_cfg, dataset=ds)
    q8 = quantize_block_stack(tr.clip_params["text"]["blocks"])

    # clip params are a jit ARGUMENT — closed-over arrays become HLO
    # constants and a 768-wide tower's ~150 MB overflows the remote-compile
    # request (HTTP 413; STATUS.md environment lessons). tr.constants stays
    # a closure: it holds non-array leaves (class_token_position) and its
    # arrays are ~20 MB.
    @jax.jit
    def score_chunk(cp, pp, toks, q8_arg):
        feats = encode_captions(cp, clip_cfg, toks, tr.flags, q8=q8_arg)
        return train_logits_from_features(
            cp, clip_cfg, pp, tr.constants, feats, tr.flags)

    def probe_map(q8_arg):
        pp = jax.device_get(tr.state.params)
        outs, bs = [], 500
        for i in range(0, len(probe_tokens), bs):
            o, ol = score_chunk(tr.clip_params, pp,
                                jnp.asarray(probe_tokens[i:i + bs]), q8_arg)
            outs.append(0.5 * np.asarray(o, np.float32)
                        + 0.5 * np.asarray(ol, np.float32))
        return mAP(probe_labels, np.concatenate(outs))

    before = probe_map(None)
    t0 = time.perf_counter()
    on_tpu = jax.default_backend() == "tpu"
    for epoch in range(cfg.OPTIM.MAX_EPOCH):
        losses = []
        for batch in tr.batcher.epoch(epoch):
            sb = shard_batch(batch, tr.mesh)
            tr.state, m = tr.train_step(tr.state, sb["img"], sb["label"])
            losses.append(m["loss"])
            if not on_tpu:  # CPU in-process collectives need per-step sync
                assert np.isfinite(float(m["loss"]))
        last = float(losses[-1])  # one host sync per epoch on TPU
        assert np.isfinite(last), f"non-finite loss epoch {epoch}"
        print(f"[{name}] epoch {epoch}: loss {last:.4f}", flush=True)
    train_s = time.perf_counter() - t0

    m_fp = probe_map(None)
    m_i8 = probe_map(q8)
    delta = abs(m_fp - m_i8)
    rec = {
        "geometry": name, "width": width, "heads": heads, "layers": layers,
        "outlier_frac": args.outlier_frac, "outlier_mult": args.outlier_mult,
        "outlier_channels_per_layer": int(round(args.outlier_frac * width)),
        "captions": args.captions, "probe": args.probe,
        "probe_mAP_untrained": round(before, 4),
        "probe_mAP_fp": round(m_fp, 4),
        "probe_mAP_int8": round(m_i8, 4),
        "delta": round(delta, 4),
        "bound": 0.2,
        "pass": bool(delta < 0.2 and m_fp > before + 10),
        "train_s": round(train_s, 1),
    }
    print(f"[{name}] fp {m_fp:.4f} int8 {m_i8:.4f} delta {delta:.4f} "
          f"(untrained {before:.2f}) -> {'PASS' if rec['pass'] else 'FAIL'}",
          flush=True)
    return rec


def run_vision_gate(args) -> dict:
    """Real-geometry VISION int8 task gate: ViT-B's actual vision tower
    (768 wide × 12 layers — what `TEST.PREC auto` → int8 actually
    quantizes, inference/tta.py `_q8`) trained contrastively on the glyph
    image benchmark, fitted outlier profile injected function-preservingly
    into the VISUAL blocks, zero-shot image probe scored through the fp
    tower vs the W8A8 pallas kernels; |mAP delta| must stay inside ±0.2."""
    import argparse as _ap

    import jax
    import jax.numpy as jnp

    from image_rehearsal import make_eval_images, normalize_batch, pretrain_clip
    from leclip_tpu.data.tokenizer import tokenize
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.engine.evaluator import mAP
    from leclip_tpu.models.clip import clip_encode_image, clip_encode_text
    from leclip_tpu.ops.quant import quantize_stack_on_device
    from leclip_tpu.ops.quant_stress import (apply_outlier_profile,
                                             fitted_channel_scales)

    classnames = list(COCO_OBJECT_CATEGORIES)
    ws = args.vision_workspace
    ns = _ap.Namespace(backbone=args.vision_backbone, pairs=args.vision_pairs,
                       batch=256, epochs=args.vision_epochs, lr=args.vision_lr,
                       zs_target=80.0, zs_eval_n=1000)
    pre = pretrain_clip(ws, ns, classnames)
    clip_cfg = pre["cfg"]
    params = pre["params"]
    layers, width = (clip_cfg.vision_layers, clip_cfg.vision_width)
    profile = fitted_channel_scales(layers, width, seed=args.seed,
                                    outlier_frac=args.outlier_frac,
                                    outlier_mult=args.outlier_mult)
    params = dict(params, visual=dict(
        params["visual"],
        blocks=apply_outlier_profile(params["visual"]["blocks"], profile)))

    vimgs, vlabels = make_eval_images(args.probe, 999,
                                      clip_cfg.image_resolution, classnames)
    toks = jnp.asarray(tokenize([f"a photo of a {c}." for c in classnames]),
                       jnp.int32)

    @jax.jit
    def text_fn(p, t):
        f = clip_encode_text(p, clip_cfg, t)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    @jax.jit
    def img_fn(p, x, q8_arg):
        f = clip_encode_image(p, clip_cfg, x, q8=q8_arg)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    tf = np.asarray(text_fn(params, toks), np.float32)

    def probe_map(q8_arg):
        feats = []
        for i in range(0, len(vimgs), 256):
            x = jnp.asarray(normalize_batch(vimgs[i:i + 256]))
            feats.append(np.asarray(img_fn(params, x, q8_arg), np.float32))
        return mAP(vlabels, np.concatenate(feats) @ tf.T)

    q8 = quantize_stack_on_device(
        jax.tree.map(jnp.asarray, params["visual"]["blocks"]))
    m_fp = probe_map(None)
    m_i8 = probe_map(q8)
    delta = abs(m_fp - m_i8)
    label = {
        "ViT-SYN": "vision-768x12 (ViT-B visual — the TEST.PREC auto surface)",
        "ViT-SYN-L": "vision-1024x12 (ViT-L visual WIDTH at half its 24-layer "
                     "depth — quantization noise compounds with depth, so a "
                     "PASS here is necessary-not-sufficient for ViT-L)",
    }.get(args.vision_backbone, f"vision-{width}x{layers}")
    rec = {
        "geometry": label,
        "width": width, "layers": layers,
        "outlier_frac": args.outlier_frac, "outlier_mult": args.outlier_mult,
        "outlier_channels_per_layer": int(round(args.outlier_frac * width)),
        "probe": int(len(vimgs)),
        "pretrain_zs_mAP": pre["log"]["zs_mAP"],
        "probe_mAP_fp": round(m_fp, 4),
        "probe_mAP_int8": round(m_i8, 4),
        "delta": round(delta, 4),
        "bound": 0.2,
        "pass": bool(delta < 0.2),
    }
    print(f"[vision-{width}x{layers}] fp {m_fp:.4f} int8 {m_i8:.4f} "
          f"delta {delta:.4f} -> {'PASS' if rec['pass'] else 'FAIL'}",
          flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--captions", type=int, default=20000)
    ap.add_argument("--probe", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outlier-frac", type=float, default=0.008)
    ap.add_argument("--outlier-mult", type=float, default=50.0)
    ap.add_argument("--geometries", default="",
                    help="comma-separated width filter, e.g. '512'; 'none' "
                         "skips the text geometries entirely")
    ap.add_argument("--vision", action="store_true",
                    help="also run the real-geometry VISION gate "
                         "(ViT-SYN pretrain on the glyph benchmark)")
    ap.add_argument("--vision-backbone", default="ViT-SYN",
                    help="ViT-SYN (768-wide, ViT-B) or ViT-SYN-L (1024-wide)")
    ap.add_argument("--vision-workspace", default="/tmp/image_rehearsal_vit")
    ap.add_argument("--vision-pairs", type=int, default=40_000)
    ap.add_argument("--vision-epochs", type=int, default=20)
    ap.add_argument("--vision-lr", type=float, default=5e-4)
    ap.add_argument("--out", default="quant_gate_realwidth.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.captions, args.probe, args.epochs, args.batch = 600, 400, 2, 128

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []

    def flush():
        # write after every geometry: a tunnel failure on a later geometry
        # must not lose an earlier measured result
        out = {
            "metric": "real-width int8 task-level probe-mAP delta (bound 0.2)",
            "results": results,
            "all_pass": all(r["pass"] for r in results),
            "backend": jax.default_backend(),
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        return out

    out = {"results": []}
    if args.geometries != "none":
        for gname, (w, h, l) in GEOMETRIES.items():
            if args.geometries and str(w) not in args.geometries.split(","):
                continue
            results.append(run_geometry(gname, w, h, l, args))
            out = flush()
    if args.vision:
        results.append(run_vision_gate(args))
        out = flush()
    print(json.dumps({k: out[k] for k in ("metric", "all_pass")}
                     | {"deltas": {r["geometry"]: r["delta"]
                                   for r in results}}))


if __name__ == "__main__":
    main()
