"""Benchmark: ViT-B/16 multi-scale-TTA inference throughput on one chip.

Measures the full production path — raw uint8 images → on-device crop
pyramid (scales 2/3/4 → 304 crops + 1 global per image) → bicubic resize →
CLIP normalise → ViT-B/16 image encoder (bf16) → dense + global prompt
logits for a 6-member ensemble with retrieval augmentation — and reports
224² crop-forwards/sec/chip.

Baseline: the reference does ≈9.8M crop-forwards in 10–12 h on an A40
(≈250 crop-forwards/s; BASELINE.md "Implied reference throughput").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


BASELINE_CROPS_PER_SEC = 250.0


def main():
    import sys

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeated bench runs skip the multi-minute
    # tunnel compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.inference.tta import TTAEngine, build_model_spec
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner

    clip_cfg = PRESETS["ViT-B/16"]
    # init on CPU (fast) and ship once to the device
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg, dtype=jnp.bfloat16)
    device = jax.devices()[0]
    clip_params = jax.device_put(clip_params, device)

    flags = DenseFlags(use_evidence=True)
    specs = {}
    for i, name in enumerate(["best", "ema", "zema", "diff", "diffh", "difft"]):
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            trainable, constants = build_prompt_learner(
                jax.random.PRNGKey(i), clip_params, COCO_OBJECT_CATEGORIES,
                n_ctx=16, dtype=jnp.bfloat16,
            )
        specs[name] = build_model_spec(
            clip_params, clip_cfg,
            jax.device_put(trainable, device),
            constants,
            flags if name in ("best", "difft") else DenseFlags(),
        )

    rng = np.random.default_rng(0)
    bank = rng.normal(size=(220_000, clip_cfg.embed_dim)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)

    engine = TTAEngine(
        clip_params, clip_cfg, specs, scales=(2, 3, 4),
        caption_bank=jax.device_put(jnp.asarray(bank, jnp.bfloat16), device),
        compute_dtype=jnp.bfloat16,
    )

    batch_images = 2
    images = [
        rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        for _ in range(batch_images)
    ]
    crops_per_image = 1 + engine.n_blocks  # 305 for scales (2,3,4)

    # warmup / compile
    log("compiling + warmup…")
    engine.run_batch(images)
    log("warmup done; timing")

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        engine.run_batch(images)
    dt = time.perf_counter() - t0

    crops = iters * batch_images * crops_per_image
    crops_per_sec = crops / dt
    print(json.dumps({
        "metric": "ViT-B/16 multi-scale TTA crop-forwards/sec/chip (6-model ensemble, 305 crops/img)",
        "value": round(crops_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
