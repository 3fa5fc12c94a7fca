"""Benchmark: ViT-B/16 multi-scale-TTA inference throughput on one chip.

Measures the full production path — raw uint8 images → on-device crop
pyramid (scales 2/3/4 → 304 crops + 1 global per image) → bicubic resize →
CLIP normalise → ViT-B/16 image encoder → dense + global prompt logits for
a 6-member ensemble with retrieval augmentation — and reports 224²
crop-forwards/sec/chip.

BOTH precisions are measured in one run: the W8A8 int8 pallas-kernel path
(the production default for ViT towers — task-level accuracy gate in
tests/test_quant_gate.py) and the unquantized bf16 path. The JSON line
carries the int8 number as `value` and the bf16 number as `value_bf16`
so the driver records the pair. BENCH_PREC=int8|bf16 restricts to one
precision; batch via BENCH_BATCH (default 16). Each precision reports the
median of 3 timed passes (tunnel-variance pinning).

Baseline: the reference does ≈9.8M crop-forwards in 10–12 h on an A40
(≈250 crop-forwards/s; BASELINE.md "Implied reference throughput").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
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

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from _synth import synth_engine_inputs

    from leclip_tpu.inference.tta import TTAEngine

    # the canonical synthetic setup shared with scripts/rehearsal.py and the
    # probes — see scripts/_synth.py. BENCH_PRESET=RN50 measures the
    # reference's shipped backbone (bf16 only: int8 conv is a measured no-go,
    # scripts/probe_rn50_int8.py).
    preset = os.environ.get("BENCH_PRESET", "ViT-B/16")
    clip_cfg, clip_params, specs, bank = synth_engine_inputs(preset, log=log)

    rng = np.random.default_rng(0)
    # 16 images x 305 crops = 4880 crops per dispatch: amortises the fixed
    # per-batch work (crop gather setup, retrieval top-k, dispatch latency).
    # Measured int8: batch 4 → 4,896; 8 → 5,286; 16 → 5,312; 32 OOMs HBM
    # (20.1 G needed vs 15.75 G).
    # Per-preset default batch = the largest that fits HBM (measured):
    # ViT-B/16 → 16 (32 OOMs), RN50 → 8 (16 OOMs on trunk early-stage
    # activations), ViT-L/14 → 4. BENCH_BATCH overrides.
    default_batch = {"RN50": 8, "ViT-L/14": 4}.get(preset, 16)
    batch_images = int(os.environ.get("BENCH_BATCH", str(default_batch)))
    images = [
        rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        for _ in range(batch_images)
    ]

    def measure(precision: str) -> tuple:
        """Compile + time the fused TTA program at one precision."""
        engine = TTAEngine(
            clip_params, clip_cfg, specs, scales=(2, 3, 4),
            caption_bank=bank,
            compute_dtype=jnp.bfloat16,
            precision=precision,
        )
        crops_per_image = 1 + engine.n_blocks  # 305 for scales (2,3,4)
        log(f"[{precision}] compiling + warmup…")
        engine.run_batch_fused(images)
        log(f"[{precision}] warmup done; timing")
        # Inputs are staged to the device ONCE and the fused program
        # dispatched on the staged batch: chip throughput with the
        # host→device transfer off the critical path (a producer thread
        # stages ahead in production — the competition pass needs ~20 MB/s
        # of input vs GB/s host links; re-staging per batch over THIS dev
        # tunnel adds ±4% network noise). The sustained number WITH host
        # decode + staging on-thread is measured by scripts/rehearsal.py.
        # median of 3 timed passes: the shared axon tunnel adds run-to-run
        # variance (r2→r3 the driver recorded a −1.2% dip that local runs
        # didn't reproduce); the compile is already warm so the extra passes
        # cost ~50 s total and pin the reported number against outliers.
        iters = 20
        staged = engine.stage_batch_fused(images)
        passes = []
        for p in range(3):
            outs = []
            t0 = time.perf_counter()
            for _ in range(iters):
                outs.append(engine.dispatch_staged_fused(staged))
                if len(outs) > 2:
                    np.asarray(outs.pop(0))  # consume depth-2 behind dispatch
            for o in outs:
                np.asarray(o)
            dt = time.perf_counter() - t0
            passes.append(iters * batch_images * crops_per_image / dt)
            log(f"[{precision}] pass {p + 1}/3: {passes[-1]:.1f} crop-forwards/s")
        crops_per_sec = float(np.median(passes))
        log(f"[{precision}] median {crops_per_sec:.1f} crop-forwards/s "
            f"(spread {min(passes):.1f}–{max(passes):.1f})")
        return crops_per_sec

    only = os.environ.get("BENCH_PREC", "")
    if only:
        precisions = [only]
    elif clip_cfg.is_vit:
        precisions = ["int8", "bf16"]
    else:
        precisions = ["bf16"]
    results = {p: measure(p) for p in precisions}

    # int8 is the headline AND the production default for ViT towers
    # (TEST.PREC 'auto'; task-level mAP gate in tests/test_quant_gate.py);
    # the bf16 pair rides along so the record always carries both.
    primary = "int8" if "int8" in results else precisions[0]
    out = {
        "metric": f"{preset} multi-scale TTA crop-forwards/sec/chip (6-model ensemble, 305 crops/img)",
        "value": round(results[primary], 2),
        "unit": "crop-forwards/sec",
        "vs_baseline": round(results[primary] / BASELINE_CROPS_PER_SEC, 2),
        "precision": primary,
        "batch_images": batch_images,
    }
    if "bf16" in results and primary != "bf16":
        out["value_bf16"] = round(results["bf16"], 2)
        out["vs_baseline_bf16"] = round(results["bf16"] / BASELINE_CROPS_PER_SEC, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
