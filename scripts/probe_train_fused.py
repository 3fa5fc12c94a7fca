"""Probe: RN50 prompt-tuning step time with the fused bf16 caption branch.

Reproduces the round-2 training measurement (host-synced steps at batch 1024,
bf16 frozen towers, double_ranking + EMA — the reference's recipe regime) and
compares three caption-branch variants:
  xla   — unfused bf16 (the round-2 baseline: 138.9 ms)
  fused — bf16 fused-block kernels (ops/block_kernels.py), TRAIN.fused_captions
  int8  — W8A8 kernels (TRAIN.int8_captions; round-2: 112.2 ms)

Each step fetches the scalar loss (host sync — block_until_ready does not wait
on this tunnel), so the ~32 ms dispatch round trip is ON the clock for every
variant equally, as in the round-2 numbers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from leclip_tpu.engine.train_state import create_train_state
from leclip_tpu.engine.trainer import make_train_step
from leclip_tpu.models.clip import PRESETS, init_clip_params
from leclip_tpu.models.dense_clip import DenseFlags
from leclip_tpu.models.prompt import build_prompt_learner
from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES

B = int(os.environ.get("B", "1024"))
STEPS = int(os.environ.get("STEPS", "30"))


def main():
    cfg = PRESETS["RN50"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tr, cs = build_prompt_learner(
        jax.random.PRNGKey(1), params, COCO_OBJECT_CATEGORIES, n_ctx=16
    )
    opt = optax.sgd(2e-3)
    rng = np.random.default_rng(0)
    captions = np.zeros((B, cfg.context_length), np.int32)
    for i in range(B):
        n = rng.integers(8, cfg.context_length)
        captions[i, :n] = rng.integers(1, cfg.vocab_size - 2, n)
        captions[i, n] = cfg.vocab_size - 1
    labels = rng.integers(0, 2, (B, len(COCO_OBJECT_CATEGORIES))).astype(np.float32)
    captions_d = jax.device_put(jnp.asarray(captions))
    labels_d = jax.device_put(jnp.asarray(labels))

    variants = {"xla": {}, "fused": {"caption_fused": True}}
    from leclip_tpu.ops.quant import quantize_stack_on_device

    variants["int8"] = {"caption_q8": quantize_stack_on_device(params["text"]["blocks"])}

    for name, kw in variants.items():
        step = make_train_step(params, cfg, cs, opt, DenseFlags(), ema=True,
                               **kw)
        state = create_train_state(jax.tree.map(jnp.array, tr), opt)
        # warm up (compile) + 2 steady steps
        for _ in range(3):
            state, aux = step(state, captions_d, labels_d)
            float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, aux = step(state, captions_d, labels_d)
            float(aux["loss"])  # host sync
        per = (time.perf_counter() - t0) / STEPS
        print(f"{name:<6} step {per * 1e3:7.1f} ms @ {B}  = "
              f"{B / per:8.0f} captions/s", flush=True)


if __name__ == "__main__":
    main()
