"""Dual-encoder fine-tuning on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from leclip_tpu.data.tokenizer import tokenize
from leclip_tpu.engine.finetune import (
    CLIPFineTuner,
    clip_contrastive_loss,
    multilabel_finetune_loss,
)
from leclip_tpu.models.clip import PRESETS, init_clip_params

TINY_RN = PRESETS["RN-TEST"]
TINY_VIT = PRESETS["ViT-TEST"]


def _pairs(n=16, res=64):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(n, res, res, 3)), jnp.float32)
    texts = [f"a photo of sample {i}" for i in range(n)]
    return {"image": images, "tokens": jnp.asarray(tokenize(texts))}


def test_contrastive_loss_shape():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_RN)
    b = _pairs(8)
    loss, logits = clip_contrastive_loss(params, TINY_RN, b["image"], b["tokens"])
    assert logits.shape == (8, 8)
    assert np.isfinite(float(loss))
    # random features → loss near ln(8)
    assert abs(float(loss) - np.log(8)) < 1.0


def test_finetuner_reduces_loss_dual_backbones():
    batch = _pairs(16)
    for cfg in (TINY_RN, TINY_VIT):
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        ft = CLIPFineTuner(params, cfg, lr=3e-4, warmup_steps=0, total_steps=100,
                           remat=False)
        state = ft.state
        first = None
        for i in range(15):
            state, m = ft.train_step(state, batch["image"], batch["tokens"])
            if i == 0:
                first = float(m["loss"])
        assert float(m["loss"]) < first, cfg
        assert int(state.step) == 15


def test_multilabel_finetune_loss():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_RN)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    tf = jnp.asarray(rng.normal(size=(5, TINY_RN.embed_dim)), jnp.float32)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    labels = jnp.asarray((rng.random((4, 5)) < 0.4).astype(np.float32))
    loss, logits = multilabel_finetune_loss(params, TINY_RN, imgs, tf, labels)
    assert logits.shape == (4, 5)
    assert np.isfinite(float(loss))


def test_pair_pipeline_train_then_resume(tmp_path):
    """Full (image, caption) pipeline: JPEGs on disk → PairBatcher →
    fit_pairs (device-side augmentation, JSONL metrics, per-epoch
    checkpoints) → resume picks up at the next epoch with the same step
    counter (VERDICT r1 next-round item 6)."""
    import json
    import os

    from PIL import Image

    from leclip_tpu.data.loader import PairBatcher

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    paths, caps = [], []
    for i in range(16):
        p = str(d / f"p{i}.jpg")
        Image.fromarray(
            rng.integers(0, 255, (60 + 4 * i, 80, 3)).astype(np.uint8)
        ).save(p)
        paths.append(p)
        caps.append(f"a photo of sample {i}")

    batcher = PairBatcher(paths, captions=caps, batch_size=8, bucket=(96, 96))
    assert batcher.steps_per_epoch() == 2

    cfg = TINY_RN
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "run")
    ft = CLIPFineTuner(params, cfg, lr=1e-4, warmup_steps=0, total_steps=20,
                       remat=False)
    ft.fit_pairs(batcher, epochs=2, output_dir=out, log_every=100)
    assert int(ft.state.step) == 4
    assert os.path.exists(os.path.join(out, "clip_finetune", "model.ckpt-1"))
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert {r["tag"] for r in recs} == {"finetune/loss", "finetune/acc"}
    assert len([r for r in recs if r["tag"] == "finetune/loss"]) == 4

    # fresh tuner resumes at epoch 2 and trains one more epoch
    ft2 = CLIPFineTuner(init_clip_params(jax.random.PRNGKey(1), cfg), cfg,
                        lr=1e-4, warmup_steps=0, total_steps=20, remat=False)
    ft2.fit_pairs(batcher, epochs=3, output_dir=out, log_every=100)
    assert int(ft2.state.step) == 6  # resumed 4 + one epoch of 2 steps
    # resumed params came from the checkpoint, not the fresh init
    p_ckpt = ft.state.params["logit_scale"]
    assert np.isfinite(float(ft2.state.params["logit_scale"]))
    assert abs(float(ft2.state.params["logit_scale"]) - float(p_ckpt)) < 0.5


def test_pair_pipeline_prefetch_and_deferred_sync_identical(tmp_path):
    """prefetch (background batch upload) and sync_every (deferred metrics
    fetch) change only WHERE/WHEN host I/O happens: params, step counter,
    and the per-step JSONL rows must be identical to the inline run."""
    import json
    import os

    from PIL import Image

    from leclip_tpu.data.loader import PairBatcher

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    paths, caps = [], []
    for i in range(16):
        p = str(d / f"p{i}.jpg")
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        ).save(p)
        paths.append(p)
        caps.append(f"a photo of sample {i}")

    def run(out, **kw):
        batcher = PairBatcher(paths, captions=caps, batch_size=8,
                              bucket=(96, 96))
        ft = CLIPFineTuner(init_clip_params(jax.random.PRNGKey(0), TINY_RN),
                           TINY_RN, lr=1e-4, warmup_steps=0, total_steps=20,
                           remat=False)
        ft.fit_pairs(batcher, epochs=2, output_dir=out, log_every=100, **kw)
        rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
        return ft.state, rows

    s_ref, rows_ref = run(str(tmp_path / "a"))
    s_pre, rows_pre = run(str(tmp_path / "b"), prefetch=2, sync_every=3)
    assert int(s_ref.step) == int(s_pre.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_ref.params, s_pre.params,
    )
    assert [(r["tag"], r["step"], r["value"]) for r in rows_ref] == \
           [(r["tag"], r["step"], r["value"]) for r in rows_pre]


def test_decay_mask_structure():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_RN)
    mask = CLIPFineTuner._decay_mask(params)
    assert mask["text"]["text_projection"] is True
    assert mask["text"]["token_embedding"] is False
    assert mask["logit_scale"] is False


def test_pair_batcher_small_dataset_static_shapes(tmp_path):
    """A dataset smaller than one batch must still yield full static-shape
    batches (modular wrap); shards must partition the permutation."""
    import numpy as np
    from PIL import Image

    from leclip_tpu.data.loader import PairBatcher

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    caps = [f"a photo number {i}" for i in range(5)]

    b = PairBatcher(paths, captions=caps, batch_size=16, bucket=(48, 48))
    batches = list(b.epoch(0))
    assert len(batches) == 1
    assert batches[0]["image_u8"].shape == (16, 48, 48, 3)
    assert batches[0]["tokens"].shape[0] == 16

    # two shards cover disjoint halves of the same permutation
    sh = [PairBatcher(paths[:4], captions=caps[:4], batch_size=2,
                      shard_index=i, num_shards=2, bucket=(48, 48))
          for i in range(2)]
    seen = []
    for s in sh:
        assert s.steps_per_epoch() == 1
        seen.extend(np.asarray(next(iter(s.epoch(0)))["tokens"])[:, :8].tolist())
    # 4 distinct captions across the two shards (disjoint contiguous slices)
    assert len({tuple(t) for t in seen}) == 4
