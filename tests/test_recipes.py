"""Recipe-family functional tests: each dataset-synthesis family
(mix / check / zema / zuan — ref datasets/pazhou_distill_chatglm_multi_label_
{mix,check,zema,zuan}.py) must produce a corpus a prompt-tuning run can
actually LEARN from — held-out probe mAP (TRAIN.probe_holdout) rises over
training with a tiny random backbone. This is regression coverage for the
dataset-synthesis code at the recipe level (VERDICT r2 item 4): unit tests
check row counts and labels, this checks the end product trains.
"""

import json
import os

import numpy as np
import pytest

from leclip_tpu.data.datasets import build_dataset
from leclip_tpu.engine.config import setup_config
from leclip_tpu.engine.trainer import CaptionDistillTrainer
from leclip_tpu.models.clip import PRESETS, init_clip_params
from leclip_tpu.parallel.mesh import shard_batch

import jax

pytestmark = pytest.mark.slow  # four tiny-backbone training runs


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    """Synthetic caption corpora in the reference's file formats, sized so
    every family yields a few thousand learnable rows."""
    root = tmp_path_factory.mktemp("recipes") / "generated_captions"
    root.mkdir()
    (root / "challenge").mkdir()
    rng = np.random.default_rng(0)
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES as CLS

    contexts = ["in a park", "on a table", "near the beach", "at night",
                "with a friend", "under a tree"]
    # multi-label corpus [{id, caption}] — 600 captions over the full vocab
    multi = []
    for i in range(600):
        k = rng.integers(1, 4)
        names = list(rng.choice(CLS, size=k, replace=False))
        ctx = contexts[rng.integers(len(contexts))]
        multi.append({"id": i,
                      "caption": "a photo of a " + " and a ".join(names) + f" {ctx}."})
    (root / "tiny_corpus.json").write_text(json.dumps(multi))
    # single-label corpus {class_idx: [numbered lines]}
    single = {
        str(ci): [f"{j + 1}. A {CLS[ci]} {contexts[j % len(contexts)]}."
                  for j in range(4)]
        for ci in range(0, 80, 2)
    }
    (root / "ChatGLM_single_label_1.json").write_text(json.dumps(single))
    # a dense hard-class single-label file: at reference scale the clean
    # corpus (~220k captions) drowns check's faithful-but-noisy person-pair
    # template block (~1k rows); give the tiny fixture the same balance
    from leclip_tpu.data.corpora import HARD_CLS
    hard_single = {
        str(CLS.index(name)): [
            f"{j + 1}. A {name} {contexts[j % len(contexts)]} number {j}."
            for j in range(60)
        ]
        for name in HARD_CLS
    }
    (root / "ChatGLM_single_label_2.json").write_text(json.dumps(hard_single))
    # challenge corpus (hard classes)
    with open(root / "challenge" / "c.jsonl", "w") as f:
        for i in range(60):
            names = list(rng.choice(
                ["knife", "spoon", "fork", "scissors", "toaster"], size=2,
                replace=False,
            ))
            f.write(json.dumps({
                "labels": names,
                "captions": [f"1. A {names[0]} next to a {names[1]}."],
            }) + "\n")
    # category sets
    lines = []
    for _ in range(120):
        k = rng.integers(2, 5)
        lines.append(",".join(rng.choice(CLS, size=k, replace=False)))
    (root / "category_sets.txt").write_text("\n".join(lines) + "\n")
    (root / "components_of_few_shot_classes.json").write_text(
        json.dumps({"toaster": ["bread", "kitchen counter"]})
    )
    return str(root)


def _probe_map_taught(tr, exclude=()):
    """Probe mAP over the classes the recipe actually TEACHES (probe columns
    with ≥1 positive) — the full 80-class mean dilutes hard-class curricula
    like check, where only the ~14 hard classes carry any training signal
    by design (ref ..._check.py restricts every corpus part to them).
    ``exclude`` drops classes whose training rows are deliberately noisy by
    reference design (check's person-pair block labels class 0 on
    person-only template texts, check.py:336-348 — faithful mislabeling that
    no model can score right on a held-out probe)."""
    import jax.numpy as jnp

    from leclip_tpu.engine.evaluator import mAP
    from leclip_tpu.models.dense_clip import (
        encode_captions, train_logits_from_features,
    )

    params = jax.device_get(tr.state.params)
    pp = {k: v for k, v in params.items() if k != "_adapter"}
    outs, bs = [], 256
    toks = tr.probe_tokens
    for i in range(0, len(toks), bs):
        chunk = toks[i:i + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        feats = encode_captions(tr.clip_params, tr.clip_cfg,
                                jnp.asarray(chunk), tr.flags)
        out, out_local = train_logits_from_features(
            tr.clip_params, tr.clip_cfg, pp, tr.constants, feats, tr.flags)
        merged = (0.5 * np.asarray(out, np.float32)
                  + 0.5 * np.asarray(out_local, np.float32))
        outs.append(merged[:bs - pad])
    preds = np.concatenate(outs)
    taught = tr.probe_labels.sum(axis=0) > 0
    for c in exclude:
        taught[c] = False
    return mAP(tr.probe_labels[:, taught], preds[:, taught])


def _probe_rises(cfg, min_gain=1.5, max_steps_per_epoch=8, epochs=4,
                 exclude=()):
    ds = build_dataset(cfg)
    tiny = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    tr = CaptionDistillTrainer(cfg, clip_params, tiny, dataset=ds)
    assert tr.probe_tokens is not None and len(tr.probe_tokens) >= 100
    before = _probe_map_taught(tr, exclude)
    for epoch in range(epochs):
        for i, batch in enumerate(tr.batcher.epoch(epoch)):
            if i >= max_steps_per_epoch:
                break
            sb = shard_batch(batch, tr.mesh)
            tr.state, m = tr.train_step(tr.state, sb["img"], sb["label"])
            assert np.isfinite(float(m["loss"]))  # host-sync each step
    after = _probe_map_taught(tr, exclude)
    assert after > before + min_gain, (before, after)
    return before, after


_COMMON = [
    "DATALOADER.BATCH_SIZE_TRAIN", "256", "TRAINER.N_CTX", "4",
    "OPTIM.LR", "0.1", "OPTIM.MAX_EPOCH", "4", "OPTIM.WARMUP_EPOCH", "-1",
    "TRAIN.PRINT_FREQ", "100000", "TRAIN.CHECKPOINT_FREQ", "-1",
    "TRAIN.probe_holdout", "8",
]


def test_recipe_family_mix_learns(corpus_root):
    cfg = setup_config(opts=_COMMON + [
        "DATASET.NAME", "chatglm_caption_mix",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "tiny_corpus",
        "TRAIN.add_few_shot", "True",
    ])
    _probe_rises(cfg)


def test_recipe_family_check_learns(corpus_root):
    # lr 0.1 oscillates on this curriculum (loss flat at ~130 for 48 steps;
    # 0.01 converges monotonically) — the hard-class corpus is ~14 classes
    # with near-duplicate captions, so per-class gradients are much larger
    # than in the 80-class families
    cfg = setup_config(opts=_COMMON + [
        "OPTIM.LR", "0.01",
        "DATASET.NAME", "chatglm_caption_check",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "tiny_corpus",
        "TRAIN.hard_data", "hard",
        "TRAIN.challenge_data", "True",
    ])
    # exclude person (class 0): the faithful person-pair block trains it on
    # person-only texts labeled {0, j} — irreducible probe noise by design
    _probe_rises(cfg, epochs=6, exclude=(0,))


def test_recipe_family_zema_learns(corpus_root):
    # the zema RECIPE also sets TRAIN.ema, but that belongs to a fine-tune
    # stage (10000x-weighted KL pull toward the EMA teacher — it pins a
    # from-scratch run in place by design); EMA trainer mechanics are covered
    # in test_train.py::test_ema_follows_params. This test exercises the zema
    # DATASET family (include_samples=False category sets, imnames_ without
    # `final`).
    cfg = setup_config(opts=_COMMON + [
        "DATASET.NAME", "chatglm_caption_zema",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "tiny_corpus",
    ])
    # zema's corpus is dominated by the n² pair templates (~6400 of ~8000
    # rows), so 32 capped steps cover barely one epoch — give it more
    _probe_rises(cfg, epochs=10)


def test_recipe_family_zuan_learns(corpus_root):
    cfg = setup_config(opts=_COMMON + [
        "DATASET.NAME", "chatglm_caption_zuan",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "tiny_corpus",
    ])
    _probe_rises(cfg)
