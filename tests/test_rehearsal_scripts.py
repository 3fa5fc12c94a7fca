"""Tests for the measured-rehearsal scripts (scripts/rehearsal.py and
scripts/train_rehearsal.py) — the executable evidence behind the repo's
end-to-end wall-clock claims (ref /root/reference/README.md:16-18,
run_eval.sh:37-41, train_2.sh:30-52).

The heavy paths themselves run on the chip; here we pin (a) the
trained-checkpoint evaluation mode end-to-end on CPU with a tiny backbone,
and (b) the contracts that keep the two scripts consistent with the shipped
launchers (picked epochs, recipe list, synthesised artifact formats).
"""

import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_train_rehearsal_recipes_match_train_all_sh():
    """train_rehearsal.RECIPES must stay in lockstep with scripts/train_all.sh
    (same six members, seeds, and picked epochs — the train_2.sh:30-52
    contract); drift here would silently rehearse a different suite than the
    shipped launcher trains."""
    import train_rehearsal

    with open(os.path.join(REPO, "scripts", "train_all.sh")) as f:
        sh = f.read()
    picks = re.findall(
        r"^train_one\s+(\w+)\s+(\w+)\s+(\d+)\s+(\d+)", sh, re.MULTILINE
    )
    assert [(n, c, int(s), int(e)) for n, c, s, e in picks] == [
        tuple(r) for r in train_rehearsal.RECIPES
    ]


def test_train_rehearsal_workspace_matches_corpus_loaders(tmp_path):
    """The synthetic workspace must satisfy the real corpus loaders'
    artifact contracts (the reference formats, SURVEY §2.8): multi-label
    JSON, single-label numbered JSON, category_sets.txt, challenge JSONL."""
    import train_rehearsal

    croot = train_rehearsal.synth_workspace(str(tmp_path), scale=0.0001)

    from leclip_tpu.data.corpora import (
        category_set_samples,
        load_challenge_corpus,
        load_multi_label_corpus,
        load_single_label_corpus,
    )
    from leclip_tpu.data.labeling import CaptionLabeler

    labeler = CaptionLabeler()
    tokens, labels = load_multi_label_corpus(
        croot, "ChatGLM_multi_labels_filtered", labeler, cache=False
    )
    assert len(tokens) >= 2 and np.asarray(labels).shape[1] == 80
    # synthesised captions embed real class names → labels are non-trivial
    assert np.asarray(labels).sum() > 0

    single = load_single_label_corpus(
        croot, labeler, files=["ChatGLM_single_label_1.json"]
    )
    n_lines = train_rehearsal.SINGLE_LABEL_LINES
    assert len(single) == 80 * n_lines
    for cidx in range(80):  # forced class idx per file group (ref mix.py:145-160)
        assert all(lab[cidx] == 1
                   for _, lab in single[cidx * n_lines:(cidx + 1) * n_lines])

    sets = category_set_samples(
        os.path.join(croot, "category_sets.txt"), include_samples=False
    )
    assert len(sets) >= 2
    assert all(np.asarray(lab).sum() >= 2 for _, lab in sets)

    challenge = load_challenge_corpus(os.path.join(croot, "challenge"))
    assert len(challenge) >= 2
    assert all(np.asarray(lab).sum() >= 1 for _, lab in challenge)


@pytest.mark.slow
def test_rehearsal_model_dir_mode(tmp_path):
    """scripts/rehearsal.py --model-dir: the test.sh stage of the full
    competition dress rehearsal, end-to-end on CPU — six trained-format
    checkpoints (heterogeneous n_ctx: ema=64) + caption-bank build from the
    cached tokenized corpus + co-occurrence stats → bucket-sorted fused TTA →
    impreds.json with one 80-float row per image."""
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.engine.checkpoint import save_checkpoint
    from leclip_tpu.engine.train_state import TrainState
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.prompt import build_prompt_learner

    cfg = PRESETS["RN-TEST"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    md = tmp_path / "best_model"
    for i, name in enumerate(["best", "ema", "zema", "diffh", "diff", "difft"]):
        n_ctx = 64 if name == "ema" else 16
        trainable, _ = build_prompt_learner(
            jax.random.PRNGKey(10 + i), params,
            list(COCO_OBJECT_CATEGORIES), n_ctx=n_ctx,
        )
        st = TrainState(step=jnp.zeros((), jnp.int32), params=trainable,
                        ema_params=trainable, opt_state=None)
        p = save_checkpoint(st, str(md), name, 0)
        os.replace(p, os.path.join(str(md), name, "model.ckpt"))

    croot = tmp_path / "generated_captions"
    croot.mkdir()
    rng = np.random.default_rng(0)
    tok = rng.integers(0, 400, (200, 77)).astype(np.int32)
    with open(croot / "ChatGLM_multi_labels_filtered_all_caption_tokenized.pkl",
              "wb") as f:
        pickle.dump(tok, f)
    lab = {i: rng.integers(0, 2, 80).astype(np.float64).tolist()
           for i in range(200)}
    with open(croot / "ChatGLM_multi_labels_filtered_labels.pkl", "wb") as f:
        pickle.dump(lab, f)

    corpus = tmp_path / "corpus"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device is enough; 8 slows compile
    r = subprocess.run(
        [sys.executable, "scripts/rehearsal.py", "--cpu", "--images", "6",
         "--batch-size", "2", "--precision", "bf16", "--backbone", "RN-TEST",
         "--model-dir", str(md), "--caption-root", str(croot),
         "--keep-dir", str(corpus)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["images"] == 6
    assert summary["precision"] == "bf16"
    assert summary["value"] > 0
    with open(corpus / "impreds.json") as f:
        preds = json.load(f)
    assert len(preds) == 6 and all(len(row) == 80 for row in preds)
    assert np.isfinite(np.asarray(preds, np.float64)).all()


@pytest.mark.slow
def test_train_rehearsal_end_to_end(tmp_path):
    """scripts/train_rehearsal.py end-to-end on CPU with the tiny backbone:
    one recipe (best, 5 epochs so the picked epoch-4 checkpoint exists, as
    train_2.sh:30-52 copies it), synthetic workspace at tiny scale — asserts
    the measurement record's contract, the best_model/ checkpoint copy, and
    that a re-run skips the already-measured recipe (resumability)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    cmd = [
        sys.executable, "scripts/train_rehearsal.py", "--cpu",
        "--workspace", str(tmp_path), "--scale", "0.0005",
        "--backbone", "RN-TEST", "--recipes", "best",
        "DATALOADER.BATCH_SIZE_TRAIN", "256",
    ]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-4000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["unit"] == "seconds" and summary["value"] > 0
    assert summary["backbone"] == "RN-TEST"
    assert list(summary["recipes"]) == ["best"]

    with open(tmp_path / "rehearsal_results.jsonl") as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 1
    rec = recs[0]
    assert rec["recipe"] == "best" and rec["seed"] == 0
    assert rec["epochs"] == 5 and rec["samples"] > 0
    assert rec["captions_per_s"] > 0
    assert np.isfinite(rec["probe_mAP"])
    # train_2.sh copies epoch 4 for `best`; the rehearsal mirrors that
    assert rec["picked_epoch"] == 4
    assert os.path.exists(tmp_path / "best_model" / "best" / "model.ckpt")

    # re-run: the measured recipe is skipped, summary totals unchanged
    r2 = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                        text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-4000:]
    assert "already measured" in r2.stdout
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["recipes"] == summary["recipes"]
