"""Smoke regression for scripts/ensemble_eval.py — the closed-loop accuracy
artifact generator (routed ensemble vs best member; README "Accuracy
evidence"). Trains one tiny member through the real train CLI, stages it
under two ensemble names, and runs the script's main() end-to-end on CPU."""

import json
import os
import shutil
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
SCRIPTS = os.path.join(os.path.dirname(HERE), "scripts")


@pytest.fixture()
def tiny_ws(tmp_path):
    croot = tmp_path / "text_result" / "generated_captions"
    croot.mkdir(parents=True)
    single = {"16": ["1. A dog runs in a park."], "15": ["1. A cat on a couch."]}
    for i in range(1, 6):
        (croot / f"ChatGLM_single_label_{i}.json").write_text(json.dumps(single))
    multi = [
        {"id": 0, "caption": "A person rides a bicycle."},
        {"id": 1, "caption": "A dog and a cat."},
        {"id": 2, "caption": "A pizza on a dining table."},
    ]
    (croot / "tiny.json").write_text(json.dumps(multi))
    (croot / "category_sets.txt").write_text("dog,cat\nperson,bicycle\n")
    droot = tmp_path / "data" / "official_a"
    droot.mkdir(parents=True)
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES

    (droot / "classes.txt").write_text("\n".join(COCO_OBJECT_CATEGORIES))
    return tmp_path


def test_ensemble_eval_script_end_to_end(tiny_ws, tmp_path):
    from leclip_tpu.cli.train import main as train_main

    out = tmp_path / "run"
    train_main([
        "--output-dir", str(out), "--backbone", "RN-TEST", "--seed", "0",
        "DATASET.ROOT", str(tiny_ws / "data"),
        "DATASET.caption_feat_root", str(tiny_ws / "text_result"),
        "DATASET.NAME", "chatglm_caption_mix",
        "TRAIN.Caption_name", "tiny",
        "OPTIM.MAX_EPOCH", "1",
        "DATALOADER.BATCH_SIZE_TRAIN", "1024",
        "TRAINER.N_CTX", "4", "TRAIN.PRINT_FREQ", "1000",
    ])
    ckpt = out / "prompt_learner" / "model.ckpt-0"
    for name in ["best", "ema"]:
        (tiny_ws / "best_model" / name).mkdir(parents=True)
        shutil.copy(ckpt, tiny_ws / "best_model" / name / "model.ckpt")

    sys.path.insert(0, SCRIPTS)
    import ensemble_eval

    argv = sys.argv
    sys.argv = ["ensemble_eval.py", "--workspace", str(tiny_ws),
                "--backbone", "RN-TEST", "--n", "48", "--batch", "24",
                "--no-bank", "--cpu", "--min-pos", "1"]
    import jax

    try:
        ensemble_eval.main()
    finally:
        sys.argv = argv
        # main() enables the shared persistent compilation cache
        # (/tmp/leclip_jax_cache); leave the SUITE's process out of it —
        # that cache can hold XLA:CPU AOT entries compiled on a different
        # host microarchitecture (the VM migrates between rounds), and
        # loading one SIGILL-aborts the whole pytest process (observed
        # 2026-08: deterministic 'Fatal Python error: Aborted' two files
        # later in test_learning)
        jax.config.update("jax_compilation_cache_dir", None)

    with open(tiny_ws / "ensemble_accuracy.json") as f:
        report = json.load(f)
    assert set(report["members"]) == {"best", "ema"}
    for m in report["members"].values():
        assert np.isfinite(m["alone_mAP"]) and np.isfinite(m["fused_mAP"])
    assert np.isfinite(report["routed_mAP"])
    assert report["n_val"] + report["n_test"] == 48
    scores = np.load(tiny_ws / "ensemble_scores.npz")
    assert scores["merged_test_best"].shape == (24, 80)
    assert scores["labels"].shape == (48, 80)
