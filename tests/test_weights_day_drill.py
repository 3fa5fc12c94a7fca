"""Weights-day drill: the EXACT command path a reference user runs on the
day real OpenAI weights become available (MIGRATION.md "Command mapping"),
rehearsed end-to-end against a reference-format torch checkpoint stand-in —
so the only untested step on weights-day is the weights themselves.

The .pt file is a REAL torch serialization of the reference's own CLIP class
(tiny geometry, full 49408 vocab), so the drill covers: torch-file load +
shape inference + weight conversion (models/convert.py) → zero-shot sanity
(cli.zeroshot) → training through the converted towers (cli.train --weights)
→ caption-bank precompute (cli.build_caption_bank --weights) → the full
ensemble eval to impreds.json (cli.eval --weights --caption-bank
--freq-stats). Ref commands replaced: train_2.sh / test.sh /
generate_caption_text_features.py."""

import json
import pickle
import shutil

import numpy as np
import pytest

from leclip_tpu.models.clip import CLIPConfig
from tests.conftest import requires_reference
from tests.test_models import _build_ref

pytestmark = [requires_reference, pytest.mark.slow]

DRILL_CFG = CLIPConfig(
    embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1), vision_width=8,
    vision_patch_size=None, vocab_size=49408, transformer_width=128,
    transformer_heads=2, transformer_layers=2,
)


@pytest.fixture()
def drill_ws(tmp_path):
    import torch

    # the weights-day artifact: a torch-serialized reference-format ckpt
    torch.save(_build_ref(DRILL_CFG).state_dict(), tmp_path / "RN50.pt")

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
    (droot / "images").mkdir(parents=True)
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES

    (droot / "classes.txt").write_text("\n".join(COCO_OBJECT_CATEGORIES))
    rng = np.random.default_rng(0)
    from PIL import Image

    names = []
    for i in range(3):
        arr = rng.integers(0, 255, (72, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(droot / "images" / f"img_{i}.jpg")
        names.append(f"img_{i}.jpg")
    (droot / "imnames_finalA.json").write_text(json.dumps(names))
    with open(tmp_path / "freq_stats.pkl", "wb") as f:
        pickle.dump({"adj": np.eye(80) + 1, "nums": np.full(80, 5.0)}, f)
    return tmp_path


def _common_opts(ws):
    return [
        "DATASET.ROOT", str(ws / "data"),
        "DATASET.caption_feat_root", str(ws / "text_result"),
        "DATASET.NAME", "chatglm_caption_mix",
        "TRAIN.Caption_name", "tiny",
        "OPTIM.MAX_EPOCH", "1",
        "DATALOADER.BATCH_SIZE_TRAIN", "1024",
        "TRAINER.N_CTX", "4",
        "TRAIN.PRINT_FREQ", "1000",
    ]


def test_weights_day_command_path(drill_ws, tmp_path):
    ws = drill_ws
    pt = str(ws / "RN50.pt")

    # 1. zero-shot sanity through the CONVERTED towers (ref zsclip.sh)
    from leclip_tpu.cli.zeroshot import main as zeroshot_main

    zs_out = str(tmp_path / "zeroshot.json")
    zeroshot_main([
        "--weights", pt,
        "--images-dir", str(ws / "data" / "official_a" / "images"),
        "--batch-size", "2", "--out", zs_out,
    ])
    zs = json.load(open(zs_out))  # {filename: [80 scores]}
    assert len(zs) == 3
    assert np.isfinite(np.asarray(list(zs.values()))).all()

    # 2. train one recipe from the .pt (ref train_2.sh one line)
    from leclip_tpu.cli.train import main as train_main

    out = tmp_path / "run"
    train_main([
        "--output-dir", str(out), "--weights", pt, "--seed", "0",
    ] + _common_opts(ws))
    ckpt = out / "prompt_learner" / "model.ckpt-0"
    assert ckpt.exists()
    model_dir = tmp_path / "best_model"
    for name in ["best", "ema", "zema", "diff", "diffh", "difft"]:
        (model_dir / name).mkdir(parents=True)
        shutil.copy(ckpt, model_dir / name / "model.ckpt")

    # 3. caption bank precompute from the .pt
    #    (ref generate_caption_text_features.py)
    from leclip_tpu.cli.build_caption_bank import main as bank_main

    bank_path = str(tmp_path / "caption_bank.pkl")
    bank_main([
        "--weights", pt,
        "--caption-root", str(ws / "text_result" / "generated_captions"),
        "--corpora", "tiny",
        "--out", bank_path, "--batch-size", "2",
    ])
    with open(bank_path, "rb") as f:
        bank = np.asarray(pickle.load(f))
    assert bank.shape == (3, DRILL_CFG.embed_dim)

    # 4. the full ensemble eval → impreds.json (ref test.sh + gen_final_ans)
    from leclip_tpu.cli.eval import main as eval_main

    impreds = tmp_path / "impreds.json"
    eval_main([
        "--weights", pt,
        "--model-dir", str(model_dir),
        "--caption-bank", bank_path,
        "--freq-stats", str(ws / "freq_stats.pkl"),
        "--out", str(impreds),
        "--batch-size", "2",
    ] + _common_opts(ws) + ["TEST.multi_scale", "(2,)"])
    preds = json.load(open(impreds))
    assert len(preds) == 3 and len(preds[0]) == 80
    assert np.isfinite(np.asarray(preds)).all()
