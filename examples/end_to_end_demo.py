"""End-to-end miniature walkthrough of the full framework — the train_1.sh →
train_2.sh → test.sh flow at toy scale with synthetic data, runnable on CPU
in ~2 minutes:

  1. generate a caption corpus with a scripted fake LLM (stands in for
     ChatGLM; plug `gen_captions.chatglm_chat()` when weights are available)
  2. build the dataset (labeling, template synthesis, category sets)
  3. prompt-tune a DenseCLIP model (texts-as-images, data-parallel mesh)
  4. build a caption feature bank
  5. run the full multi-scale TTA ensemble inference → impreds.json

Usage: python examples/end_to_end_demo.py [workdir]
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np


def main(workdir="./demo_workspace"):
    shutil.rmtree(workdir, ignore_errors=True)
    croot = os.path.join(workdir, "text_result", "generated_captions")
    os.makedirs(croot)
    droot = os.path.join(workdir, "data", "official_a")
    os.makedirs(os.path.join(droot, "images"))

    # ---- 1. caption generation (L6) with a scripted LLM -----------------
    from leclip_tpu.data import gen_captions as G
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES

    def fake_chat(prompt):
        if "MUST contain" in prompt:
            cat = prompt.split("MUST contain a ")[1].split(".")[0]
            return ". ".join(f"{i+1}. A {cat} in scene {i}" for i in range(5))
        return "1. A dog chasing a cat. 2. A person with a pizza."

    G.generate_single_label_corpus(fake_chat, COCO_OBJECT_CATEGORIES, loops=1,
                                   out_dir=croot)
    for i in range(2, 6):  # data layer expects 5 single-label files
        shutil.copy(os.path.join(croot, "ChatGLM_single_label_1.json"),
                    os.path.join(croot, f"ChatGLM_single_label_{i}.json"))
    kept = G.filter_captions([fake_chat("anything")])
    with open(os.path.join(croot, "demo_corpus.json"), "w") as f:
        json.dump([{"id": k["id"], "caption": k["caption"]} for k in kept], f)
    with open(os.path.join(croot, "category_sets.txt"), "w") as f:
        f.write("dog,cat\nperson,pizza\n")

    # ---- synthetic test images + class list ------------------------------
    from PIL import Image

    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        arr = rng.integers(0, 255, (96 + 8 * i, 128, 3)).astype(np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(os.path.join(droot, "images", name))
        names.append(name)
    with open(os.path.join(droot, "imnames_finalA.json"), "w") as f:
        json.dump(names, f)
    with open(os.path.join(droot, "classes.txt"), "w") as f:
        f.write("\n".join(COCO_OBJECT_CATEGORIES))

    # ---- 2+3. dataset + prompt tuning ------------------------------------
    from leclip_tpu.cli.train import main as train_main

    opts = [
        "DATASET.ROOT", os.path.join(workdir, "data"),
        "DATASET.caption_feat_root", os.path.join(workdir, "text_result"),
        "DATASET.NAME", "chatglm_caption_mix",
        "TRAIN.Caption_name", "demo_corpus",
        "OPTIM.MAX_EPOCH", "1",
        "OPTIM.LR", "0.02", "OPTIM.WARMUP_EPOCH", "-1",
        "DATALOADER.BATCH_SIZE_TRAIN", "1024",
        "TRAINER.N_CTX", "4",
        "TRAIN.PRINT_FREQ", "2",
    ]
    out = os.path.join(workdir, "run")
    train_main(["--output-dir", out, "--backbone", "RN-TEST", "--seed", "0"] + opts)

    # stage the checkpoint as all six ensemble members
    model_dir = os.path.join(workdir, "best_model")
    for name in ["best", "ema", "zema", "diff", "diffh", "difft"]:
        os.makedirs(os.path.join(model_dir, name))
        shutil.copy(os.path.join(out, "prompt_learner", "model.ckpt-0"),
                    os.path.join(model_dir, name, "model.ckpt"))

    # ---- 4. caption feature bank -----------------------------------------
    import pickle

    from leclip_tpu.data.corpora import load_multi_label_corpus
    from leclip_tpu.data.labeling import CaptionLabeler
    from leclip_tpu.inference.pipeline import build_caption_bank
    from leclip_tpu.models.clip import PRESETS, init_clip_params

    clip_cfg = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    toks, _ = load_multi_label_corpus(croot, "demo_corpus", CaptionLabeler())
    bank = build_caption_bank(clip_params, clip_cfg, toks, batch_size=8)
    bank_path = os.path.join(workdir, "caption_bank.pkl")
    with open(bank_path, "wb") as f:
        pickle.dump(bank, f)
    print(f"caption bank: {bank.shape}")

    # ---- 5. full ensemble TTA inference ----------------------------------
    from leclip_tpu.cli.eval import main as eval_main

    impreds = os.path.join(workdir, "impreds.json")
    eval_main([
        "--backbone", "RN-TEST",
        "--model-dir", model_dir,
        "--caption-bank", bank_path,
        "--out", impreds,
        "--batch-size", "2",
    ] + opts + ["TEST.multi_scale", "(2,)"])

    preds = np.asarray(json.load(open(impreds)))
    print(f"impreds.json: {preds.shape}, finite={np.isfinite(preds).all()}")
    print("top-3 classes for image 0:",
          [COCO_OBJECT_CATEGORIES[i] for i in preds[0].argsort()[-3:]])


if __name__ == "__main__":
    main(*sys.argv[1:])
