"""Data pipeline: corpus loaders, dataset variants, batcher sharding."""

import json
import os

import numpy as np
import pytest

from leclip_tpu.data import corpora
from leclip_tpu.data.datasets import build_dataset
from leclip_tpu.data.labeling import CaptionLabeler
from leclip_tpu.data.loader import CaptionBatcher
from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
from leclip_tpu.engine.config import setup_config
from tests.conftest import REFERENCE_ROOT, requires_reference


@pytest.fixture()
def corpus_root(tmp_path):
    root = tmp_path / "generated_captions"
    root.mkdir()
    (root / "challenge").mkdir()
    # single-label corpus: {class_idx: [numbered lines]}
    single = {
        "16": ["1. A dog is running in the park.", "bad line", "2. 一只狗"],
        "15": ["1. A cat sits on a couch next to a dog."],
    }
    (root / "ChatGLM_single_label_1.json").write_text(json.dumps(single))
    # multi-label corpus: [{id, caption}]
    multi = [
        {"id": 0, "caption": "A person rides a bicycle past a bench."},
        {"id": 1, "caption": "Nothing recognisable here."},
        {"id": 2, "caption": "Two dogs and a frisbee."},
    ]
    (root / "tiny_corpus.json").write_text(json.dumps(multi))
    # challenge corpus
    line = {"labels": ["knife", "spoon"], "captions": ["1. A knife and a spoon."]}
    (root / "challenge" / "c.jsonl").write_text(json.dumps(line) + "\n")
    # category sets
    (root / "category_sets.txt").write_text("dog,cat\nperson,bicycle,bench\nknife\n")
    # few-shot components
    (root / "components_of_few_shot_classes.json").write_text(
        json.dumps({"toaster": ["bread", "kitchen counter"]})
    )
    return str(root)


def idx(name):
    return COCO_OBJECT_CATEGORIES.index(name)


def test_single_label_corpus(corpus_root):
    lab = CaptionLabeler()
    out = corpora.load_single_label_corpus(corpus_root, lab)
    # rule filter: keeps only digit-prefixed, non-Chinese lines
    assert len(out) == 2
    text, labels = out[0]
    assert "1." not in text
    assert labels[idx("dog")] == 1
    # forced class index applies
    cat_line = [o for o in out if o[1][idx("cat")]][0]
    assert cat_line[1][idx("dog")] == 1  # 'dog' appears in the caption too


def test_single_label_restrict(corpus_root):
    lab = CaptionLabeler()
    out = corpora.load_single_label_corpus(corpus_root, lab, restrict_to=[idx("cat")])
    assert len(out) == 1


def test_multi_label_corpus_and_cache(corpus_root):
    lab = CaptionLabeler()
    toks, labels = corpora.load_multi_label_corpus(corpus_root, "tiny_corpus", lab)
    assert toks.shape == (2, 77)  # the unlabeled caption is dropped
    assert labels[0][idx("person")] == 1 and labels[0][idx("bicycle")] == 1
    # cache artifacts written with the reference's names
    assert os.path.exists(os.path.join(corpus_root, "tiny_corpus_labels.pkl"))
    assert os.path.exists(
        os.path.join(corpus_root, "tiny_corpus_all_caption_tokenized.pkl")
    )
    toks2, labels2 = corpora.load_multi_label_corpus(corpus_root, "tiny_corpus", lab)
    np.testing.assert_array_equal(toks, toks2)
    np.testing.assert_array_equal(labels, labels2)


def test_challenge_corpus(corpus_root):
    out = corpora.load_challenge_corpus(os.path.join(corpus_root, "challenge"))
    assert len(out) == 1
    text, labels = out[0]
    assert labels[idx("knife")] == 1 and labels[idx("spoon")] == 1


def test_template_samples_counts():
    samples = corpora.template_samples(COCO_OBJECT_CATEGORIES[:3], add_n2=False)
    # per class: 1 repeated prompt + 80 templates
    assert len(samples) == 3 * 81
    toks, labs = corpora.tokenize_text_samples(samples)
    # repeat=9 for the plain prompt → 9 + 80 rows per class
    assert len(toks) == 3 * 89
    n2 = corpora.template_samples(COCO_OBJECT_CATEGORIES[:3], add_n2=True)
    assert len(n2) == 3 * 81 + 3  # pairs (0,1),(0,2),(1,2)


def test_category_set_samples(corpus_root):
    path = os.path.join(corpus_root, "category_sets.txt")
    out = corpora.category_set_samples(path, sample_m=2, seed=0)
    # 3 full lines + subsets for the 2 unique ≥2-class combos (both len<4 → 1 each)
    assert len(out) == 3 + 2
    restricted = corpora.category_set_samples(path, restrict_to_names=["knife", "spoon"])
    assert len(restricted) == 1  # only the 'knife' line intersects


def test_dataset_mix_end_to_end(corpus_root, tmp_path):
    cfg = setup_config(opts=[
        "DATASET.NAME", "chatglm_caption_mix",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "tiny_corpus",
        "TRAIN.add_few_shot", "True",
    ])
    ds = build_dataset(cfg)
    assert ds.tokens.shape[1] == 77
    assert ds.labels.shape == (len(ds.tokens), 80)
    assert len(ds) > 80 * 89  # templates dominate
    # class-freq artifact dumped
    assert os.path.exists(os.path.join(corpus_root, "tiny_corpus_class_freq.pkl"))
    freq = corpora.load_class_freq(corpus_root, "tiny_corpus")
    assert freq["class_freq"].shape == (80,)
    assert (freq["class_freq"] + freq["neg_class_freq"] == len(ds)).all()


def test_dataset_check_hard_relabeling(corpus_root):
    cfg = setup_config(opts=[
        "DATASET.NAME", "chatglm_caption_check",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "tiny_corpus",
        "TRAIN.hard_data", "hard",
        "TRAIN.challenge_data", "True",
    ])
    ds = build_dataset(cfg)
    hard_idx = corpora.hard_class_indices("hard")
    mask = np.zeros(80, np.int8)
    mask[hard_idx] = 1
    mask[0] = 1  # the unconditional person-pair template block labels class 0
    # every label is within the hard-class set (plus 'person' via pair prompts)
    assert (ds.labels * (1 - mask[None, :])).sum() == 0
    assert len(ds) > 0
    # the person-pair block: for each hard j, 9 pair prompts + 80 templates
    # labeled {0, j} (ref check.py:336-348, the i==0 block)
    person_rows = ds.labels[:, 0] == 1
    assert person_rows.sum() == len(hard_idx) * 89
    # main-corpus hard relabel keeps FIRST-positive-hard captions only
    # (ref check.py:306 `torch.nonzero(gt == 1)[0]`): both tiny_corpus
    # captions lead with non-hard classes (person / dog), so none survive —
    # no surviving row labels a non-hard class other than person.
    assert not (ds.labels[:, idx("bicycle")] == 1).any()
    assert not (ds.labels[:, idx("dog")] == 1).any()


def test_dataset_check_first_positive_corpus_rule(corpus_root):
    # first-positive = LOWEST labeled class index (ref check.py:306
    # `torch.nonzero(gt == 1)[0]`): parking meter (12, hard) < dog (16),
    # so the first caption is kept and relabeled to parking meter alone;
    # dog (16, not hard) < backpack (24), so the second is dropped even
    # though backpack is hard.
    multi = [
        {"id": 0, "caption": "A parking meter next to a dog."},
        {"id": 1, "caption": "A dog with a backpack."},
    ]
    with open(os.path.join(corpus_root, "firstpos.json"), "w") as f:
        json.dump(multi, f)
    cfg = setup_config(opts=[
        "DATASET.NAME", "chatglm_caption_check",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "firstpos",
        "TRAIN.hard_data", "hard",
    ])
    ds = build_dataset(cfg)
    pm, dog, backpack = idx("parking meter"), idx("dog"), idx("backpack")
    assert not (ds.labels[:, dog] == 1).any()
    # exactly one corpus row: lone parking-meter label alongside the 89
    # template rows (9 prompts + 80 templates) that also label it
    lone_pm = (ds.labels[:, pm] == 1) & (ds.labels.sum(axis=1) == 1)
    assert lone_pm.sum() == 89 + 1
    # backpack appears only via its template/pair rows, never a corpus row
    lone_bp = (ds.labels[:, backpack] == 1) & (ds.labels.sum(axis=1) == 1)
    assert lone_bp.sum() == 89


def test_dataset_plain_variant(corpus_root, tmp_path):
    with open(os.path.join(corpus_root, "classdict.json"), "w") as f:
        json.dump({str(i): [f"a photo number {i}."] for i in range(80)}, f)
    cfg = setup_config(opts=[
        "DATASET.NAME", "chatglm_caption",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "classdict",
    ])
    ds = build_dataset(cfg)
    assert len(ds) == 80
    np.testing.assert_array_equal(ds.labels, np.eye(80, dtype=np.int8))
    cfg2 = setup_config(opts=[
        "DATASET.NAME", "chatglm_caption",
        "DATASET.caption_feat_root", os.path.dirname(corpus_root),
        "TRAIN.Caption_name", "classdict",
        "TRAIN.IF_ablation", "True",
    ])
    assert len(build_dataset(cfg2)) == 0


def test_batcher_sharding_and_determinism():
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 100, (103, 77)).astype(np.int32)
    labs = (rng.random((103, 80)) < 0.1).astype(np.int8)
    full = CaptionBatcher(toks, labs, batch_size=16, seed=5)
    b0 = list(full.epoch(0))
    b0_again = list(full.epoch(0))
    b1 = list(full.epoch(1))
    assert len(b0) == 6
    np.testing.assert_array_equal(b0[0]["img"], b0_again[0]["img"])
    assert not np.array_equal(b0[0]["img"], b1[0]["img"])
    assert b0[0]["img"].shape == (16, 77)
    # two shards cover disjoint contiguous halves of the permutation
    s0 = CaptionBatcher(toks, labs, 16, seed=5, shard_index=0, num_shards=2)
    s1 = CaptionBatcher(toks, labs, 16, seed=5, shard_index=1, num_shards=2)
    rows0 = np.concatenate([b["img"] for b in s0.epoch(0)])
    rows1 = np.concatenate([b["img"] for b in s1.epoch(0)])
    set0 = {r.tobytes() for r in rows0}
    set1 = {r.tobytes() for r in rows1}
    assert not (set0 & set1)


@requires_reference
def test_real_reference_corpus_loads():
    """Load a real shipped ChatGLM corpus via the reference's own artifact
    formats."""
    root = f"{REFERENCE_ROOT}/project/output/text_result/generated_captions"
    lab = CaptionLabeler()
    toks, labels = corpora.load_multi_label_corpus(root, "ChatGLM_multi_labels_2k_v2", lab, cache=False)
    assert toks.shape[1] == 77
    assert len(toks) > 1000  # most of the 1556 captions carry a class
    assert labels.sum() >= len(labels)  # every kept caption has ≥1 label
    singles = corpora.load_single_label_corpus(root, lab)
    assert len(singles) > 1000


@requires_reference
def test_reference_corpus_train_smoke(tmp_path):
    """Train a few steps on a REAL shipped ChatGLM corpus end-to-end (dataset
    builder → batcher → train step) — the round-trip the competition recipe
    performs, at tiny-tower scale."""
    import jax

    from leclip_tpu.engine.trainer import CaptionDistillTrainer
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.parallel.mesh import shard_batch

    cfg = setup_config(opts=[
        "DATASET.NAME", "chatglm_caption_zuan",  # no category_sets needed
        "DATASET.caption_feat_root",
        f"{REFERENCE_ROOT}/project/output/text_result",
        "TRAIN.Caption_name", "ChatGLM_multi_labels_2k_v2",
        "OPTIM.MAX_EPOCH", "1",
        "DATALOADER.BATCH_SIZE_TRAIN", "256",
        "TRAINER.N_CTX", "4",
        "OUTPUT_DIR", str(tmp_path),
        "TRAIN.PRINT_FREQ", "1000",
    ])
    tiny = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    import leclip_tpu.data.corpora as corpora

    # avoid writing cache pkls into the read-only reference tree
    orig = corpora.load_multi_label_corpus
    corpora.load_multi_label_corpus = lambda root, name, labeler, cache=True: orig(
        root, name, labeler, cache=False
    )
    try:
        tr = CaptionDistillTrainer(cfg, clip_params, tiny)
    finally:
        corpora.load_multi_label_corpus = orig
    assert len(tr.dataset) > 5000  # singles + corpus + templates
    # (test IMAGES aren't shipped in the reference repo — only captions)
    b = shard_batch(next(tr.batcher.epoch(0)), tr.mesh)
    _, m = tr.train_step(tr.state, b["img"], b["label"])
    assert np.isfinite(float(m["loss"]))
