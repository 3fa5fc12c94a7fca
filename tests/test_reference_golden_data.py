"""Direct-execution goldens for the dataset builders: the reference's own
``datasets/pazhou_distill_chatglm*.py`` modules are imported and EXECUTED
(via tests/_refshim.py) on a synthetic corpus environment, and their train
splits / cache artifacts / test splits are compared against our builders.

The one shimmed layer is nltk (this image has no nltk corpora): both sides
share the same deterministic rule lemmatizer, so these tests pin everything
EXCEPT linguistics — synonym matching loops, the single-label filters and
forced class index, the pickle caching contract, template/pair synthesis,
category-set handling, the check curriculum's first-positive-hard relabel
and person-pair block, item ORDER, and the class-freq artifact.

Blocks whose order the reference draws from Python set iteration (the mix
random-subset tail, set-intersection joins) are compared as multisets; every
other block is compared element-wise.

Ref anchors: mix.py:70-366, check.py:78-428, zema.py, zuan.py,
pazhou_distill_chatglm.py.
"""

import json
import os
import pickle
import random
import types
from os.path import join

import numpy as np
import pytest

from leclip_tpu.data import corpora
from leclip_tpu.data.datasets import build_dataset
from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
from leclip_tpu.engine.config import setup_config
from tests._refshim import import_ref_dataset
from tests.conftest import requires_reference

pytestmark = requires_reference


# ---------------------------------------------------------------------------
# synthetic corpus environment
# ---------------------------------------------------------------------------

SINGLE_1 = {
    # dog class: valid lines + every filter branch
    "16": [
        "1. Two dogs are chasing a frisbee in the park.",
        "2. A dog sleeps near a parking meter.",
        "bad line without a number prefix",
        "3. 一只狗在公园里。",          # Chinese → dropped
        "4.",                            # len ≤ 5 → dropped
        "5. " + "very " * 40 + "long caption about a dog.",  # ≥150 chars → dropped
    ],
    # parking meter (hard class): compound synonym + plural forms
    "12": [
        "1. Parking meters line the street next to parked cars.",
        "2. A man feeds coins into a parking meter.",
    ],
}
SINGLE_3 = {
    # skis via verb form; person via plural 'people'
    "30": ["1. People skiing down a slope with red skis."],
}
MULTI = [
    {"id": 7, "caption": "A person rides a bicycle past two benches."},
    {"id": 3, "caption": "Nothing recognisable in this sentence."},
    {"id": 11, "caption": "A hot dog and a pizza on a dining table."},
    {"id": 5, "caption": "A parking meter beside a dog."},
    {"id": 9, "caption": "Knives and spoons in a drawer."},
]
FEW_SHOT = {"toaster": ["bread", "kitchen counter"], "hair drier": ["mirror"]}
# ≤1 hard-class name per line so the check variant's set-intersection join
# order is deterministic (see module docstring)
CATEGORY_SETS = [
    "dog,cat",
    "person,bicycle,bench,car,truck",
    "knife",
    "dog,cat",                      # duplicate full line
    "person,person,bicycle",        # in-line duplicate name
    "spoon,bowl,cup,apple,banana",
]
CHALLENGE = [
    {"labels": ["knife", "spoon"], "captions": [
        "1. A knife and a spoon on a table.",
        "unnumbered caption",
        "2. 刀和勺子。",
    ]},
    {"labels": ["toaster"], "captions": ["1. A toaster on the counter."]},
]


def _write_env(base):
    droot = base / "data_root"
    official = droot / "official_a"
    official.mkdir(parents=True)
    (official / "classes.txt").write_text("\n".join(COCO_OBJECT_CATEGORIES) + "\n")
    imnames = [f"img_{i:04d}.jpg" for i in range(203)]
    (official / "imnames_finalA.json").write_text(json.dumps(imnames))
    (official / "imnames_A.json").write_text(json.dumps(imnames[:101]))

    croot = base / "cap_root"
    gen = croot / "generated_captions"
    (gen / "challenge").mkdir(parents=True)
    (gen / "ChatGLM_single_label_1.json").write_text(json.dumps(SINGLE_1))
    (gen / "ChatGLM_single_label_2.json").write_text(json.dumps({}))
    (gen / "ChatGLM_single_label_3.json").write_text(json.dumps(SINGLE_3))
    (gen / "ChatGLM_single_label_4.json").write_text(json.dumps({}))
    (gen / "ChatGLM_single_label_5.json").write_text(json.dumps({}))
    (gen / "TestCorp.json").write_text(json.dumps(MULTI))
    (gen / "components_of_few_shot_classes.json").write_text(json.dumps(FEW_SHOT))
    (gen / "category_sets.txt").write_text("\n".join(CATEGORY_SETS) + "\n")
    (gen / "challenge" / "c.jsonl").write_text(
        "\n".join(json.dumps(l) for l in CHALLENGE) + "\n")
    return droot, croot


@pytest.fixture()
def env(tmp_path):
    # two identical trees so reference and ours never share cache artifacts
    ref = _write_env(tmp_path / "ref")
    ours = _write_env(tmp_path / "ours")
    return {"ref": ref, "ours": ours}


def _ref_cfg(droot, croot, **train):
    t = dict(Caption_name="TestCorp", add_n2=True, add_few_shot=False,
             hard_data="", challenge_data=False, IF_ablation=False)
    t.update(train)
    return types.SimpleNamespace(
        DATASET=types.SimpleNamespace(ROOT=str(droot), dataset_select="A",
                                      caption_feat_root=str(croot)),
        TRAIN=types.SimpleNamespace(**t),
    )


def _our_cfg(droot, croot, **train):
    opts = ["DATASET.ROOT", str(droot),
            "DATASET.caption_feat_root", str(croot),
            "TRAIN.Caption_name", "TestCorp"]
    for k, v in train.items():
        opts += [f"TRAIN.{k}", str(v)]
    return opts


def _ref_train_arrays(ds):
    toks = np.stack([np.asarray(t) for t, _ in ds.train_x]).astype(np.int64)
    labs = np.stack([np.asarray(l) for _, l in ds.train_x]).astype(np.int64)
    return toks, labs


def _assert_rows_equal(ref_toks, ref_labs, toks, labs):
    np.testing.assert_array_equal(ref_toks, toks.astype(np.int64))
    np.testing.assert_array_equal(ref_labs, labs.astype(np.int64))


def _as_multiset(toks, labs):
    return sorted((t.tobytes(), l.tobytes())
                  for t, l in zip(toks.astype(np.int64), labs.astype(np.int64)))


# ---------------------------------------------------------------------------
# mix
# ---------------------------------------------------------------------------

def _mix_sampled_tail_count(lines, sample_m=5):
    combos = {tuple(sorted(set(l.split(",")))) for l in lines}
    combos = [c for c in combos if len(c) > 1]
    return sum(1 if len(c) < 4 else sample_m for c in combos)


def test_mix_matches_reference_execution(env):
    ref_droot, ref_croot = env["ref"]
    our_droot, our_croot = env["ours"]
    mod = import_ref_dataset("pazhou_distill_chatglm_multi_label_mix")
    random.seed(0)
    ref_ds = mod.pazhou_distill_chatglm_multi_label_mix(
        _ref_cfg(ref_droot, ref_croot, add_few_shot=True))
    cfg = setup_config(opts=_our_cfg(our_droot, our_croot, add_few_shot=True)
                       + ["DATASET.NAME", "chatglm_caption_mix"])
    ds = build_dataset(cfg)

    ref_toks, ref_labs = _ref_train_arrays(ref_ds)
    assert len(ref_toks) == len(ds.tokens)

    # everything before the random-subset tail is order-exact
    tail = _mix_sampled_tail_count(CATEGORY_SETS)
    n_det = len(ref_toks) - tail
    _assert_rows_equal(ref_toks[:n_det], ref_labs[:n_det],
                       ds.tokens[:n_det], ds.labels[:n_det])
    # the sampled tail: labels are always the FULL combo (mix.py:346-348), so
    # the label multiset is deterministic even though the subsets are random
    assert sorted(map(bytes, ref_labs[n_det:].astype(np.int8))) == \
        sorted(map(bytes, ds.labels[n_det:].astype(np.int8)))

    # test/val split contract
    assert len(ref_ds.test) == len(ds.test_images)
    assert [d.impath for d in ref_ds.test] == [
        p.replace(str(our_droot), str(ref_droot)) for p in ds.test_images]
    assert [d.impath for d in ref_ds.val] == [
        p.replace(str(our_droot), str(ref_droot)) for p in ds.val_images]

    # cache artifacts: the reference's labels pkl (written by its own code on
    # this cache-miss run) must equal ours, key order included
    with open(join(str(ref_croot), "generated_captions", "TestCorp_labels.pkl"), "rb") as f:
        ref_word_based = pickle.load(f)
    with open(join(str(our_croot), "generated_captions", "TestCorp_labels.pkl"), "rb") as f:
        our_word_based = pickle.load(f)
    assert list(ref_word_based.keys()) == list(our_word_based.keys())
    assert {k: list(v) for k, v in ref_word_based.items()} == \
        {k: list(map(int, v)) for k, v in our_word_based.items()}

    # class-freq artifact (deterministic despite sampling — full-combo labels)
    with open(join(str(ref_croot), "generated_captions", "TestCorp_class_freq.pkl"), "rb") as f:
        ref_freq = pickle.load(f)
    our_freq = corpora.load_class_freq(
        join(str(our_croot), "generated_captions"), "TestCorp")
    np.testing.assert_array_equal(ref_freq["class_freq"], our_freq["class_freq"])
    np.testing.assert_array_equal(ref_freq["neg_class_freq"], our_freq["neg_class_freq"])


def test_mix_consumes_reference_cache_artifacts(env):
    """Our loader must consume cache pkls WRITTEN BY THE REFERENCE (and skip
    relabeling entirely), producing the identical corpus block."""
    ref_droot, ref_croot = env["ref"]
    mod = import_ref_dataset("pazhou_distill_chatglm_multi_label_mix")
    random.seed(0)
    ref_ds = mod.pazhou_distill_chatglm_multi_label_mix(
        _ref_cfg(ref_droot, ref_croot))
    # point OUR builder at the reference's tree (its caches now exist)
    cfg = setup_config(opts=_our_cfg(ref_droot, ref_croot)
                       + ["DATASET.NAME", "chatglm_caption_mix"])
    ds = build_dataset(cfg)
    ref_toks, ref_labs = _ref_train_arrays(ref_ds)
    tail = _mix_sampled_tail_count(CATEGORY_SETS)
    n_det = len(ref_toks) - tail
    assert len(ref_toks) == len(ds.tokens)
    _assert_rows_equal(ref_toks[:n_det], ref_labs[:n_det],
                       ds.tokens[:n_det], ds.labels[:n_det])


# ---------------------------------------------------------------------------
# check (diff/diffh/difft curricula)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hard_data", ["hard", "total"])
def test_check_matches_reference_execution(env, hard_data):
    ref_droot, ref_croot = env["ref"]
    our_droot, our_croot = env["ours"]
    mod = import_ref_dataset("pazhou_distill_chatglm_multi_label_check")
    ref_ds = mod.pazhou_distill_chatglm_multi_label_check(
        _ref_cfg(ref_droot, ref_croot, hard_data=hard_data, challenge_data=True))
    cfg = setup_config(opts=_our_cfg(our_droot, our_croot, hard_data=hard_data,
                                     challenge_data="True")
                       + ["DATASET.NAME", "chatglm_caption_check"])
    ds = build_dataset(cfg)

    ref_toks, ref_labs = _ref_train_arrays(ref_ds)
    assert len(ref_toks) == len(ds.tokens)
    # category_sets lines were crafted with ≤1 hard name each, so even the
    # set-intersection block is order-exact → compare the WHOLE split
    _assert_rows_equal(ref_toks, ref_labs, ds.tokens, ds.labels)


# ---------------------------------------------------------------------------
# zema / zuan / plain — fully deterministic, whole-split order-exact
# ---------------------------------------------------------------------------

def test_zema_matches_reference_execution(env):
    ref_droot, ref_croot = env["ref"]
    our_droot, our_croot = env["ours"]
    mod = import_ref_dataset("pazhou_distill_chatglm_multi_label_zema")
    ref_ds = mod.pazhou_distill_chatglm_multi_label_zema(
        _ref_cfg(ref_droot, ref_croot))
    cfg = setup_config(opts=_our_cfg(our_droot, our_croot)
                       + ["DATASET.NAME", "chatglm_caption_zema"])
    ds = build_dataset(cfg)
    ref_toks, ref_labs = _ref_train_arrays(ref_ds)
    assert len(ref_toks) == len(ds.tokens)
    _assert_rows_equal(ref_toks, ref_labs, ds.tokens, ds.labels)
    # zema reads imnames_A.json under dataset_A/ (zema.py:85-92)
    assert [d.impath for d in ref_ds.test] == [
        p.replace(str(our_droot), str(ref_droot)) for p in ds.test_images]
    assert "dataset_A" in ds.test_images[0]


def test_zuan_matches_reference_execution(env):
    ref_droot, ref_croot = env["ref"]
    our_droot, our_croot = env["ours"]
    mod = import_ref_dataset("pazhou_distill_chatglm_multi_label_zuan")
    ref_ds = mod.pazhou_distill_chatglm_multi_label_zuan(
        _ref_cfg(ref_droot, ref_croot))
    cfg = setup_config(opts=_our_cfg(our_droot, our_croot)
                       + ["DATASET.NAME", "chatglm_caption_zuan"])
    ds = build_dataset(cfg)
    ref_toks, ref_labs = _ref_train_arrays(ref_ds)
    assert len(ref_toks) == len(ds.tokens)
    _assert_rows_equal(ref_toks, ref_labs, ds.tokens, ds.labels)


def test_plain_matches_reference_execution(env, monkeypatch):
    ref_droot, ref_croot = env["ref"]
    our_droot, our_croot = env["ours"]
    # plain hard-codes A_datasets/ + imnames_A.json (ref :22-33)
    for droot in (ref_droot, our_droot):
        a = droot / "A_datasets"
        a.mkdir()
        (a / "classes.txt").write_text("\n".join(COCO_OBJECT_CATEGORIES) + "\n")
        (a / "imnames_A.json").write_text(json.dumps(["x.jpg", "y.jpg"]))
    corpus = {str(i): [f"1. a photo about class {i}.",
                       f"2. another class {i} sentence."] for i in range(80)}
    for croot in (ref_croot, our_croot):
        (croot / "generated_captions" / "PlainCorp.json").write_text(
            json.dumps(corpus))

    mod = import_ref_dataset("pazhou_distill_chatglm")
    # the reference resolves its corpus from os.getcwd()
    monkeypatch.chdir(ref_croot)
    ref_ds = mod.pazhou_distill_chatglm(
        _ref_cfg(ref_droot, ref_croot, Caption_name="PlainCorp"))
    cfg = setup_config(opts=["DATASET.ROOT", str(our_droot),
                             "DATASET.caption_feat_root", str(our_croot),
                             "TRAIN.Caption_name", "PlainCorp",
                             "DATASET.NAME", "chatglm_caption"])
    ds = build_dataset(cfg)
    ref_toks, ref_labs = _ref_train_arrays(ref_ds)
    assert len(ref_toks) == len(ds.tokens) == 160
    _assert_rows_equal(ref_toks, ref_labs, ds.tokens, ds.labels)
    assert [d.impath for d in ref_ds.test] == [
        p.replace(str(our_droot), str(ref_droot)) for p in ds.test_images]

    # IF_ablation empties the train split (ref :66)
    ref_ds2 = mod.pazhou_distill_chatglm(
        _ref_cfg(ref_droot, ref_croot, Caption_name="PlainCorp", IF_ablation=True))
    cfg2 = setup_config(opts=["DATASET.ROOT", str(our_droot),
                              "DATASET.caption_feat_root", str(our_croot),
                              "TRAIN.Caption_name", "PlainCorp",
                              "TRAIN.IF_ablation", "True",
                              "DATASET.NAME", "chatglm_caption"])
    assert len(ref_ds2.train_x) == len(build_dataset(cfg2)) == 0

