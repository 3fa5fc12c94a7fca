"""Golden: the reference's config stack EXECUTED directly vs ours.

Runs dassl/config/defaults.py + train_caption.py's setup_cfg (ref
train_caption.py:145-166 — yacs defaults → extend_cfg → dataset YAML →
trainer YAML → reset_cfg → CLI opts → freeze) through a faithful mini-yacs
(tests/_refshim.py install_yacs_shim) under the exact train_2.sh /
run_seed*.sh invocations, and asserts our ``setup_config`` produces the same
effective value for every reference key our Config models — for all 19
recipe transcriptions.

This is the config-layer analogue of the dataset/trainer direct-execution
goldens: the advisor's r2 finding (spatial_SCALE_image 40-vs-50) proved
config-merge deviations are real and silent; executing the reference stack
pins ALL of them. First run of this golden found and fixed: diff.yaml LR
0.01 → 1e-5 (a shipped ensemble member trained 1000× hot), TEST batch 256
in zema/diff/diffh, M_CTX default 2 → 4 (the LMPT hinge's token-window
split), early_stop_epoch default 200 (load-bearing
for rn50.yaml's 20000-epoch run), STEPSIZE/WARMUP_TYPE/hard_data/save_name
default drift, and rn50.yaml's Caption_name/CHECKPOINT_FREQ.
"""

import contextlib
import io
import os
from types import SimpleNamespace

import pytest

from leclip_tpu.engine.config import setup_config
from tests._refshim import MY_CODE, load_ref_config_stack
from tests.test_config import _REFERENCE_RECIPE_MAP

REF_TRAINERS = os.path.join(MY_CODE, "configs", "trainers", "Caption_distill_double")
REF_DATASETS = os.path.join(MY_CODE, "configs", "datasets")
OUR_TRAINERS = os.path.join(os.path.dirname(__file__), "..", "configs", "trainers")

# our registry name -> the reference dataset module each recipe is launched
# with (train_2.sh pins the six shipped pairs; alternates follow their stem)
REF_DATASET_FOR_NAME = {
    "chatglm_caption_mix": "pazhou_distill_chatglm_multi_label_mix",
    "chatglm_caption_check": "pazhou_distill_chatglm_multi_label_check",
    "chatglm_caption_zema": "pazhou_distill_chatglm_multi_label_zema",
    "chatglm_caption_zuan": "pazhou_distill_chatglm_multi_label_zuan",
    "chatglm_caption": "pazhou_distill_chatglm",
}

# the six train_2.sh launches: our-name -> (N_CTX arg, seed) (train_2.sh:9-24,
# run_seed0.sh/run_seed1.sh arg plumbing)
SHIPPED_LAUNCH = {
    "best": (16, 0),
    "ema": (64, 1),
    "zema": (16, 1),
    "diffh": (16, 1),
    "diff": (16, 1),
    "difft": (16, 1),
}

# (reference dotted key, our dotted key) — every reference config key our
# Config models. Values must match (after _norm) for all 19 recipes, both
# YAML-effective and under the shipped launcher opts.
KEYMAP = [
    ("SEED", "SEED"),
    ("eval_only", "eval_only"),
    ("INPUT.SIZE", "INPUT.SIZE"),
    ("INPUT.INTERPOLATION", "INPUT.INTERPOLATION"),
    ("INPUT.PIXEL_MEAN", "INPUT.PIXEL_MEAN"),
    ("INPUT.PIXEL_STD", "INPUT.PIXEL_STD"),
    ("INPUT.TRANSFORMS", "INPUT.TRANSFORMS"),
    ("INPUT.TRANSFORMS_TEST", "INPUT.TRANSFORMS_TEST"),
    ("INPUT.random_resized_crop_scale", "INPUT.random_resized_crop_scale"),
    ("INPUT.cutout_proportion", "INPUT.cutout_proba"),
    ("DATASET.dataset_select", "DATASET.dataset_select"),
    ("DATALOADER.TRAIN_X.BATCH_SIZE", "DATALOADER.BATCH_SIZE_TRAIN"),
    ("DATALOADER.TEST.BATCH_SIZE", "DATALOADER.BATCH_SIZE_TEST"),
    ("DATALOADER.NUM_WORKERS", "DATALOADER.NUM_WORKERS"),
    ("MODEL.BACKBONE.NAME", "MODEL.BACKBONE_NAME"),
    ("OPTIM.NAME", "OPTIM.NAME"),
    ("OPTIM.LR", "OPTIM.LR"),
    ("OPTIM.WEIGHT_DECAY", "OPTIM.WEIGHT_DECAY"),
    ("OPTIM.MOMENTUM", "OPTIM.MOMENTUM"),
    ("OPTIM.SGD_DAMPNING", "OPTIM.SGD_DAMPNING"),
    ("OPTIM.SGD_NESTEROV", "OPTIM.SGD_NESTEROV"),
    ("OPTIM.RMSPROP_ALPHA", "OPTIM.RMSPROP_ALPHA"),
    ("OPTIM.ADAM_BETA1", "OPTIM.ADAM_BETA1"),
    ("OPTIM.ADAM_BETA2", "OPTIM.ADAM_BETA2"),
    ("OPTIM.LR_SCHEDULER", "OPTIM.SCHED"),
    ("OPTIM.STEPSIZE", "OPTIM.STEPSIZE"),
    ("OPTIM.GAMMA", "OPTIM.GAMMA"),
    ("OPTIM.MAX_EPOCH", "OPTIM.MAX_EPOCH"),
    ("OPTIM.WARMUP_EPOCH", "OPTIM.WARMUP_EPOCH"),
    ("OPTIM.WARMUP_TYPE", "OPTIM.WARMUP_TYPE"),
    ("OPTIM.WARMUP_CONS_LR", "OPTIM.WARMUP_CONS_LR"),
    ("OPTIM.WARMUP_MIN_LR", "OPTIM.WARMUP_MIN_LR"),
    ("OPTIM.WARMUP_RECOUNT", "OPTIM.WARMUP_RECOUNT"),
    ("TRAINER.NAME", "TRAINER.NAME"),
    ("TRAINER.Caption.N_CTX", "TRAINER.N_CTX"),
    ("TRAINER.Caption.M_CTX", "TRAINER.M_CTX"),
    ("TRAINER.Caption.CSC", "TRAINER.CSC"),
    ("TRAINER.Caption.CTX_INIT", "TRAINER.CTX_INIT"),
    ("TRAINER.Caption.CLASS_TOKEN_POSITION", "TRAINER.CLASS_TOKEN_POSITION"),
    ("TRAINER.Caption.GL_merge_rate", "TRAINER.GL_merge_rate"),
    ("TRAINER.Caption.use_evidence", "TRAINER.use_evidence"),
    ("TRAIN.LOSSFUNC", "TRAIN.LOSSFUNC"),
    ("TRAIN.MODEL", "TRAIN.MODEL"),
    ("TRAIN.Caption_name", "TRAIN.Caption_name"),
    ("TRAIN.ema", "TRAIN.ema"),
    ("TRAIN.momentum", "TRAIN.momentum"),
    ("TRAIN.hard_data", "TRAIN.hard_data"),
    ("TRAIN.challenge_data", "TRAIN.challenge_data"),
    ("TRAIN.add_few_shot", "TRAIN.add_few_shot"),
    ("TRAIN.add_n2", "TRAIN.add_n2"),
    ("TRAIN.IF_ablation", "TRAIN.IF_ablation"),
    ("TRAIN.early_stop_epoch", "TRAIN.early_stop_epoch"),
    ("TRAIN.CHECKPOINT_FREQ", "TRAIN.CHECKPOINT_FREQ"),
    ("TRAIN.PRINT_FREQ", "TRAIN.PRINT_FREQ"),
    ("TRAIN.IF_LEARN_SCALE", "TRAIN.IF_LEARN_SCALE"),
    ("TRAIN.IF_LEARN_spatial_SCALE", "TRAIN.IF_LEARN_spatial_SCALE"),
    ("TRAIN.spatial_SCALE_text", "TRAIN.spatial_SCALE_text"),
    ("TRAIN.spatial_SCALE_image", "TRAIN.spatial_SCALE_image"),
    ("TEST.EVALUATOR", "TEST.EVALUATOR"),
    ("TEST.EVALUATOR_ACT", "TEST.EVALUATOR_ACT"),
    ("TEST.NO_TEST", "TEST.NO_TEST"),
    ("TEST.SPLIT", "TEST.SPLIT"),
    ("TEST.FINAL_MODEL", "TEST.FINAL_MODEL"),
    ("TEST.use_freq", "TEST.use_freq"),
    ("TEST.save_pth", "TEST.save_pth"),
    ("TEST.save_name", "TEST.save_name"),
    ("TEST.multi_model", "TEST.multi_model"),
]

# Documented intentional deviations, pinned BOTH-sided: pass iff
# (ref value, our value) equals the pinned (ref default, our value) pair —
# any drift on either side fails. Keyed by reference dotted key.
DEVIATIONS = {
    # run_eval.sh always overrides multi_scale to "(2,3,4)" (run_eval.sh:37);
    # our default matches the launcher-effective eval value rather than the
    # never-used extend_cfg default [2,3,4,5] (train_caption.py:132). Recipes
    # never set it, so the pinned pair below is the only combination.
    "TEST.multi_scale": ([2, 3, 4, 5], (2, 3, 4)),
    # the reference default is "" because its launchers always pass --trainer
    # Caption_distill_double (run_seed1.sh:6,29); ours defaults to that value.
    # Launcher-effective runs match exactly (reset_cfg sets it).
    "TRAINER.NAME": ("", "Caption_distill_double"),
}


def _norm(v):
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def _get(cfg, dotted):
    node = cfg
    for part in dotted.split("."):
        node = node[part] if isinstance(node, dict) else getattr(node, part)
    return node


@pytest.fixture(scope="module")
def ref_stack():
    return load_ref_config_stack()


def _ref_effective(ref_stack, dataset_stem, trainer_stem, opts, seed):
    args = SimpleNamespace(
        root="/workspace/", output_dir="./train_output/x", resume="",
        seed=seed, source_domains=None, target_domains=None, transforms=None,
        trainer="Caption_distill_double", backbone="", head="",
        eval_only=False,
        dataset_config_file=os.path.join(REF_DATASETS, dataset_stem + ".yaml"),
        config_file=os.path.join(REF_TRAINERS, trainer_stem + ".yaml"),
        opts=opts,
    )
    with contextlib.redirect_stdout(io.StringIO()):
        return ref_stack["setup_cfg"](args)


def _compare(ref_cfg, our_cfg, recipe):
    errors = []
    for rk, ok in KEYMAP:
        rv, ov = _get(ref_cfg, rk), _get(our_cfg, ok)
        if rk in DEVIATIONS:
            pin_ref, pin_ours = DEVIATIONS[rk]
            if _norm(rv) == _norm(pin_ref) and _norm(ov) == _norm(pin_ours):
                continue
        if _norm(rv) != _norm(ov):
            errors.append(f"{recipe}: {rk}={rv!r} but {ok}={ov!r}")
    assert not errors, "\n".join(errors)


def _our_recipes():
    # invert the name map from test_config (ref stem -> our stem)
    return {ours: ref for ref, ours in _REFERENCE_RECIPE_MAP.items()}


def _ref_dataset_stem(our_yaml):
    import yaml

    with open(our_yaml) as f:
        name = yaml.safe_load(f)["DATASET"]["NAME"]
    return REF_DATASET_FOR_NAME[name]


@pytest.mark.parametrize("name", sorted(SHIPPED_LAUNCH))
def test_shipped_launch_effective_config(ref_stack, name):
    """The six train_2.sh launches, with the run_seed*.sh CLI opts ON
    (TRAINER.Caption.N_CTX/CSC/CLASS_TOKEN_POSITION, dataset_select B,
    caption_feat_root — run_seed1.sh:25-40), vs our train_all.sh
    equivalent (recipe YAML + DATASET.dataset_select B)."""
    nctx, seed = SHIPPED_LAUNCH[name]
    ref_yaml = _our_recipes()[name]
    our_yaml = os.path.join(OUR_TRAINERS, name + ".yaml")
    opts = [
        "TRAINER.Caption.N_CTX", str(nctx),
        "TRAINER.Caption.CSC", "False",
        "TRAINER.Caption.CLASS_TOKEN_POSITION", "end",
        "DATASET.dataset_select", "B",
        "DATASET.caption_feat_root", "../output/text_result/",
    ]
    ref_cfg = _ref_effective(ref_stack, _ref_dataset_stem(our_yaml), ref_yaml, opts, seed)
    our_cfg = setup_config(
        trainer_yaml=our_yaml, opts=["DATASET.dataset_select", "B"], SEED=seed
    )
    _compare(ref_cfg, our_cfg, name)
    # the launcher opts must actually have landed on both sides
    assert ref_cfg.TRAINER.Caption.N_CTX == nctx == our_cfg.TRAINER.N_CTX


@pytest.mark.parametrize(
    "name", sorted(set(_our_recipes()) - set(SHIPPED_LAUNCH))
)
def test_yaml_effective_config(ref_stack, name):
    """The 13 alternate recipes, YAML-effective (no CLI opts on either side):
    defaults → dataset YAML → trainer YAML only. Pins every transcription
    against the reference's executed merge. (The shipped six are excluded
    here — their transcriptions deliberately bake the run_seed*.sh CLI args
    into the YAML, e.g. ema's N_CTX 64, and are covered launcher-effective by
    test_shipped_launch_effective_config.)"""
    ref_yaml = _our_recipes()[name]
    our_yaml = os.path.join(OUR_TRAINERS, name + ".yaml")
    ref_cfg = _ref_effective(ref_stack, _ref_dataset_stem(our_yaml), ref_yaml, [], seed=1)
    our_cfg = setup_config(trainer_yaml=our_yaml, SEED=1)
    _compare(ref_cfg, our_cfg, name)


def test_merge_semantics_parity(ref_stack, tmp_path):
    """yacs-vs-ours merge mechanics on the behaviours the recipes rely on:
    literal_eval decoding of YAML strings ('1e-5' → float, '(224, 224)' →
    tuple), list→tuple coercion against a tuple default, and KeyError on
    non-existent keys from both files and opts."""
    y = tmp_path / "t.yaml"
    y.write_text(
        "OPTIM:\n  LR: 1e-5\n  WARMUP_CONS_LR: '1e-3'\n"
        "INPUT:\n  SIZE: (192, 192)\n  TRANSFORMS: ['normalize']\n"
    )
    ref = ref_stack["get_cfg_default"]()
    ref_stack["extend_cfg"](ref)
    ref.merge_from_file(str(y))
    ours = setup_config(trainer_yaml=str(y))
    assert ref.OPTIM.LR == ours.OPTIM.LR == 1e-5
    assert ref.OPTIM.WARMUP_CONS_LR == ours.OPTIM.WARMUP_CONS_LR == 1e-3
    assert tuple(ref.INPUT.SIZE) == ours.INPUT.SIZE == (192, 192)
    # both coerce the YAML list onto the tuple-typed default
    assert isinstance(ref.INPUT.TRANSFORMS, tuple)
    assert tuple(ref.INPUT.TRANSFORMS) == ours.INPUT.TRANSFORMS == ("normalize",)

    bad = tmp_path / "bad.yaml"
    bad.write_text("OPTIM:\n  NOT_A_KEY: 1\n")
    ref2 = ref_stack["get_cfg_default"]()
    ref_stack["extend_cfg"](ref2)
    with pytest.raises(KeyError):
        ref2.merge_from_file(str(bad))
    with pytest.raises(KeyError):
        setup_config(trainer_yaml=str(bad))
    with pytest.raises(AssertionError):
        ref2.merge_from_list(["OPTIM.NOT_A_KEY", "1"])
    with pytest.raises(KeyError):
        setup_config(opts=["OPTIM.NOT_A_KEY", "1"])

    # opts decoding: numbers and quoted strings, exactly as run_seed1.sh
    # passes them after shell quoting
    ref3 = ref_stack["get_cfg_default"]()
    ref_stack["extend_cfg"](ref3)
    ref3.merge_from_list(["OPTIM.LR", "1e-4", "DATASET.dataset_select", "B"])
    ours3 = setup_config(opts=["OPTIM.LR", "1e-4", "DATASET.dataset_select", "B"])
    assert ref3.OPTIM.LR == ours3.OPTIM.LR == 1e-4
    assert ref3.DATASET.dataset_select == ours3.DATASET.dataset_select == "B"


def test_freeze_parity(ref_stack):
    ref = ref_stack["get_cfg_default"]()
    ref_stack["extend_cfg"](ref)
    ref.freeze()
    with pytest.raises(AttributeError):
        ref.SEED = 5
    ours = setup_config()
    with pytest.raises(AttributeError):
        ours.SEED = 5
