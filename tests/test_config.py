"""Layered config merge semantics."""

import pathlib

import pytest

from leclip_tpu.engine.config import default_config, setup_config


def test_defaults():
    cfg = default_config()
    assert cfg.TRAINER.N_CTX == 16
    assert cfg.TEST.multi_scale == (2, 3, 4)
    assert cfg.OPTIM.NAME == "sgd"


def test_opts_override_and_types():
    cfg = setup_config(opts=[
        "TRAIN.ema", "True",
        "OPTIM.LR", "0.001",
        "TEST.multi_scale", "(2,3,4,5)",
        "TRAINER.N_CTX", "64",
        "TRAIN.Caption_name", "ChatGLM_multi_labels_2k_v3",
    ])
    assert cfg.TRAIN.ema is True
    assert cfg.OPTIM.LR == 0.001
    assert cfg.TEST.multi_scale == (2, 3, 4, 5)
    assert cfg.TRAINER.N_CTX == 64


def test_yaml_merge(tmp_path):
    y = tmp_path / "t.yaml"
    y.write_text(
        "OPTIM:\n  LR: 1.0e-5\n  MAX_EPOCH: 100\nTRAIN:\n  ema: true\n"
        "DATALOADER:\n  BATCH_SIZE_TRAIN: 512\n"
    )
    cfg = setup_config(trainer_yaml=str(y))
    assert cfg.OPTIM.LR == 1e-5
    assert cfg.OPTIM.MAX_EPOCH == 100
    assert cfg.TRAIN.ema is True
    assert cfg.DATALOADER.BATCH_SIZE_TRAIN == 512


def test_frozen():
    cfg = setup_config()
    with pytest.raises(AttributeError):
        cfg.SEED = 5


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        setup_config(opts=["TRAIN.not_a_key", "1"])


def test_clone_unfreezes():
    cfg = setup_config()
    c2 = cfg.clone()
    c2.SEED = 7
    assert c2.SEED == 7 and cfg.SEED == 1


# --- shipped trainer recipes --------------------------------------------------

_CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / "configs" / "trainers"

# every reference recipe in configs/trainers/Caption_distill_double/ has a
# named counterpart here (the six shipped train_2.sh recipes keep their
# ensemble-member names; the 13 alternates keep the reference file stem)
_REFERENCE_RECIPE_MAP = {
    "rn50-1k-ChatGLM_multi_labels_evidence_best15e": "best",
    "rn50-1k-ChatGLM_multi_labels_ema": "ema",
    "rn50-1k-ChatGLM_multi_labels_zema100e": "zema",
    "rn50-1k-ChatGLM_multi_labels_check_diff_100e": "diff",
    "rn50-1k-ChatGLM_multi_labels_check_diffh_100eEMA": "diffh",
    "rn50-1k-ChatGLM_multi_labels_evidence_check_difft_15e": "difft",
    "rn50": "rn50",
    "rn50-1k-ChatGLM_multi_labels_best15e": "best15e",
    "rn50-1k-ChatGLM_multi_labels_jiawei15e": "jiawei15e",
    "rn50-1k-ChatGLM_multi_labels_mix": "mix",
    "rn50-1k-ChatGLM_multi_labels_zuan100e": "zuan100e",
    "rn50-1k-ChatGLM_multi_labels_check_diffh_100eNoEMA": "check_diffh_100eNoEMA",
    "rn50-1k-ChatGLM_multi_labels_check_difft_20e": "check_difft_20e",
    "rn50-1k-ChatGLM_multi_labels_evidence_check_diff_15e": "evidence_check_diff_15e",
    "rn50-1k-ChatGLM_multi_labels_evidence_check_diffh_100eEMA": "evidence_check_diffh_100eEMA",
    "rn50-1k-ChatGLM_multi_labels_evidence_ema": "evidence_ema",
    "rn50-1k-ChatGLM_multi_labels_evidence_jiawei15e": "evidence_jiawei15e",
    "rn50-1k-ChatGLM_multi_labels_evidence_zema100e": "evidence_zema100e",
    "rn50-1k-ChatGLM_multi_labels_evidence_zuan20e": "evidence_zuan20e",
}


def test_all_shipped_recipes_load():
    import leclip_tpu.data.datasets  # noqa: F401  (populates the registry)
    from leclip_tpu.utils.registry import DATASET_REGISTRY

    yamls = sorted(_CONFIG_DIR.glob("*.yaml"))
    assert len(yamls) >= 19
    for y in yamls:
        cfg = setup_config(trainer_yaml=str(y))
        assert cfg.DATASET.NAME in DATASET_REGISTRY, y.name
        assert cfg.OPTIM.LR > 0 and cfg.OPTIM.MAX_EPOCH > 0, y.name
        assert cfg.TRAIN.LOSSFUNC == "double_ranking", y.name
        # every reference recipe YAML overrides the code default 40 with 50
        # (ref: configs/trainers/Caption_distill_double/*.yaml:32)
        assert cfg.TRAIN.spatial_SCALE_image == 50.0, y.name


def test_reference_recipe_map_complete():
    ours = {y.stem for y in _CONFIG_DIR.glob("*.yaml")}
    missing = set(_REFERENCE_RECIPE_MAP.values()) - ours
    assert not missing, f"reference recipes without a counterpart: {missing}"


def test_resolve_test_precision():
    """TEST.PREC 'auto' → int8 only for ViT towers whose vision width is
    REAL-GEOMETRY gate-validated (quant_gate_realwidth.json: ViT-B's 768
    passed at delta 0.023; ViT-L stays bf16 — its 1024 vision is ungated
    and its 768 text breaches the ±0.2 bound) AND fill the TPU's 128-lane
    int8 tiles AND a TPU backend (interpreted pallas elsewhere); an
    engine-incompatible explicit int8 degrades to bf16 with a warning;
    fp32 stays available for bit-level reference parity."""
    import warnings

    import pytest

    from leclip_tpu.engine.config import resolve_test_precision
    from leclip_tpu.models.clip import PRESETS

    assert resolve_test_precision("auto", PRESETS["ViT-B/16"], backend="tpu") == "int8"
    # r5 policy change: ViT-L auto no longer selects int8 (measured —
    # see docstring); explicit int8 stays available below
    assert resolve_test_precision("auto", PRESETS["ViT-L/14"], backend="tpu") == "bf16"
    assert resolve_test_precision("int8", PRESETS["ViT-L/14"], backend="tpu") == "int8"
    assert resolve_test_precision("auto", PRESETS["RN50"], backend="tpu") == "bf16"
    assert resolve_test_precision("auto", PRESETS["ViT-TEST"], backend="tpu") == "bf16"  # width 64
    # non-TPU backends never auto-select the pallas int8 path
    assert resolve_test_precision("auto", PRESETS["ViT-B/16"], backend="cpu") == "bf16"
    assert resolve_test_precision("auto", PRESETS["ViT-B/16"]) == "bf16"  # test backend is cpu
    for explicit in ("fp32", "bf16"):
        assert resolve_test_precision(explicit, PRESETS["RN50"], backend="tpu") == explicit
    assert resolve_test_precision("int8", PRESETS["ViT-B/16"], backend="tpu") == "int8"
    # explicit int8 the engine would reject degrades instead of crashing later
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert resolve_test_precision("int8", PRESETS["RN50"], backend="tpu") == "bf16"
        assert resolve_test_precision("int8", PRESETS["ViT-B/16"], backend="cpu") == "bf16"
    assert len(caught) == 2
    with pytest.raises(ValueError):
        resolve_test_precision("fp16", PRESETS["RN50"])
