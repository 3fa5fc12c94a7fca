"""Layered config merge semantics."""

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
