"""LR-schedule variants, metrics writer, model zoo surface, zero-shot path,
bf16 precision mode."""

import json
import os

import jax
import numpy as np
import pytest

from leclip_tpu.engine.config import setup_config
from leclip_tpu.engine.metrics import MetricsWriter, collect_env_info
from leclip_tpu.engine.train_state import epoch_lr_schedule


def test_multi_step_schedule():
    cfg = setup_config(opts=[
        "OPTIM.SCHED", "multi_step", "OPTIM.STEPSIZE", "(2,4)",
        "OPTIM.GAMMA", "0.1", "OPTIM.LR", "1.0", "OPTIM.MAX_EPOCH", "6",
        "OPTIM.WARMUP_EPOCH", "-1",
    ])
    lr = epoch_lr_schedule(cfg.OPTIM, steps_per_epoch=2)
    assert float(lr(0)) == pytest.approx(1.0)
    assert float(lr(4)) == pytest.approx(0.1)   # epoch 2
    assert float(lr(9)) == pytest.approx(0.01)  # epoch 4


def test_single_step_and_linear_warmup():
    cfg = setup_config(opts=[
        "OPTIM.SCHED", "single_step", "OPTIM.STEPSIZE", "(3,)",
        "OPTIM.LR", "1.0", "OPTIM.MAX_EPOCH", "6",
        "OPTIM.WARMUP_EPOCH", "2", "OPTIM.WARMUP_TYPE", "linear",
        "OPTIM.WARMUP_MIN_LR", "0.0",
    ])
    lr = epoch_lr_schedule(cfg.OPTIM, steps_per_epoch=1)
    assert float(lr(0)) == pytest.approx(0.0)
    assert float(lr(1)) == pytest.approx(0.5)
    assert float(lr(2)) == pytest.approx(1.0)
    # WARMUP_RECOUNT (dassl default True) restarts the annealer after warmup,
    # so the StepLR drop lands at global epoch W+stepsize=5, not 3 —
    # golden-verified vs the executed dassl scheduler in
    # tests/test_reference_golden.py
    assert float(lr(4)) == pytest.approx(1.0)
    assert float(lr(5)) == pytest.approx(0.1)


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write_scalars({"loss": 1.5, "lr": 0.01}, step=3, prefix="train/")
    w.flush()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert {l["tag"] for l in lines} == {"train/loss", "train/lr"}
    assert all(l["step"] == 3 for l in lines)
    w.close()
    assert "jax" in collect_env_info()


def test_model_zoo_surface():
    from leclip_tpu.models.zoo import MODEL_URLS, available_models, load

    assert "RN50" in available_models and "ViT-B/16" in available_models
    for name, url in MODEL_URLS.items():
        assert url.startswith("https://openaipublic")
    with pytest.raises(FileNotFoundError):
        load("NotAModel")


def test_zero_shot_scoring_path():
    import jax.numpy as jnp

    from leclip_tpu.cli.zeroshot import zero_shot_scores, zero_shot_text_features
    from leclip_tpu.models.clip import PRESETS, init_clip_params

    cfg = PRESETS["RN-TEST"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tf = zero_shot_text_features(params, cfg, ["dog", "cat", "pizza"])
    assert tf.shape == (3, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(tf, axis=-1), 1.0, rtol=1e-5)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    scores = zero_shot_scores(params, cfg, imgs, tf)
    assert scores.shape == (2, 3)
    assert np.isfinite(scores).all()


def test_bf16_precision_trainer(tmp_path):
    import jax.numpy as jnp

    from leclip_tpu.data.datasets import CaptionDataset
    from leclip_tpu.data.tokenizer import tokenize
    from leclip_tpu.engine.trainer import CaptionDistillTrainer
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.parallel.mesh import shard_batch

    tiny = PRESETS["RN-TEST"]
    ds = CaptionDataset(
        tokenize(["a photo of a dog."] * 16),
        np.tile(np.eye(4, dtype=np.int8)[0], (16, 1)),
        [], ["dog", "cat", "person", "pizza"],
    )
    cfg = setup_config(opts=[
        "TRAINER.PREC", "bf16", "TRAINER.N_CTX", "4",
        "DATALOADER.BATCH_SIZE_TRAIN", "8", "OPTIM.MAX_EPOCH", "1",
        "OUTPUT_DIR", str(tmp_path),
    ])
    tr = CaptionDistillTrainer(cfg, init_clip_params(jax.random.PRNGKey(0), tiny), tiny, dataset=ds)
    assert tr.clip_params["text"]["token_embedding"].dtype == jnp.bfloat16
    assert tr.state.params["ctx"].dtype == jnp.float32
    b = shard_batch(next(tr.batcher.epoch(0)), tr.mesh)
    _, m = tr.train_step(tr.state, b["img"], b["label"])
    assert np.isfinite(float(m["loss"]))


def test_parse_results_cli(tmp_path, capsys):
    from leclip_tpu.cli.parse_results import main, summarize
    from leclip_tpu.engine.metrics import MetricsWriter

    run = tmp_path / "run1"
    w = MetricsWriter(str(run))
    for step, loss in enumerate([3.0, 2.0, 1.0]):
        w.write_scalar("train/loss", loss, step)
    w.close()
    rows = summarize([str(run)])
    assert rows[0]["tag"] == "train/loss"
    assert rows[0]["last"] == 1.0 and rows[0]["n"] == 3
    main([str(run), "--tag", "train/loss"])
    out = capsys.readouterr().out
    assert "train/loss" in out and "last=1" in out
