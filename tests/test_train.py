"""Training engine: LR schedule semantics, a real multi-device train run on
the virtual 8-CPU mesh, EMA behavior, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.data.datasets import CaptionDataset
from leclip_tpu.data.tokenizer import tokenize
from leclip_tpu.engine.checkpoint import (
    load_prompt_params,
    resume_if_exists,
    save_checkpoint,
)
from leclip_tpu.engine.config import setup_config
from leclip_tpu.engine.train_state import epoch_lr_schedule
from leclip_tpu.engine.trainer import CaptionDistillTrainer
from leclip_tpu.models.clip import CLIPConfig, init_clip_params

TINY = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=(1, 1, 1, 1), vision_width=8,
    vision_patch_size=None, vocab_size=49408, transformer_width=64,
    transformer_heads=2, transformer_layers=2,
)
CLASSNAMES = ["dog", "cat", "person", "pizza"]


def tiny_dataset(n=64) -> CaptionDataset:
    rng = np.random.default_rng(0)
    texts, labels = [], []
    for _ in range(n):
        present = rng.random(4) < 0.5
        present[rng.integers(4)] = True
        names = [c for c, p in zip(CLASSNAMES, present) if p]
        texts.append("a photo of a " + " and a ".join(names) + ".")
        labels.append(present.astype(np.int8))
    return CaptionDataset(tokenize(texts), np.stack(labels), [], CLASSNAMES)


def make_trainer(tmp_path, **opts):
    base = [
        "OPTIM.MAX_EPOCH", "3",
        "OPTIM.LR", "0.05",
        "OPTIM.WARMUP_EPOCH", "-1",
        "DATALOADER.BATCH_SIZE_TRAIN", "16",
        "TRAINER.N_CTX", "4",
        "OUTPUT_DIR", str(tmp_path),
        "TRAIN.PRINT_FREQ", "100",
    ]
    for k, v in opts.items():
        base += [k, str(v)]
    cfg = setup_config(opts=base)
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    return CaptionDistillTrainer(cfg, clip_params, TINY, dataset=tiny_dataset())


def test_lr_schedule_per_epoch():
    cfg = setup_config(opts=["OPTIM.LR", "0.1", "OPTIM.MAX_EPOCH", "10",
                             "OPTIM.WARMUP_EPOCH", "2",
                             "OPTIM.WARMUP_TYPE", "constant",
                             "OPTIM.WARMUP_CONS_LR", "1e-5"])
    lr = epoch_lr_schedule(cfg.OPTIM, steps_per_epoch=5)
    # constant warmup for 2 epochs
    assert float(lr(0)) == pytest.approx(1e-5)
    assert float(lr(9)) == pytest.approx(1e-5)
    # cosine afterwards, constant within an epoch; WARMUP_RECOUNT (dassl
    # default True) restarts the annealer after warmup, so epoch 2 runs at
    # full base lr — golden-verified vs the executed dassl scheduler in
    # tests/test_reference_golden.py
    assert float(lr(10)) == float(lr(14))
    assert float(lr(10)) == pytest.approx(0.1)
    assert float(lr(15)) == pytest.approx(0.1 * 0.5 * (1 + np.cos(np.pi * 1 / 10)))
    assert float(lr(45)) < float(lr(10))


def test_training_reduces_loss(tmp_path):
    assert jax.device_count() == 8  # virtual CPU mesh from conftest
    trainer = make_trainer(tmp_path)
    sb = next(trainer.batcher.epoch(0))
    from leclip_tpu.parallel.mesh import shard_batch

    batch = shard_batch(sb, trainer.mesh)
    state = trainer.state  # NOTE: train_step donates its input state
    first_loss = None
    for i in range(30):
        state, metrics = trainer.train_step(state, batch["img"], batch["label"])
        if i == 0:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss
    # temperatures are trainable scalars and should have moved or stayed finite
    assert np.isfinite(float(state.params["temperature"]))


def test_int8_caption_branch(tmp_path):
    """TRAIN.int8_captions quantizes the FROZEN caption encode only; one step
    must run finite and the loss must track the full-precision step closely
    (same batch, same init)."""
    from leclip_tpu.parallel.mesh import shard_batch

    ref = make_trainer(tmp_path / "a")
    q = make_trainer(tmp_path / "b", **{"TRAIN.int8_captions": "True"})
    sb = next(ref.batcher.epoch(0))
    batch = shard_batch(sb, ref.mesh)
    _, m_ref = ref.train_step(ref.state, batch["img"], batch["label"])
    batch_q = shard_batch(sb, q.mesh)
    _, m_q = q.train_step(q.state, batch_q["img"], batch_q["label"])
    lr_, lq = float(m_ref["loss"]), float(m_q["loss"])
    assert np.isfinite(lq)
    assert abs(lq - lr_) < 0.05 * max(abs(lr_), 1e-3), (lr_, lq)


def test_full_loop_and_checkpoints(tmp_path):
    trainer = make_trainer(tmp_path, **{"TRAIN.CHECKPOINT_FREQ": "1"})
    state = trainer.train()
    name = trainer.model_name
    assert os.path.exists(os.path.join(tmp_path, name, "model.ckpt-2"))
    # eval-load returns just the trainable pytree
    params = load_prompt_params(str(tmp_path), name)
    np.testing.assert_allclose(
        np.asarray(params["ctx"]), np.asarray(state.params["ctx"]), rtol=1e-6
    )
    # resume restores step + params
    restored, start_epoch = resume_if_exists(trainer.state, str(tmp_path), name)
    assert start_epoch == 3
    assert int(restored.step) == int(state.step)


def test_ema_follows_params(tmp_path):
    trainer = make_trainer(tmp_path, **{"TRAIN.ema": "True", "TRAIN.momentum": "0.5"})
    sb = next(trainer.batcher.epoch(0))
    from leclip_tpu.parallel.mesh import shard_batch

    batch = shard_batch(sb, trainer.mesh)
    state = trainer.state
    np.testing.assert_allclose(
        np.asarray(state.ema_params["ctx"]), np.asarray(state.params["ctx"])
    )
    for _ in range(5):
        state, metrics = trainer.train_step(state, batch["img"], batch["label"])
    assert "ema_loss" in metrics and np.isfinite(float(metrics["ema_loss"]))
    # ema lags behind the live params
    diff = np.abs(np.asarray(state.ema_params["ctx"]) - np.asarray(state.params["ctx"]))
    assert diff.max() > 0


def test_soft_ce_and_custom_clip(tmp_path):
    trainer = make_trainer(
        tmp_path, **{"TRAIN.LOSSFUNC": "soft_ce", "TRAIN.MODEL": "CustomCLIP"}
    )
    sb = next(trainer.batcher.epoch(0))
    from leclip_tpu.parallel.mesh import shard_batch

    batch = shard_batch(sb, trainer.mesh)
    _, metrics = trainer.train_step(trainer.state, batch["img"], batch["label"])
    assert np.isfinite(float(metrics["loss"]))


def test_adapter_trainer(tmp_path):
    from leclip_tpu.engine.trainer import CaptionDistillAdapterTrainer
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.parallel.mesh import shard_batch

    cfg = setup_config(opts=[
        "OPTIM.MAX_EPOCH", "1", "DATALOADER.BATCH_SIZE_TRAIN", "16",
        "OPTIM.LR", "0.05", "OPTIM.WARMUP_EPOCH", "-1",
        "TRAINER.N_CTX", "4", "OUTPUT_DIR", str(tmp_path),
        "TRAINER.adapter_trainable", "True",
    ])
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tr = CaptionDistillAdapterTrainer(cfg, clip_params, TINY, dataset=tiny_dataset())
    assert "_adapter" in tr.state.params
    b = shard_batch(next(tr.batcher.epoch(0)), tr.mesh)
    state = tr.state
    first = None
    for i in range(10):
        state, m = tr.train_step(state, b["img"], b["label"])
        if i == 0:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    # the adapter actually moved
    d = np.abs(np.asarray(state.params["_adapter"]["down_kernel"]) -
               np.asarray(tr.adapter["down_kernel"]))
    assert d.max() > 0


def test_adapter_frozen_variant(tmp_path):
    from leclip_tpu.engine.trainer import CaptionDistillAdapterTrainer
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.parallel.mesh import shard_batch

    cfg = setup_config(opts=[
        "OPTIM.MAX_EPOCH", "1", "DATALOADER.BATCH_SIZE_TRAIN", "16",
        "TRAINER.N_CTX", "4", "OUTPUT_DIR", str(tmp_path),
    ])
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tr = CaptionDistillAdapterTrainer(cfg, clip_params, TINY, dataset=tiny_dataset())
    assert "_adapter" not in tr.state.params
    b = shard_batch(next(tr.batcher.epoch(0)), tr.mesh)
    _, m = tr.train_step(tr.state, b["img"], b["label"])
    assert np.isfinite(float(m["loss"]))


def test_orbax_checkpoint_roundtrip(tmp_path):
    from leclip_tpu.engine.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    trainer = make_trainer(tmp_path)
    path = save_checkpoint_orbax(trainer.state, str(tmp_path), "prompt_learner", 0)
    assert os.path.isdir(path)
    restored = load_checkpoint_orbax(str(tmp_path), "prompt_learner")
    np.testing.assert_allclose(
        np.asarray(restored["params"]["ctx"]),
        np.asarray(trainer.state.params["ctx"]),
    )
    assert restored["epoch"] == 0


def test_cooccurrence_loss_path(tmp_path):
    from leclip_tpu.data.freq_stats import build_freq_stats
    from leclip_tpu.ops.ensemble import normalized_cooccurrence
    from leclip_tpu.parallel.mesh import shard_batch

    trainer = make_trainer(tmp_path, **{"TRAIN.LOSSFUNC": "ranking_with_cooccurrence"})
    stats = build_freq_stats(trainer.dataset.labels)
    p = normalized_cooccurrence(stats["adj"] + 1e-3, stats["nums"] + 1.0)
    trainer.set_cooccurrence(p)
    b = shard_batch(next(trainer.batcher.epoch(0)), trainer.mesh)
    _, m = trainer.train_step(trainer.state, b["img"], b["label"])
    assert np.isfinite(float(m["loss"]))


def test_sync_every_pipelined_loop_identical(tmp_path):
    """TRAIN.sync_every > 1 (the TPU pipelined host-sync cadence) only changes
    WHEN metrics are fetched to host, never the update math: a full train()
    with sync_every=3 (steps_per_epoch=4, so the final partial-cadence step
    exercises the n == steps_per_epoch sync) must produce bit-identical
    prompt params to the per-step-synced run."""
    ref = make_trainer(tmp_path / "a", **{"TRAIN.sync_every": 1,
                                          "OPTIM.MAX_EPOCH": 2})
    pipelined = make_trainer(tmp_path / "b", **{"TRAIN.sync_every": 3,
                                                "OPTIM.MAX_EPOCH": 2})
    assert pipelined.batcher.steps_per_epoch() == 4  # 64 / 16
    s_ref = ref.train(resume=False)
    s_pip = pipelined.train(resume=False)
    assert int(s_ref.step) == int(s_pip.step) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_ref.params, s_pip.params,
    )


def test_prefetch_batches_loop_identical(tmp_path):
    """TRAIN.prefetch_batches > 0 (the background-thread batch uploader that
    hides the ~32 ms device_put RPC per step on a networked TPU) only changes
    WHERE the upload happens, never batch order or update math: a full
    train() with prefetch depth 2 must produce bit-identical prompt params
    to the inline-upload run."""
    ref = make_trainer(tmp_path / "a", **{"OPTIM.MAX_EPOCH": 2})
    pre = make_trainer(tmp_path / "b", **{"TRAIN.prefetch_batches": 2,
                                          "OPTIM.MAX_EPOCH": 2})
    s_ref = ref.train(resume=False)
    s_pre = pre.train(resume=False)
    assert int(s_ref.step) == int(s_pre.step) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_ref.params, s_pre.params,
    )


def test_preemption_resume_matches_uninterrupted(tmp_path):
    """The full preemption story (SURVEY §5 checkpoint/resume): train 2
    epochs, lose the process, reconstruct the trainer from scratch in a
    'new process', RESUME, finish to 4 epochs — final params, EMA twin, and
    step count must match a 4-epoch uninterrupted run exactly (per-epoch
    batcher permutations, cosine schedule position, and optimizer momentum
    all continue from the checkpoint)."""
    opts = {"TRAIN.CHECKPOINT_FREQ": "1", "OPTIM.MAX_EPOCH": "4",
            "TRAIN.ema": "True"}
    straight = make_trainer(tmp_path / "a", **opts)
    final_a = straight.train(resume=False)

    # interrupt WITHOUT changing the training config (a smaller MAX_EPOCH
    # would change the cosine schedule itself): same 4-epoch recipe, break
    # after epoch 2 via early_stop
    part1 = make_trainer(tmp_path / "b", **{**opts, "TRAIN.early_stop_epoch": "2"})
    part1.train(resume=False)
    # "new process": a fresh trainer (fresh state/optimizer) pointed at the
    # checkpoint dir via RESUME
    part2 = make_trainer(tmp_path / "b", **opts, RESUME=str(tmp_path / "b"))
    final_b = part2.train(resume=True)

    assert int(final_b.step) == int(final_a.step)
    for key in ("params", "ema_params"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(final_a, key)),
                        jax.tree_util.tree_leaves(getattr(final_b, key))):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-7)


def test_profiler_trace_window(tmp_path):
    """TRAIN.profile_dir wires utils.logging.profiler_trace into the train
    loop: a bounded first-epoch step window is traced and written as a
    TensorBoard-loadable profile (SURVEY §5 — the reference has no tracing,
    only AverageMeter wall-clocks)."""
    prof = tmp_path / "prof"
    tr = make_trainer(tmp_path / "out", **{
        "OPTIM.MAX_EPOCH": "1",
        "TRAIN.profile_dir": str(prof),
    })
    tr.train(resume=False)
    files = [p for p in prof.rglob("*") if p.is_file()]
    assert files, "profiler trace produced no files"


def test_build_trainer_registry(tmp_path):
    """build_trainer (the dassl build.py analogue) resolves through
    TRAINER_REGISTRY and returns a wired trainer."""
    from leclip_tpu.engine.trainer import CaptionDistillTrainer, build_trainer

    cfg = setup_config(opts=[
        "OPTIM.MAX_EPOCH", "1", "DATALOADER.BATCH_SIZE_TRAIN", "16",
        "TRAINER.N_CTX", "4", "OUTPUT_DIR", str(tmp_path),
    ])
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tr = build_trainer(cfg, clip_params, TINY, dataset=tiny_dataset())
    assert isinstance(tr, CaptionDistillTrainer)
    assert tr.batcher.steps_per_epoch() >= 1

    # TRAINER.NAME selects the variant (ref --trainer / dassl build.py)
    from leclip_tpu.engine.trainer import CaptionDistillAdapterTrainer

    cfg2 = setup_config(opts=[
        "TRAINER.NAME", "Caption_distill_double_adapter",
        "OPTIM.MAX_EPOCH", "1", "DATALOADER.BATCH_SIZE_TRAIN", "16",
        "TRAINER.N_CTX", "4", "OUTPUT_DIR", str(tmp_path),
    ])
    tr2 = build_trainer(cfg2, clip_params, TINY, dataset=tiny_dataset())
    assert isinstance(tr2, CaptionDistillAdapterTrainer)


def test_checkpoint_gate_matches_reference(tmp_path):
    """The reference's save gate (Caption_distill_double.py:576-587): freq<=0
    saves ONLY on the true last epoch; an early stop past the last freq
    multiple does NOT persist the tail epochs (train_2.sh copies epoch 80 for
    members that early-stop at 82/85 — those tails never existed on disk)."""
    # freq 0 → only the last epoch is saved
    t1 = make_trainer(tmp_path / "a", **{"TRAIN.CHECKPOINT_FREQ": "0"})
    t1.train(resume=False)
    name = t1.model_name
    saved = sorted(os.listdir(os.path.join(tmp_path / "a", name)))
    assert "model.ckpt-2" in saved  # MAX_EPOCH 3 → last epoch index 2
    assert not any(s.endswith(("-0", "-1")) for s in saved)

    # freq 2, early stop at 3 (of MAX_EPOCH 4): epoch index 1 saved, the
    # early-stopped epoch index 2 NOT saved
    t2 = make_trainer(tmp_path / "b", **{
        "TRAIN.CHECKPOINT_FREQ": "2", "OPTIM.MAX_EPOCH": "4",
        "TRAIN.early_stop_epoch": "3",
    })
    t2.train(resume=False)
    saved = sorted(os.listdir(os.path.join(tmp_path / "b", t2.model_name)))
    assert "model.ckpt-1" in saved and "model.ckpt-2" not in saved
