"""Direct-execution golden for the reference's test-time PLUMBING: the
actual ``Caption_distill_double.test()`` method (trainers/
Caption_distill_double.py:589-732) is executed with a deterministic fake
``model_inference`` (the device boundary) and a recording evaluator, and its
per-class block aggregation, concat-axis order, and ``save_pth`` dump
artifact are compared EXACTLY (zero tolerance — both sides consume the same
fake scores) against our ``ops/ensemble.aggregate_blocks`` and the dump
contract of ``inference/tta.py``.

What this pins that model-forward goldens cannot: the α/β/γ(>0.3) → 1.4·s_ag
+ global aggregation applied independently to output and output_pos
(:658-673), per-scale reshape to [B, n_s, C] then concat along the crop axis
(:643-657), the {name: {output, output_pos, output_blocks,
output_pos_blocks}} dump (:704-724), and the sim matrix being recorded once
per batch from the LAST model name's inference (:693-698).
"""

import json
import os
import pickle
import types

import numpy as np
import pytest
import torch

from leclip_tpu.ops.ensemble import aggregate_blocks
from tests import _refshim
from tests.conftest import requires_reference

pytestmark = requires_reference

C = 80  # classes


def _fake_scores(inp, salt):
    """Deterministic per-row scores from the input pixels (device stand-in)."""
    b = inp.shape[0]
    base = inp.reshape(b, -1).mean(dim=1, keepdim=True)
    cols = torch.arange(1, C + 1, dtype=torch.float32)[None, :]
    out = torch.tanh(base * cols * 0.37 + salt)
    pos = torch.tanh(base * cols * 0.53 - salt)
    sim = torch.tanh(base * torch.arange(1, 6, dtype=torch.float32)[None, :])
    return out, pos, sim


class _RecordingEvaluator:
    def __init__(self):
        self.calls = []

    def reset(self):
        self.calls = []

    def process(self, output, label, output_pos):
        self.calls.append((output.clone(), output_pos.clone()))

    def evaluate(self):
        return {"mAP": 0.0}


def _make_trainer(tmp_path, names, salts, batches, adj=None, nums=None,
                  use_freq=False, save_pth=True):
    """Construct the reference trainer around a fake device boundary; the
    caller must already have chdir'd into tmp_path."""
    _refshim.plant_caption_bank(str(tmp_path), torch.zeros((8, 1024)))
    CD = _refshim.import_caption_distill(str(tmp_path))
    with open("freq_stats.pkl", "wb") as f:
        pickle.dump({"adj": np.eye(C) if adj is None else adj,
                     "nums": np.ones(C) if nums is None else nums}, f)
    os.makedirs("train_output", exist_ok=True)
    tr = CD.Caption_distill_double.__new__(CD.Caption_distill_double)
    tr.cfg = types.SimpleNamespace(TEST=types.SimpleNamespace(
        SPLIT="test", use_freq=use_freq, save_pth=save_pth,
        save_name=str(tmp_path / "data.pth")))
    tr.evaluator = _RecordingEvaluator()
    tr.val_loader = None
    tr.test_loader = batches
    tr.epoch = 0
    tr.set_model_mode = lambda *a, **k: None
    tr.get_model_names = lambda: names
    tr.parse_batch_test = lambda batch: batch
    tr.write_scalar = lambda *a, **k: None
    tr.model_inference = lambda inp, name: (
        *_fake_scores(inp, salts[name])[:2], None, None,
        _fake_scores(inp, salts[name])[2])
    return tr


def _make_batches(n_batches=2, b=3, scales=(4, 9), seed=0):
    torch.manual_seed(seed)
    batches = []
    for _ in range(n_batches):
        img = torch.rand(b, 3, 8, 8)
        blocks = [torch.rand(b, s, 3, 8, 8) for s in scales]
        batches.append((img, torch.zeros(b, C), blocks))
    return batches


def _cuda_tensor_shim(monkeypatch):
    """The reference's test() builds its co-occurrence matrix with
    ``torch.tensor(..., device='cuda')`` (Caption_distill_double.py:634);
    cpu-only torch needs the device kwarg stripped (device boundary shim,
    same category as the .cuda() no-ops in _refshim)."""
    orig = torch.tensor
    monkeypatch.setattr(
        torch, "tensor",
        lambda *a, **k: orig(*a, **{kk: v for kk, v in k.items()
                                    if kk != "device"}))


def test_reference_test_loop_plumbing(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    names = ["best", "difft"]
    salts = {"best": 0.11, "difft": 0.29}
    batches = _make_batches()
    tr = _make_trainer(tmp_path, names, salts, batches)

    tr.test(split="test", mode="test")

    saved = torch.load(tmp_path / "data.pth")
    assert set(saved) == set(names)
    assert set(saved["best"]) == {
        "output", "output_pos", "output_blocks", "output_pos_blocks"}

    # ---- recompute with OUR primitives from the same fake scores ----
    for name in names:
        outs, poss, blks, pblks = [], [], [], []
        for img, _, blocks in batches:
            o, p, _ = _fake_scores(img, salts[name])
            outs.append(o.numpy())
            poss.append(p.numpy())
            per_scale_o, per_scale_p = [], []
            for blk in blocks:
                bo, bp, _ = _fake_scores(
                    blk.reshape(-1, *blk.shape[2:]), salts[name])
                per_scale_o.append(bo.numpy().reshape(blk.shape[0], blk.shape[1], -1))
                per_scale_p.append(bp.numpy().reshape(blk.shape[0], blk.shape[1], -1))
            blks.append(np.concatenate(per_scale_o, axis=1))
            pblks.append(np.concatenate(per_scale_p, axis=1))
        np.testing.assert_array_equal(saved[name]["output"].numpy(),
                                      np.concatenate(outs))
        np.testing.assert_array_equal(saved[name]["output_pos"].numpy(),
                                      np.concatenate(poss))
        np.testing.assert_array_equal(saved[name]["output_blocks"].numpy(),
                                      np.concatenate(blks))
        np.testing.assert_array_equal(saved[name]["output_pos_blocks"].numpy(),
                                      np.concatenate(pblks))

    # evaluator received the LAST name's aggregated scores; our
    # aggregate_blocks must reproduce the reference's α/β/γ→1.4·s_ag + global
    # bit-exactly (same fp32 inputs, same ops)
    assert len(tr.evaluator.calls) == len(batches)
    for (ref_final, ref_pos_final), (img, _, blocks) in zip(
            tr.evaluator.calls, batches):
        o, p, _ = _fake_scores(img, salts["difft"])
        per_o, per_p = [], []
        for blk in blocks:
            bo, bp, _ = _fake_scores(blk.reshape(-1, *blk.shape[2:]), salts["difft"])
            per_o.append(bo.numpy().reshape(blk.shape[0], blk.shape[1], -1))
            per_p.append(bp.numpy().reshape(blk.shape[0], blk.shape[1], -1))
        ours_final = aggregate_blocks(np.concatenate(per_o, axis=1),
                                      threshold=0.3, coef=1.4, base=o.numpy())
        ours_pos_final = aggregate_blocks(np.concatenate(per_p, axis=1),
                                          threshold=0.3, coef=1.4, base=p.numpy())
        np.testing.assert_allclose(ref_final.numpy(), np.asarray(ours_final),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(ref_pos_final.numpy(),
                                   np.asarray(ours_pos_final), rtol=0, atol=1e-6)

    # sim matrix: recorded ONCE per batch, from the LAST name (:693-698)
    sim = torch.load("train_output/sim_matrix_B.pth")
    assert sim["sims_all"].shape == (6, 5)
    assert sim["sims_blocks_all"].shape == (6, 13, 5)
    exp_sim = torch.cat([_fake_scores(img, salts["difft"])[2]
                         for img, _, _ in batches])
    np.testing.assert_array_equal(sim["sims_all"].numpy(), exp_sim.numpy())

    # sims_blocks: per-scale sims reshaped [B, n_s, 5] then concat on the
    # crop axis, LAST name's pass (:645-657,693-698)
    exp_blocks = []
    for _, _, blocks in batches:
        per_scale = []
        for blk in blocks:
            s = _fake_scores(blk.reshape(-1, *blk.shape[2:]), salts["difft"])[2]
            per_scale.append(s.reshape(blk.shape[0], blk.shape[1], -1))
        exp_blocks.append(torch.cat(per_scale, dim=1))
    np.testing.assert_array_equal(sim["sims_blocks_all"].numpy(),
                                  torch.cat(exp_blocks).numpy())


def test_use_freq_modulates_pos_scores_and_blocks(tmp_path, monkeypatch):
    """TEST.use_freq=True: the co-occurrence matrix from freq_stats.pkl
    modulates output_pos AND every pos block (weight 0.5) BEFORE aggregation
    and BEFORE the dump append (:631-636,648-653); `output` is untouched.
    Ours: data/freq_stats + ops/ensemble.{normalized_cooccurrence,
    adjust_predictions} must reproduce the evaluator finals and the dump."""
    from leclip_tpu.ops.ensemble import (adjust_predictions,
                                         normalized_cooccurrence)

    monkeypatch.chdir(tmp_path)
    _cuda_tensor_shim(monkeypatch)
    rng = np.random.default_rng(3)
    adj = rng.integers(1, 50, (C, C)).astype(np.float64)
    nums = rng.integers(50, 200, C).astype(np.float64)
    names = ["best"]
    salts = {"best": 0.17}
    batches = _make_batches(seed=1)
    tr = _make_trainer(tmp_path, names, salts, batches, adj=adj, nums=nums,
                       use_freq=True)
    tr.test(split="test", mode="test")

    p = normalized_cooccurrence(adj, nums).astype(np.float32)
    saved = torch.load(tmp_path / "data.pth")
    outs, poss, pblks, finals = [], [], [], []
    for img, _, blocks in batches:
        o, pos, _ = _fake_scores(img, salts["best"])
        pos_adj = adjust_predictions(pos.numpy(), p, 0.5)
        outs.append(o.numpy())
        poss.append(pos_adj)
        per_o, per_p = [], []
        for blk in blocks:
            bo, bp, _ = _fake_scores(blk.reshape(-1, *blk.shape[2:]),
                                     salts["best"])
            per_o.append(bo.numpy().reshape(blk.shape[0], blk.shape[1], -1))
            bp_adj = adjust_predictions(bp.numpy(), p, 0.5)
            per_p.append(bp_adj.reshape(blk.shape[0], blk.shape[1], -1))
        pblks.append(np.concatenate(per_p, axis=1))
        finals.append((
            aggregate_blocks(np.concatenate(per_o, axis=1), threshold=0.3,
                             coef=1.4, base=o.numpy()),
            aggregate_blocks(np.concatenate(per_p, axis=1), threshold=0.3,
                             coef=1.4, base=pos_adj),
        ))
    # dump: output raw, output_pos and pos blocks freq-adjusted
    np.testing.assert_array_equal(saved["best"]["output"].numpy(),
                                  np.concatenate(outs))
    np.testing.assert_allclose(saved["best"]["output_pos"].numpy(),
                               np.concatenate(poss), rtol=0, atol=1e-6)
    np.testing.assert_allclose(saved["best"]["output_pos_blocks"].numpy(),
                               np.concatenate(pblks), rtol=0, atol=1e-6)
    # evaluator finals: global side unmodulated, pos side fully modulated
    assert len(tr.evaluator.calls) == len(batches)
    for (ref_final, ref_pos_final), (ours_final, ours_pos_final) in zip(
            tr.evaluator.calls, finals):
        np.testing.assert_allclose(ref_final.numpy(), np.asarray(ours_final),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(ref_pos_final.numpy(),
                                   np.asarray(ours_pos_final),
                                   rtol=0, atol=1e-6)


def test_train_mode_skips_blocks_and_dump(tmp_path, monkeypatch):
    """mode='train' (the epoch-loop validation path): block aggregation is
    gated off even when crop blocks are present, the evaluator receives the
    RAW global/pos scores, and no dump artifacts are written (:637,678-680,
    704-724) — the contract our trainer.validate() mirrors."""
    monkeypatch.chdir(tmp_path)
    names = ["best"]
    salts = {"best": 0.23}
    batches = _make_batches(seed=2)
    tr = _make_trainer(tmp_path, names, salts, batches)
    # split='val' with a val_loader present must consume the VAL loader
    val_batches = _make_batches(n_batches=1, seed=5)
    tr.val_loader = val_batches
    tr.test(split="val", mode="train")

    assert len(tr.evaluator.calls) == len(val_batches)
    for (ref_final, ref_pos_final), (img, _, _) in zip(
            tr.evaluator.calls, val_batches):
        o, pos, _ = _fake_scores(img, salts["best"])
        np.testing.assert_array_equal(ref_final.numpy(), o.numpy())
        np.testing.assert_array_equal(ref_pos_final.numpy(), pos.numpy())
    assert not (tmp_path / "data.pth").exists()
    assert not (tmp_path / "train_output" / "sim_matrix_B.pth").exists()


def test_sim_matrix_saved_once_only(tmp_path, monkeypatch):
    """The sim-matrix dump is write-once: an existing
    train_output/sim_matrix_B.pth is NOT overwritten while data.pth is
    (:717-720) — resuming a dump run keeps the first pass's sim matrix."""
    monkeypatch.chdir(tmp_path)
    names = ["best"]
    salts = {"best": 0.31}
    batches = _make_batches(seed=3)
    tr = _make_trainer(tmp_path, names, salts, batches)
    sentinel = {"sims_all": torch.full((1, 5), 7.0),
                "sims_blocks_all": torch.full((1, 13, 5), 7.0)}
    torch.save(sentinel, tmp_path / "train_output" / "sim_matrix_B.pth")
    tr.test(split="test", mode="test")
    kept = torch.load(tmp_path / "train_output" / "sim_matrix_B.pth")
    np.testing.assert_array_equal(kept["sims_all"].numpy(),
                                  sentinel["sims_all"].numpy())
    assert (tmp_path / "data.pth").exists()


def test_multi_scale_concat_geometry(tmp_path, monkeypatch):
    """Three crop scales (1+4+16 blocks): per-scale reshape then concat on
    the crop axis gives width 21 for scores AND sims; our aggregate_blocks
    over the same concat reproduces the evaluator final (:643-673)."""
    monkeypatch.chdir(tmp_path)
    names = ["best"]
    salts = {"best": 0.41}
    batches = _make_batches(n_batches=1, b=2, scales=(1, 4, 16), seed=4)
    tr = _make_trainer(tmp_path, names, salts, batches)
    tr.test(split="test", mode="test")

    saved = torch.load(tmp_path / "data.pth")
    assert saved["best"]["output_blocks"].shape == (2, 21, C)
    assert saved["best"]["output_pos_blocks"].shape == (2, 21, C)
    sim = torch.load(tmp_path / "train_output" / "sim_matrix_B.pth")
    assert sim["sims_blocks_all"].shape == (2, 21, 5)

    img, _, blocks = batches[0]
    o, _, _ = _fake_scores(img, salts["best"])
    per_o = []
    for blk in blocks:
        bo = _fake_scores(blk.reshape(-1, *blk.shape[2:]), salts["best"])[0]
        per_o.append(bo.numpy().reshape(blk.shape[0], blk.shape[1], -1))
    ours = aggregate_blocks(np.concatenate(per_o, axis=1), threshold=0.3,
                            coef=1.4, base=o.numpy())
    np.testing.assert_allclose(tr.evaluator.calls[0][0].numpy(),
                               np.asarray(ours), rtol=0, atol=1e-6)
