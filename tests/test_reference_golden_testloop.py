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


def test_reference_test_loop_plumbing(tmp_path, monkeypatch):
    _refshim.plant_caption_bank(str(tmp_path), torch.zeros((8, 1024)))
    CD = _refshim.import_caption_distill(str(tmp_path))

    monkeypatch.chdir(tmp_path)
    with open("freq_stats.pkl", "wb") as f:
        pickle.dump({"adj": np.eye(C), "nums": np.ones(C)}, f)
    os.makedirs("train_output", exist_ok=True)

    names = ["best", "difft"]
    salts = {"best": 0.11, "difft": 0.29}

    # two batches; per image: a global view + two scales of crop blocks
    torch.manual_seed(0)
    batches = []
    for _ in range(2):
        img = torch.rand(3, 3, 8, 8)
        blocks = [torch.rand(3, 4, 3, 8, 8), torch.rand(3, 9, 3, 8, 8)]
        batches.append((img, torch.zeros(3, C), blocks))

    tr = CD.Caption_distill_double.__new__(CD.Caption_distill_double)
    tr.cfg = types.SimpleNamespace(TEST=types.SimpleNamespace(
        SPLIT="test", use_freq=False, save_pth=True,
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
