"""Ensemble fusion golden tests (vs direct torch transcriptions of
gen_final_ans.py) and the end-to-end routing merge."""

import json

import numpy as np
import pytest
import torch

from leclip_tpu.ops.ensemble import (
    DEFAULT_ROUTING,
    adjust_predictions,
    aggregate_blocks,
    fuse,
    fuse6,
    generate_final_answers,
    model_result,
    normalized_cooccurrence,
    route_ensemble,
)

N, B, C, K = 6, 10, 80, 5


@pytest.fixture()
def blocks(rng):
    data = rng.normal(size=(N, B, C)).astype(np.float32)
    sims = (rng.random((N, B, K)) * 0.4).astype(np.float32)
    return data, sims


def torch_fuse(data, sims_scores, threshold=0.2):
    data = torch.tensor(data)
    sims_mat = torch.tensor(sims_scores).mean(-1, keepdim=True)
    sims_mat = torch.ones_like(sims_mat) + sims_mat
    data = sims_mat * data
    var = torch.var(data, dim=2).unsqueeze(-1)
    var = torch.ones_like(var) + var
    data = var * data
    alpha = data.max(dim=1)[0]
    beta = data.min(dim=1)[0]
    gamma = (alpha > threshold).int()
    return (gamma * alpha + (1 - gamma) * beta).numpy()


def torch_fuse6(data, sims_scores, threshold=0.2):
    data = torch.tensor(data)
    sims_mat = torch.tensor(sims_scores).mean(-1, keepdim=True)
    var0 = torch.ones_like(torch.var(data, dim=2).unsqueeze(-1)) + torch.var(data, dim=2).unsqueeze(-1)
    data_sim = (torch.ones_like(sims_mat) + sims_mat) * data
    var1 = torch.ones_like(torch.var(data_sim, dim=2).unsqueeze(-1)) + torch.var(data_sim, dim=2).unsqueeze(-1)
    data = var0 * var1 * data_sim
    alpha = data.max(dim=1)[0]
    beta = data.min(dim=1)[0]
    gamma = (alpha > threshold).int()
    return (gamma * alpha + (1 - gamma) * beta).numpy()


def test_fuse_golden(blocks):
    data, sims = blocks
    np.testing.assert_allclose(fuse(data, sims), torch_fuse(data, sims), rtol=2e-5, atol=1e-5)


def test_fuse6_golden(blocks):
    data, sims = blocks
    np.testing.assert_allclose(fuse6(data, sims), torch_fuse6(data, sims), rtol=2e-5, atol=1e-5)


def test_aggregate_blocks(blocks):
    data, _ = blocks
    base = np.zeros((N, C), np.float32)
    out = aggregate_blocks(data, threshold=0.3, coef=1.4, base=base)
    alpha = data.max(1)
    beta = data.min(1)
    expect = 1.4 * np.where(alpha > 0.3, alpha, beta)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_cooccurrence_adjust(rng):
    adj = rng.random((C, C)).astype(np.float32) + 0.1
    nums = rng.random(C).astype(np.float32) + 1.0
    p = normalized_cooccurrence(adj, nums)
    np.testing.assert_allclose(p.sum(-1), np.ones(C), rtol=1e-5)
    preds = rng.normal(size=(4, C)).astype(np.float32)
    out = adjust_predictions(preds, p, 0.5)
    np.testing.assert_allclose(out, preds + 0.5 * preds @ p, rtol=1e-5)


def test_model_result_and_routing(blocks, rng):
    data, sims = blocks
    outputs = {
        "output": rng.normal(size=(N, C)).astype(np.float32),
        "output_pos": rng.normal(size=(N, C)).astype(np.float32),
        "output_blocks": data,
        "output_pos_blocks": data * 0.5,
    }
    res_best = model_result(outputs, sims, use_fuse6=True, aux_coef=1.5)
    expect = (
        outputs["output"] + 1.5 * torch_fuse6(data, sims)
        + 1.5 * (outputs["output_pos"] + 1.5 * torch_fuse6(data * 0.5, sims))
    )
    np.testing.assert_allclose(res_best, expect, rtol=2e-5, atol=1e-5)

    per_model = {"best": res_best, "ema": res_best + 1.0}
    fused = route_ensemble(per_model, {"ema": [0, 5]}, base="best")
    np.testing.assert_allclose(fused[:, 0], res_best[:, 0] + 1.0)
    np.testing.assert_allclose(fused[:, 1], res_best[:, 1])


def test_generate_final_answers_json(blocks, rng, tmp_path):
    data_blocks, sims = blocks
    def outputs():
        return {
            "output": rng.normal(size=(N, C)).astype(np.float32),
            "output_pos": rng.normal(size=(N, C)).astype(np.float32),
            "output_blocks": data_blocks,
            "output_pos_blocks": data_blocks,
        }
    data = {name: outputs() for name in ["best", "ema", "zema", "diff", "diffh", "difft"]}
    path = tmp_path / "impreds.json"
    fused = generate_final_answers(data, sims, out_path=str(path))
    loaded = json.load(open(path))
    assert len(loaded) == N and len(loaded[0]) == C
    np.testing.assert_allclose(np.asarray(loaded), fused, rtol=1e-6)
    # routed columns come from their specialists
    ema_cols = DEFAULT_ROUTING["ema"]
    per_ema = model_result(data["ema"], sims)
    np.testing.assert_allclose(fused[:, ema_cols], per_ema[:, ema_cols], rtol=2e-5)
