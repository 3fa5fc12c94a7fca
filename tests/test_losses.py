"""Loss-function golden tests: JAX ports vs independent torch/numpy
re-derivations of the reference formulas."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from leclip_tpu.ops import losses as L

B, C = 8, 12


@pytest.fixture()
def data(rng):
    pred = rng.normal(size=(B, C)).astype(np.float32)
    label = (rng.random((B, C)) < 0.3).astype(np.float32)
    label[0] = 0  # empty-label row exercises edge cases
    label[1] = 1
    return pred, label


def torch_ranking(pred, y, scale=1.0, margin=1.0):
    y_pred = torch.tensor(pred) * scale
    y_true = torch.tensor(y).float()
    tmp = margin - y_pred[:, None, :] + y_pred[:, :, None]
    partial = torch.clamp(tmp, min=0)
    loss = partial * y_true[:, None, :] * (1 - y_true[:, :, None])
    return loss.sum(-1).sum(-1).mean().item()


def test_ranking_loss(data):
    pred, label = data
    got = float(L.ranking_loss(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, torch_ranking(pred, label), rtol=1e-5)


def test_ranking_with_cooccurrence(data, rng):
    pred, label = data
    co = rng.random((C, C)).astype(np.float32) + 0.01
    w = torch.log(1.0 / (torch.tensor(co) + 1e-6))
    w = w * (1 - torch.eye(C))
    w = w / w.mean(-1, keepdim=True)
    y_pred = torch.tensor(pred)
    y_true = torch.tensor(label)
    tmp = 1.0 - y_pred[:, None, :] + y_pred[:, :, None]
    partial = torch.clamp(tmp, min=0) * w
    expect = (partial * y_true[:, None, :] * (1 - y_true[:, :, None])).sum(-1).sum(-1).mean()
    got = float(L.ranking_loss_with_cooccurrence(jnp.asarray(pred), jnp.asarray(label), jnp.asarray(co)))
    np.testing.assert_allclose(got, expect.item(), rtol=1e-4)


def test_soft_cross_entropy(data):
    pred, label = data
    soft = label / np.maximum(label.sum(1, keepdims=True), 1)
    expect = torch.mean(
        torch.sum(-torch.tensor(soft) * F.log_softmax(torch.tensor(pred), dim=-1), 1)
    ).item()
    got = float(L.soft_cross_entropy(jnp.asarray(pred), jnp.asarray(soft)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_bce_variants(data):
    pred, label = data
    expect = F.binary_cross_entropy_with_logits(torch.tensor(pred), torch.tensor(label)).item()
    got = float(L.norm_logits_bce(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_focal(data):
    pred, label = data
    p = torch.sigmoid(torch.tensor(pred))
    ce = F.binary_cross_entropy_with_logits(torch.tensor(pred), torch.tensor(label), reduction="none")
    expect = (ce * torch.abs(torch.tensor(label) - p) ** 2).mean().item()
    got = float(L.sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_kl_distill(data, rng):
    pred, _ = data
    teacher = rng.normal(size=(B, C)).astype(np.float32)
    expect = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(torch.tensor(pred), dim=-1), F.softmax(torch.tensor(teacher), dim=-1)
    ).item()
    got = float(L.kl_distill_loss(jnp.asarray(pred), jnp.asarray(teacher)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_asymmetric_loss(data):
    pred, label = data
    x, y = torch.tensor(pred), torch.tensor(label)
    xs_pos = torch.sigmoid(x)
    xs_neg = (1 - xs_pos + 0.05).clamp(max=1)
    y_pos, y_neg = (y > 0.9).float(), (y < -0.9).float()
    loss = y_pos * torch.log(xs_pos.clamp(min=1e-8)) + y_neg * torch.log(xs_neg.clamp(min=1e-8))
    pt = xs_pos * y_pos + xs_neg * y_neg
    loss = loss * (1 - pt) ** (1.0 * y_pos + 2.0 * y_neg)
    expect = (-loss.sum() / B).item()
    got = float(L.dualcoop_loss(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_resample_loss_rebalance(data, rng):
    """DBL with the trainer's exact config (rebalance, focal off, no logit
    reg), against a direct torch transcription."""
    pred, label = data
    label[label.sum(1) == 0, 0] = 1  # DBL assumes ≥1 positive per row
    class_freq = rng.integers(5, 100, size=C).astype(np.float32)
    neg_freq = 1000 - class_freq

    freq_inv = torch.ones(C) / torch.tensor(class_freq)
    gt = torch.tensor(label)
    repeat_rate = torch.sum(gt * freq_inv, dim=1, keepdim=True)
    pos_weight = freq_inv[None] / repeat_rate
    weight = torch.sigmoid(10.0 * (pos_weight - 0.2)) + 0.1
    bce = F.binary_cross_entropy_with_logits(torch.tensor(pred), gt, reduction="none")
    expect = (weight * bce).mean().item()

    p = L.make_resample_loss_params(class_freq, neg_freq)
    got = float(L.resample_loss(jnp.asarray(pred), jnp.asarray(label), p))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_lmpt_hinge(rng):
    Bc, Cc, Lc, D = 3, 4, 6, 8
    cap = rng.normal(size=(Bc, Lc + 2, D)).astype(np.float32)
    prm = rng.normal(size=(Cc, Lc + 2, D)).astype(np.float32)
    lab = (rng.random((Bc, Cc)) < 0.5).astype(np.float32)
    cc = rng.integers(2, 50, size=Cc).astype(np.float32)

    a = torch.tensor(cap)[:, :Lc, :].unsqueeze(1).expand(Bc, Cc, Lc, D)
    b = torch.tensor(prm)[:, 2:, :].unsqueeze(0).expand(Bc, Cc, Lc, D)
    x = 1 - torch.cosine_similarity(a, b, dim=-1)
    y = 2 * torch.tensor(lab).unsqueeze(2).expand(Bc, Cc, Lc) - 1
    dot = torch.sum(x * y, dim=2)
    margin = 0.2 / torch.sqrt(torch.sqrt(torch.tensor(cc)))
    hinge = torch.relu(margin - dot)
    cw = (1 / torch.tensor(cc)) ** 2
    cw = cw / cw.sum()
    expect = ((hinge * cw).sum() / Bc).item()

    got = float(
        L.lmpt_hinge_from_embeddings(
            jnp.asarray(cap), jnp.asarray(prm), jnp.asarray(lab), jnp.asarray(cc), m_ctx=2
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4)
