"""Golden tests for the DenseCLIP aggregation math: our JAX forwards vs an
independent torch transcription of the reference formulas
(Caption_distill_double.py:473-545 train branch, :402-472 test branch),
including the -10000 pad mask, WTA re-weighting, and evidence spatial
softmax. Uses pre-computed features so only the aggregation math is under
test (the towers have their own parity tests)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from leclip_tpu.models.dense_clip import _aggregate_local

B, P, C, E = 3, 11, 5, 16
SCALE = 4.0
TMP = 50.0


@pytest.fixture()
def feats(rng):
    def unit(shape):
        x = rng.normal(size=shape).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    spatial = unit((B, P, E))
    text_neg = unit((C, E))
    text_evd = unit((C, E))
    # pad mask: last positions of each row are pads
    pad = np.zeros((B, P), np.float32)
    pad[0, 8:] = -10000.0
    pad[1, 5:] = -10000.0
    return spatial, text_neg, text_evd, pad


def torch_reference_local(spatial, text_neg, text_evd, pad, use_evidence):
    """Direct transcription of the reference train-branch math (permute
    conventions included): logits_neg [L,B,C], mask add, WTA, spatial softmax
    over dim 0, weighted sum."""
    image_features = torch.tensor(spatial).permute(1, 0, 2)   # [L, B, E]
    tn = torch.tensor(text_neg)
    logits_neg = image_features @ tn.t()                      # [L, B, C]
    text_mask = torch.tensor(pad)                             # [B, L]
    logits_neg = logits_neg.permute(2, 1, 0) + text_mask[None, :, :]
    logits_neg = logits_neg.permute(2, 1, 0)
    if use_evidence:
        te = torch.tensor(text_evd)
        logits_evd = image_features @ te.t()
        logits_evd = logits_evd.permute(2, 1, 0) + text_mask[None, :, :]
        logits_evd = logits_evd.permute(2, 1, 0)
        w = torch.nn.functional.softmax(
            TMP * logits_neg * (logits_neg.max(-1)[0].unsqueeze(-1) + 1), -1
        )
        logits_neg = logits_neg * w
        prob = torch.nn.functional.softmax(logits_evd * TMP, dim=0)
    else:
        prob = torch.nn.functional.softmax(logits_neg * TMP, dim=0)
    return torch.sum(SCALE * logits_neg * prob, dim=0).numpy()  # [B, C]


@pytest.mark.parametrize("use_evidence", [False, True], ids=["plain", "evidence"])
def test_aggregate_local_matches_reference_math(feats, use_evidence):
    spatial, text_neg, text_evd, pad = feats
    expect = torch_reference_local(spatial, text_neg, text_evd, pad, use_evidence)
    tf = {"neg": jnp.asarray(text_neg), "evd": jnp.asarray(text_evd)}
    got, _ = _aggregate_local(
        jnp.asarray(spatial), tf, SCALE, TMP, use_evidence,
        pos_mask=jnp.asarray(pad),
    )
    # our numerically-stable restructure must agree at valid positions; pad
    # contributions in the reference are O(exp(-5e5)) ≈ 0
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("use_evidence", [False, True], ids=["plain", "evidence"])
def test_aggregate_local_test_branch_no_mask(feats, use_evidence):
    """Test branch: spatial positions without pad mask (HW grid)."""
    spatial, text_neg, text_evd, _ = feats
    pad = np.zeros((B, P), np.float32)
    expect = torch_reference_local(spatial, text_neg, text_evd, pad, use_evidence)
    tf = {"neg": jnp.asarray(text_neg), "evd": jnp.asarray(text_evd)}
    got, _ = _aggregate_local(jnp.asarray(spatial), tf, SCALE, TMP, use_evidence)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-5)


def test_retrieval_augment_matches_reference():
    """Top-10 retrieval mean-merge (ref :444-448), exact top-k."""
    rng = np.random.default_rng(1)
    gf = rng.normal(size=(4, E)).astype(np.float32)
    gf /= np.linalg.norm(gf, axis=-1, keepdims=True)
    bank = rng.normal(size=(100, E)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)

    image_feature_ = torch.tensor(gf)
    cap = torch.tensor(bank)
    sim = image_feature_ @ cap.t()
    topk_scores, topk_idx = sim.topk(10, -1)
    sel = cap[topk_idx.view(-1)].view(-1, 10, E).mean(1)
    expect = torch.cat([image_feature_[:, None], sel[:, None]], 1).mean(1).numpy()

    from leclip_tpu.models.dense_clip import retrieval_augment

    got, scores = retrieval_augment(jnp.asarray(gf), jnp.asarray(bank), 10, exact=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), topk_scores.numpy(), rtol=1e-5)


def test_retrieval_augment_large_bank_rescored():
    """Big-bank branch: bf16 search + exact fp32 rescore of the selected k —
    returned scores must match the exact-fp32 path wherever the approximate
    search picked the same captions (always on CPU, where approx == exact)."""
    rng = np.random.default_rng(2)
    gf = rng.normal(size=(3, E)).astype(np.float32)
    gf /= np.linalg.norm(gf, axis=-1, keepdims=True)
    bank = rng.normal(size=(5000, E)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)

    from leclip_tpu.models.dense_clip import retrieval_augment

    got_a, scores_a = retrieval_augment(jnp.asarray(gf), jnp.asarray(bank), 10)
    got_e, scores_e = retrieval_augment(jnp.asarray(gf), jnp.asarray(bank), 10,
                                        exact=True)
    # scores are fp32 exact in both branches; the bf16 search may order
    # near-ties differently, so compare as sorted sets with a bf16-level tol
    np.testing.assert_allclose(
        np.sort(np.asarray(scores_a)), np.sort(np.asarray(scores_e)), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(got_e), atol=2e-2)
    # the approximate branch re-sorts its fp32 rescores — the top-k-descending
    # contract holds in both branches
    sa = np.asarray(scores_a)
    assert (np.diff(sa, axis=-1) <= 1e-7).all(), sa
