"""Closed-loop accuracy machinery for the ensemble stage: learned per-class
routing (ops/ensemble.learn_routing — the programmatic analogue of the
reference's hand-picked table, gen_final_ans.py:143-149) and the caption
benchmark scorer (inference/caption_eval.py)."""

import jax
import numpy as np
import pytest

from leclip_tpu.engine.evaluator import mAP
from leclip_tpu.inference.caption_eval import (caption_windows,
                                               score_caption_benchmark,
                                               window_masks)
from leclip_tpu.models.clip import CLIPConfig, init_clip_params
from leclip_tpu.models.dense_clip import NEG_MASK_VALUE, DenseFlags
from leclip_tpu.models.prompt import build_prompt_learner
from leclip_tpu.inference.tta import build_model_spec
from leclip_tpu.ops.ensemble import (learn_routing, model_result,
                                     route_ensemble)

TINY = CLIPConfig(
    embed_dim=32, image_resolution=64, vision_layers=(1, 1, 1, 1), vision_width=8,
    vision_patch_size=None, vocab_size=49408, transformer_width=64,
    transformer_heads=2, transformer_layers=2,
)
CLASSNAMES = ["dog", "cat", "person", "pizza"]


def _specialist_scores(rng, labels, good_classes, noise=1.2):
    """Member scores: informative on `good_classes`, noise elsewhere."""
    n, c = labels.shape
    base = rng.normal(0, noise, (n, c))
    for cls in good_classes:
        base[:, cls] += 2.5 * labels[:, cls]
    return base.astype(np.float32)


def test_learned_routing_beats_best_single_member():
    """The core closed-loop property: per-class routing fit on a val split
    beats every individual member on the disjoint test split."""
    rng = np.random.default_rng(0)
    n, c = 4000, 20
    labels = (rng.random((n, c)) < 0.15).astype(np.float32)
    specialties = {
        "best": range(0, 8),
        "ema": range(8, 13),
        "diff": range(13, 17),
        "difft": range(17, 20),
    }
    scores = {m: _specialist_scores(rng, labels, cls)
              for m, cls in specialties.items()}
    val = np.arange(0, n, 2)
    test = np.arange(1, n, 2)
    routing = learn_routing({m: s[val] for m, s in scores.items()},
                            labels[val], base="best", margin=0.01)
    routed = route_ensemble({m: s[test] for m, s in scores.items()},
                            routing, base="best")
    routed_mAP = mAP(labels[test], routed)
    member_mAPs = {m: mAP(labels[test], s[test]) for m, s in scores.items()}
    assert routed_mAP > max(member_mAPs.values()) + 1.0, (
        routed_mAP, member_mAPs)
    # specialists get (most of) their own classes; base keeps its own
    assert not any(cls < 8 for cols in routing.values() for cls in cols)
    for m in ("ema", "diff", "difft"):
        assert len(set(routing.get(m, [])) & set(specialties[m])) >= 3


def test_learn_routing_margin_and_base_guards():
    rng = np.random.default_rng(1)
    labels = (rng.random((400, 6)) < 0.3).astype(np.float32)
    scores = {m: rng.normal(0, 1, labels.shape).astype(np.float32)
              for m in ("best", "ema")}
    # an impossible margin yields an empty (all-base) table
    assert learn_routing(scores, labels, base="best", margin=10.0) == {}
    # the base member never appears as a routed specialist
    r = learn_routing(scores, labels, base="best", margin=-10.0)
    assert "best" not in r
    with pytest.raises(ValueError):
        learn_routing(scores, labels, base="missing")
    # classes with no validation positives stay on the base
    labels[:, 3] = 0.0
    r = learn_routing(scores, labels, base="best", margin=-10.0)
    assert not any(3 in cols for cols in r.values())


def test_learn_routing_noise_guards():
    """min_pos and confirm_splits suppress routing decisions that are pure
    validation noise (equal-quality members → any AP gap is luck)."""
    rng = np.random.default_rng(2)
    n, c = 600, 30
    labels = (rng.random((n, c)) < 0.1).astype(np.float32)
    signal = 2.0 * labels
    scores = {m: (signal + rng.normal(0, 1.5, (n, c))).astype(np.float32)
              for m in ("best", "ema", "diff")}
    loose = learn_routing(scores, labels, base="best", margin=0.0)
    guarded = learn_routing(scores, labels, base="best", margin=0.0,
                            min_pos=30, confirm_splits=3)
    n_loose = sum(len(v) for v in loose.values())
    n_guarded = sum(len(v) for v in guarded.values())
    assert n_guarded < n_loose  # guards prune noise-routed classes
    # real specialists survive the guards: give 'ema' a true edge on class 0
    strong = {m: s.copy() for m, s in scores.items()}
    strong["ema"][:, 0] += 3.0 * labels[:, 0]
    r = learn_routing(strong, labels, base="best", margin=0.02,
                      min_pos=10, confirm_splits=3)
    assert 0 in r.get("ema", [])


def test_caption_windows_cover_each_scale():
    wins = caption_windows(77, scales=(2, 3, 4))
    assert wins.shape == (9, 2)
    off = 0
    for s in (2, 3, 4):
        seg = wins[off:off + s]
        assert seg[0, 0] == 0 and seg[-1, 1] == 77
        assert (seg[1:, 0] == seg[:-1, 1]).all()  # contiguous, no gaps
        off += s
    masks = window_masks(wins, 77)
    assert masks.shape == (9, 77)
    # every position is inside exactly one window per scale → 3 total
    inside = (masks > NEG_MASK_VALUE / 2).sum(0)
    assert (inside == 3).all()


def test_score_caption_benchmark_end_to_end():
    """Tiny end-to-end: two trained-shape members scored over a padded batch
    tail, outputs feed model_result/route_ensemble unchanged."""
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    specs = {}
    for i, name in enumerate(["best", "ema"]):
        trainable, constants = build_prompt_learner(
            jax.random.PRNGKey(i), clip_params, CLASSNAMES, n_ctx=4)
        specs[name] = build_model_spec(
            clip_params, TINY, trainable, constants,
            DenseFlags(use_evidence=(name == "best")))
    rng = np.random.default_rng(0)
    tokens = np.zeros((11, 77), np.int32)
    lens = rng.integers(5, 70, size=11)
    for r, ln in enumerate(lens):
        tokens[r, :ln] = rng.integers(1, 1000, size=ln)
        tokens[r, ln - 1] = 49407  # EOT = argmax position
    bank = np.asarray(rng.normal(size=(32, TINY.embed_dim)), np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)

    per_model, sims = score_caption_benchmark(
        clip_params, TINY, specs, tokens, bank=jax.numpy.asarray(bank),
        batch_size=8, topk=5)
    assert set(per_model) == {"best", "ema"}
    for outs in per_model.values():
        assert outs["output"].shape == (11, 4)
        assert outs["output_pos"].shape == (11, 4)
        assert outs["output_blocks"].shape == (11, 9, 4)
        assert outs["output_pos_blocks"].shape == (11, 9, 4)
        assert all(np.isfinite(v).all() for v in outs.values())
    assert sims.shape == (11, 9, 5)
    # retrieval scores are cosines of normalised vectors
    assert np.abs(sims).max() <= 1.0 + 1e-4

    fused = {m: model_result(o, sims, use_fuse6=(m == "best"))
             for m, o in per_model.items()}
    routed = route_ensemble(fused, {"ema": [1, 3]}, base="best")
    assert routed.shape == (11, 4)
    np.testing.assert_array_equal(routed[:, [1, 3]], fused["ema"][:, [1, 3]])
    np.testing.assert_array_equal(routed[:, [0, 2]], fused["best"][:, [0, 2]])

    # batch-size independence: the pad tail must not leak into real rows
    per_model4, sims4 = score_caption_benchmark(
        clip_params, TINY, specs, tokens, bank=jax.numpy.asarray(bank),
        batch_size=4, topk=5)
    np.testing.assert_allclose(
        per_model4["best"]["output"], per_model["best"]["output"],
        rtol=0, atol=2e-5)
    np.testing.assert_allclose(sims4, sims, rtol=0, atol=2e-5)
