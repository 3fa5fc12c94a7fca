"""Goldens for the full-MLC metric bulk vs the reference's OWN executed code:
``AveragePrecisionMeter`` (value / overall / overall_topk), ``ComputeAP_VOC``
and ``Compute_mAP_VOC2012`` (ref Dassl dassl/evaluation/evaluator.py:251-473).

These close the last §2.6 evaluator row: the meter is dead code in the
competition path (nothing in my_code constructs it) but part of the
reference's evaluation surface, so it is rebuilt and pinned here.
"""

import os

import numpy as np
import pytest

from leclip_tpu.engine.evaluator import (AveragePrecisionMeter, voc2012_mAP,
                                         voc_ap)
from tests._refshim import REFERENCE_ROOT, extract_functions

EVAL_PATH = os.path.join(
    REFERENCE_ROOT,
    "project/my_code/Dassl.pytorch-master/dassl/evaluation/evaluator.py",
)


def _ref_ns():
    return extract_functions(
        EVAL_PATH,
        ["AveragePrecisionMeter", "ComputeAP_VOC", "Compute_mAP_VOC2012"],
    )


def _data(seed, n=60, k=7, difficult=False):
    """Continuous scores (no ties — torch sort vs numpy stable argsort may
    order ties differently) and targets in {0,1} or {-1,0,1}."""
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(n, k))
    if difficult:
        targets = rng.choice([-1, 0, 1], size=(n, k), p=[0.4, 0.2, 0.4])
        # every class needs ≥1 positive: the reference's scalar AP loop
        # raises ZeroDivisionError otherwise (ours returns nan)
        targets[0] = 1
    else:
        targets = (rng.random((n, k)) < 0.35).astype(np.int64)
        targets[0] = 1
    return scores, targets


@pytest.mark.parametrize("difficult", [False, True])
def test_meter_value_matches_reference(difficult):
    ns = _ref_ns()
    scores, targets = _data(0, difficult=difficult)

    ref = ns["AveragePrecisionMeter"](difficult_examples=difficult)
    ref.add(scores.astype(np.float32), targets)
    want = np.asarray(ref.value())

    ours = AveragePrecisionMeter(difficult_examples=difficult)
    ours.add(scores, targets)
    np.testing.assert_allclose(ours.value(), want, rtol=1e-6)


def test_meter_streaming_chunks_equal_one_shot():
    scores, targets = _data(1)
    one = AveragePrecisionMeter()
    one.add(scores, targets)
    chunked = AveragePrecisionMeter()
    for lo in range(0, len(scores), 17):
        chunked.add(scores[lo:lo + 17], targets[lo:lo + 17])
    np.testing.assert_allclose(chunked.value(), one.value(), rtol=1e-12)
    np.testing.assert_allclose(chunked.overall(), one.overall(), rtol=1e-12)


def test_meter_overall_matches_reference():
    """Threshold-at-zero OP/OR/OF1/CP/CR/CF1, −1 targets as negatives
    (ref evaluator.py:371-380,398-422)."""
    ns = _ref_ns()
    scores, targets = _data(2, difficult=True)

    ref = ns["AveragePrecisionMeter"]()
    ref.add(scores.astype(np.float32), targets)
    want = np.asarray(ref.overall())

    ours = AveragePrecisionMeter()
    ours.add(scores, targets)
    np.testing.assert_allclose(np.asarray(ours.overall()), want, rtol=1e-6)


@pytest.mark.parametrize("k", [1, 3])
def test_meter_overall_topk_matches_reference(k):
    """Top-k slots predict positive only when the raw score is also ≥ 0
    (ref evaluator.py:382-396)."""
    ns = _ref_ns()
    scores, targets = _data(3)

    ref = ns["AveragePrecisionMeter"]()
    ref.add(scores.astype(np.float64), targets)
    want = np.asarray(ref.overall_topk(k))

    ours = AveragePrecisionMeter()
    ours.add(scores, targets)
    np.testing.assert_allclose(np.asarray(ours.overall_topk(k)), want,
                               rtol=1e-6)


def test_voc_ap_matches_reference():
    ns = _ref_ns()
    rng = np.random.default_rng(4)
    tp = np.cumsum(rng.random(50) < 0.4)
    fp = np.cumsum(rng.random(50) >= 0.4)
    recall = tp / max(tp[-1], 1)
    precision = tp / np.maximum(tp + fp, 1e-12)
    want = ns["ComputeAP_VOC"](recall, precision)
    np.testing.assert_allclose(voc_ap(recall, precision), want, rtol=1e-12)


def test_voc2012_map_matches_reference():
    ns = _ref_ns()
    rng = np.random.default_rng(5)
    n, c = 80, 12
    conf = rng.normal(size=(n, c))
    gt = (rng.random((n, c)) < 0.3).astype(np.float64)
    gt[0] = 1  # ≥1 positive per class (0/0 recall otherwise)
    pred = np.concatenate([conf, gt], axis=1)

    want = ns["Compute_mAP_VOC2012"](pred.copy(), c)
    np.testing.assert_allclose(voc2012_mAP(pred, c), want, rtol=1e-10)

    seen, unseen = list(range(8)), list(range(8, 12))
    want3 = ns["Compute_mAP_VOC2012"](pred.copy(), c, seen, unseen)
    got3 = voc2012_mAP(pred, c, seen, unseen)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3), rtol=1e-10)


def test_meter_empty_returns_zero_everywhere():
    # ADVICE r4: overall_topk on an empty meter must behave like overall()
    m = AveragePrecisionMeter()
    assert m.overall() == 0
    assert m.overall_topk(3) == 0
    assert m.value().shape == (0,)
