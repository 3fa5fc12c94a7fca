"""Evaluator metrics: AP/mAP vs independent references, merge-aux behavior."""

import numpy as np
import pytest

from leclip_tpu.engine.evaluator import (
    MLClassificationEvaluator,
    average_precision,
    mAP,
    overall_and_perclass_f1,
)


def test_ap_perfect_ranking():
    scores = np.array([0.9, 0.8, 0.1, 0.05])
    targets = np.array([1, 1, 0, 0])
    assert average_precision(scores, targets) == pytest.approx(1.0, abs=1e-6)


def test_ap_vs_sklearn(rng):
    from sklearn.metrics import average_precision_score

    for _ in range(5):
        scores = rng.normal(size=200)
        targets = (rng.random(200) < 0.2).astype(int)
        if targets.sum() == 0:
            targets[0] = 1
        ours = average_precision(scores, targets)
        theirs = average_precision_score(targets, scores)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_map_multiclass(rng):
    preds = rng.normal(size=(100, 7))
    targets = (rng.random((100, 7)) < 0.3).astype(int)
    targets[0] = 1
    m = mAP(targets, preds)
    assert 0 < m < 100


def test_evaluator_merge_and_zero_label():
    ev = MLClassificationEvaluator(gl_merge_rate=0.5)
    preds = np.array([[1.0, 0.0], [0.0, 1.0]])
    aux = np.array([[0.0, 1.0], [1.0, 0.0]])
    labels = np.zeros((2, 2))
    ev.process(preds, labels, aux)
    # unlabeled test → mAP forced 0 (reference behavior)
    assert ev.evaluate()["mAP"] == 0.0
    merged = ev.merged_predictions()
    np.testing.assert_allclose(merged, 0.5 * preds + 0.5 * aux)


def test_evaluator_labeled():
    ev = MLClassificationEvaluator()
    preds = np.array([[2.0, -1.0], [-1.0, 2.0], [2.0, -1.0]])
    labels = np.array([[1, 0], [0, 1], [1, 0]])
    ev.process(preds, labels)
    res = ev.evaluate()
    assert res["mAP"] == pytest.approx(100.0)
    assert "OF1" in res and "CF1" in res


def test_f1_suite_sane():
    preds = np.array([[0.9, 0.1, 0.5, 0.2], [0.1, 0.8, 0.6, 0.3]])
    targets = np.array([[1, 0, 1, 0], [0, 1, 1, 0]])
    m = overall_and_perclass_f1(targets, preds, topk=2)
    assert m["OP"] == pytest.approx(1.0)
    assert m["OR"] == pytest.approx(1.0)
