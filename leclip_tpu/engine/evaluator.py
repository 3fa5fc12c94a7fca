"""Multi-label evaluation: per-class average precision, mAP, OP/OR/OF1/CP/CR/CF1,
and the merge-aux evaluator.

Port of the reference metrics (ref: Dassl dassl/evaluation/evaluator.py:
average_precision :140-155, mAP :158-175, MLClassification :178-233 with the
``default_merge_aux`` global/local merge, and the OF1/CF1 suite :236-567).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """AP of one class: mean precision@i over positive ranks (identical
    formula to the reference, including the epsilon)."""
    eps = 1e-8
    order = scores.argsort()[::-1]
    t = targets[order]
    pos = t == 1
    pos_count = np.cumsum(pos)
    total = pos_count[-1] if len(pos_count) else 0
    prec_at_i = pos_count / np.arange(1, len(t) + 1)
    prec_at_i = prec_at_i[pos].sum()
    return float(prec_at_i / (total + eps))


def mAP(targets: np.ndarray, preds: np.ndarray) -> float:
    """Mean AP ×100 over classes; 0 for empty preds."""
    if preds.size == 0:
        return 0.0
    ap = [average_precision(preds[:, k], targets[:, k]) for k in range(preds.shape[1])]
    return float(100.0 * np.mean(ap))


def overall_and_perclass_f1(
    targets: np.ndarray, preds: np.ndarray, topk: int = 3
) -> Dict[str, float]:
    """OP/OR/OF1 (micro) and CP/CR/CF1 (macro) at top-k, the standard MLC
    operating-point metrics (ref evaluator.py:236-447)."""
    n, c = preds.shape
    pred_bin = np.zeros_like(preds, dtype=bool)
    topk_idx = np.argsort(-preds, axis=1)[:, :topk]
    np.put_along_axis(pred_bin, topk_idx, True, axis=1)
    tp = (pred_bin & (targets == 1)).sum(0).astype(np.float64)
    pred_pos = pred_bin.sum(0).astype(np.float64)
    real_pos = (targets == 1).sum(0).astype(np.float64)

    op = tp.sum() / max(pred_pos.sum(), 1e-8)
    orr = tp.sum() / max(real_pos.sum(), 1e-8)
    of1 = 2 * op * orr / max(op + orr, 1e-8)
    cp = np.mean(tp / np.maximum(pred_pos, 1e-8))
    cr = np.mean(tp / np.maximum(real_pos, 1e-8))
    cf1 = 2 * cp * cr / max(cp + cr, 1e-8)
    return {"OP": op, "OR": orr, "OF1": of1, "CP": cp, "CR": cr, "CF1": cf1}


class MLClassificationEvaluator:
    """Accumulates (global logits, labels, local logits); ``evaluate`` merges
    global/local with GL_merge_rate and reports mAP (0 when labels are all
    zero — the unlabeled competition test set, matching the reference)."""

    def __init__(self, gl_merge_rate: float = 0.5, topk: int = 3):
        self.gl_merge_rate = gl_merge_rate
        self.topk = topk
        self.reset()

    def reset(self):
        self._y_true: List[np.ndarray] = []
        self._y_pred: List[np.ndarray] = []
        self._y_pred_aux: List[np.ndarray] = []

    def process(self, mo, gt, mo_aux=None):
        self._y_true.append(np.asarray(gt))
        self._y_pred.append(np.asarray(mo))
        if mo_aux is not None:
            self._y_pred_aux.append(np.asarray(mo_aux))

    def merged_predictions(self) -> np.ndarray:
        preds = np.concatenate(self._y_pred, axis=0)
        if self._y_pred_aux:
            aux = np.concatenate(self._y_pred_aux, axis=0)
            r = self.gl_merge_rate
            preds = preds * r + aux * (1 - r)
        return preds

    def evaluate(self) -> Dict[str, float]:
        targets = np.concatenate(self._y_true, axis=0)
        preds = self.merged_predictions()
        results = {}
        if targets.sum() == 0:
            # unlabeled test split: mAP undefined → 0 (reference behavior)
            results["mAP"] = 0.0
        else:
            results["mAP"] = mAP(targets, preds)
            results.update(overall_and_perclass_f1(targets, preds, self.topk))
        return results
