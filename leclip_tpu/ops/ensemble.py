"""Ensemble post-processing: block fusion, co-occurrence modulation, and the
per-class model-routing merge emitting `impreds.json`.

Semantics parity (ref file:line in /root/reference):
* fuse / fuse6 similarity+variance-weighted block fusion —
  project/my_code/gen_final_ans.py:18-71
* per-model merge `out + 1.5·fuse(blocks) [+ 1.5·](aux + 1.5·fuse(aux_blocks))`
  and hand-picked per-class column routing — gen_final_ans.py:114-162
* test-time block aggregation α/β/γ(0.3) → 1.4·s_ag + global —
  Caption_distill_double.py:658-673
* co-occurrence score modulation `out += 0.5·(out @ P̂)` —
  Caption_distill_double.py:614-636

All fusion math is pure tensor code (numpy in, numpy out) so it golden-tests
trivially and can run jit-compiled on device or on host.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

# Per-class model routing from the winning submission (gen_final_ans.py:143-149)
DEFAULT_ROUTING: Dict[str, List[int]] = {
    "ema": [2, 6, 7, 8, 14, 16, 17, 25, 27, 31, 33, 34, 37, 38, 39, 40, 41, 43,
            49, 52, 57, 62, 67, 73, 74, 76],
    "zema": [0, 4, 21, 23, 32, 35, 45, 53, 54, 55, 58, 59, 61],
    "diff": [13, 22, 42, 78],
    "diffh": [24, 26, 47, 56],
    "difft": [1, 3, 12, 29, 36, 68, 72, 79],
}


def normalized_cooccurrence(adj: np.ndarray, nums: np.ndarray) -> np.ndarray:
    """P̂[i, j]: row-normalised P(j | i) from co-occurrence counts
    (ref :633-635)."""
    p = adj / nums[:, None]
    return p / p.sum(-1, keepdims=True)


def adjust_predictions(preds, p_matrix, weight: float = 0.5):
    """out + w·(out @ P̂) — boosts classes that co-occur with confident ones."""
    return preds + weight * (preds @ p_matrix)


def aggregate_blocks(block_scores, threshold: float = 0.3, coef: float = 1.4,
                     base=None):
    """Test-time block aggregation: per class take the max block score if the
    max clears `threshold`, else the min; scaled and added to the base/global
    score (ref :658-673). block_scores [N, n_blocks, C]."""
    alpha = block_scores.max(axis=1)
    beta = block_scores.min(axis=1)
    gamma = (alpha > threshold).astype(block_scores.dtype)
    s_ag = gamma * alpha + (1 - gamma) * beta
    return coef * s_ag if base is None else coef * s_ag + base


def fuse(data: np.ndarray, sims_blocks: np.ndarray, threshold: float = 0.2) -> np.ndarray:
    """Similarity- then variance-weighted block fusion (ref fuse :18-37).

    data [N, n_blocks, C]; sims_blocks [N, n_blocks, k] top-k caption sims."""
    sims = 1.0 + sims_blocks.mean(-1, keepdims=True)
    data = sims * data
    var = 1.0 + data.var(axis=2, keepdims=True, ddof=1)
    data = var * data
    alpha = data.max(axis=1)
    beta = data.min(axis=1)
    gamma = (alpha > threshold).astype(data.dtype)
    return gamma * alpha + (1 - gamma) * beta


def fuse6(data: np.ndarray, sims_blocks: np.ndarray, threshold: float = 0.2) -> np.ndarray:
    """Variance weighting applied twice — pre- and post-similarity weighting
    (ref fuse6 :39-71; used for the 'best' model only)."""
    var0 = 1.0 + data.var(axis=2, keepdims=True, ddof=1)
    sims = 1.0 + sims_blocks.mean(-1, keepdims=True)
    data_sim = sims * data
    var1 = 1.0 + data_sim.var(axis=2, keepdims=True, ddof=1)
    data = var0 * var1 * data_sim
    alpha = data.max(axis=1)
    beta = data.min(axis=1)
    gamma = (alpha > threshold).astype(data.dtype)
    return gamma * alpha + (1 - gamma) * beta


def model_result(
    outputs: Dict[str, np.ndarray],
    sims_blocks: np.ndarray,
    use_fuse6: bool = False,
    coef: float = 1.5,
    aux_coef: float = 1.0,
) -> np.ndarray:
    """Fused score of one model: (output + coef·fuse(blocks)) +
    aux_coef·(output_pos + coef·fuse(pos_blocks)) (ref :117-141; the 'best'
    model uses fuse6 and aux_coef 1.5)."""
    f = fuse6 if use_fuse6 else fuse
    o = outputs["output"] + coef * f(outputs["output_blocks"], sims_blocks)
    a = outputs["output_pos"] + coef * f(outputs["output_pos_blocks"], sims_blocks)
    return o + aux_coef * a


def routing_vector(
    model_names: Sequence[str],
    routing: Dict[str, List[int]] = DEFAULT_ROUTING,
    base: str = "best",
    n_cls: int = 80,
) -> np.ndarray:
    """class → model-index vector for gather-based routing (device-friendly
    alternative to column assignment)."""
    names = list(model_names)
    base_idx = names.index(base) if base in names else 0
    r = np.full(n_cls, base_idx, np.int32)
    for name, cols in routing.items():
        if name in names:
            valid = [c for c in cols if c < n_cls]
            r[valid] = names.index(name)
    return r


def learn_routing(
    per_model_val: Dict[str, np.ndarray],
    labels: np.ndarray,
    base: str = "best",
    margin: float = 0.0,
    min_pos: int = 1,
    confirm_splits: int = 1,
) -> Dict[str, List[int]]:
    """Fit a per-class routing table from validation scores.

    The reference's routing table (gen_final_ans.py:143-149) was hand-picked
    from validation results of the six members; this is the programmatic
    analogue: class ``c`` is routed to member ``m`` when m's validation AP on
    ``c`` exceeds the base member's by more than ``margin`` (and m is the
    argmax over members). The margin keeps the table sparse like the
    reference's (55 of 80 classes routed) and guards against routing on
    validation noise; two further guards for small validation sets:
    ``min_pos`` keeps a class on the base unless it has at least that many
    validation positives (AP over a handful of positives is noise), and
    ``confirm_splits=k`` additionally requires the specialist to beat the
    base on every one of k interleaved validation folds (routing decisions
    that flip between folds are overfit). Returns ``{member: [class
    columns]}`` for ``route_ensemble`` / ``routing_vector``, base omitted."""
    from ..engine.evaluator import average_precision

    names = [n for n in per_model_val if n != base]
    if base not in per_model_val:
        raise ValueError(f"base member {base!r} missing from per_model_val")
    if not names:  # single-member "ensemble": nothing to route
        return {}
    labels = np.asarray(labels)
    n_val, n_cls = labels.shape
    folds = [slice(None)]
    if confirm_splits > 1:
        folds += [np.arange(f, n_val, confirm_splits)
                  for f in range(confirm_splits)]
    ap = {
        name: np.array([
            [average_precision(per_model_val[name][fold, c],
                               labels[fold, c]) for c in range(n_cls)]
            for fold in folds
        ])  # [1 + confirm_splits, n_cls]
        for name in per_model_val
    }
    routing: Dict[str, List[int]] = {n: [] for n in names}
    for c in range(n_cls):
        if labels[:, c].sum() < max(min_pos, 1):
            continue  # too few validation positives — AP is noise, keep base
        cand = max(names, key=lambda n: ap[n][0, c])
        if ap[cand][0, c] > ap[base][0, c] + margin and (
                ap[cand][1:, c] > ap[base][1:, c]).all():
            routing[cand].append(c)
    return {n: cols for n, cols in routing.items() if cols}


def route_ensemble(
    per_model: Dict[str, np.ndarray],
    routing: Dict[str, List[int]] = DEFAULT_ROUTING,
    base: str = "best",
) -> np.ndarray:
    """Start from the base model's scores; overwrite each routed class column
    from its specialist model (ref :152-158). Falls back to the first model
    when the base is absent (single-model runs)."""
    if base not in per_model:
        base = next(iter(per_model))
    fused = per_model[base].copy()
    n_cls = fused.shape[1]
    for name, cols in routing.items():
        cols = [c for c in cols if c < n_cls]
        if name in per_model and cols:
            fused[:, cols] = per_model[name][:, cols]
    return fused


def generate_final_answers(
    data: Dict[str, Dict[str, np.ndarray]],
    sims_blocks: np.ndarray,
    routing: Dict[str, List[int]] = DEFAULT_ROUTING,
    base: str = "best",
    coef: float = 1.5,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Full gen_final_ans pipeline: per-model fusion → per-class routing →
    (optionally) the competition `impreds.json` list-of-lists file."""
    per_model = {}
    for name, outputs in data.items():
        per_model[name] = model_result(
            outputs, sims_blocks,
            use_fuse6=(name == base),
            coef=coef,
            aux_coef=1.5 if name == base else 1.0,
        )
    fused = route_ensemble(per_model, routing, base=base)
    if out_path:
        with open(out_path, "w") as f:
            json.dump([row.tolist() for row in np.asarray(fused, np.float64)], f)
    return fused
