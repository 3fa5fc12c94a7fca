"""Loss library — functional JAX ports of every loss the reference ships.

Semantics mirrors (ref file:line):
* ranking_loss / ranking_loss_with_cooccurrence / ranking_loss_reweighting —
  project/my_code/trainers/utils.py:85-124
* soft_cross_entropy / softmax_sigmoid_BCE / norm_logits_BCE /
  sigmoid_focal — utils.py:10-50
* asymmetric loss (ASL, partial + full) — utils.py:126-190
* KL distillation (batchmean, the EMA loss) — Caption_distill_double.py:792,810-811
* ResampleLoss (Distribution-Balanced Loss) — trainers/dbl.py:263-445
* SoftMarginHingeEmbedding (LMPT) — trainers/csel.py:6-29

All are pure functions of (logits, labels, …) so they jit/grad cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# --------------------------- ranking family ---------------------------------


def ranking_loss(y_pred, y_true, scale=1.0, margin=1.0):
    """Pairwise margin hinge: for every (negative i, positive j) class pair,
    penalise margin - pred_j + pred_i. Sum over pairs, mean over batch."""
    y_pred = y_pred * scale
    y_true = y_true.astype(jnp.float32)
    tmp = margin - y_pred[:, None, :] + y_pred[:, :, None]  # [B, i, j]
    partial = jnp.maximum(0.0, tmp)
    loss = partial * y_true[:, None, :] * (1.0 - y_true[:, :, None])
    return loss.sum(axis=(-2, -1)).mean()


def cooccurrence_weights(cooccurrence: jnp.ndarray) -> jnp.ndarray:
    """log(1/P) pair weights, diagonal zeroed, row-mean normalised
    (ref utils.py:99-103)."""
    w = jnp.log(1.0 / (cooccurrence + 1e-6))
    w = w * (1.0 - jnp.eye(w.shape[0], dtype=w.dtype))
    return w / w.mean(axis=-1, keepdims=True)


def ranking_loss_with_cooccurrence(y_pred, y_true, cooccurrence, scale=1.0, margin=1.0):
    y_pred = y_pred * scale
    y_true = y_true.astype(jnp.float32)
    tmp = margin - y_pred[:, None, :] + y_pred[:, :, None]
    partial = jnp.maximum(0.0, tmp) * cooccurrence_weights(cooccurrence)
    loss = partial * y_true[:, None, :] * (1.0 - y_true[:, :, None])
    return loss.sum(axis=(-2, -1)).mean()


def ranking_loss_reweighting(y_pred, y_true, class_weights, scale=1.0, margin=1.0):
    y_pred = y_pred * scale
    y_true = y_true.astype(jnp.float32)
    tmp = margin - y_pred[:, None, :] + y_pred[:, :, None]
    partial = jnp.maximum(0.0, tmp)
    loss = partial * y_true[:, None, :] * (1.0 - y_true[:, :, None]) * class_weights[None, None, :]
    return loss.sum(axis=(-2, -1)).mean()


# --------------------------- CE / BCE family --------------------------------


def soft_cross_entropy(pred, soft_targets):
    logp = jax.nn.log_softmax(pred, axis=-1)
    return (-soft_targets * logp).sum(axis=1).mean()


def _bce_with_logits(logits, targets):
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def norm_logits_bce(pred, targets):
    return _bce_with_logits(pred, targets.astype(pred.dtype)).mean()


def softmax_sigmoid_bce(pred, targets):
    prob = jnp.clip(jax.nn.softmax(pred, axis=1), 1e-8, 1 - 1e-8)
    logit = jnp.log(prob / (1 - prob))
    return _bce_with_logits(logit, targets.astype(pred.dtype)).mean()


def sigmoid_focal_loss(inputs, targets, alpha=-1.0, gamma=2.0):
    """Soft-label focal: weight BCE by |t - p|^gamma (ref utils.py:25-50)."""
    p = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets.astype(inputs.dtype))
    loss = ce * jnp.abs(targets - p) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean()


def kl_distill_loss(student_logits, teacher_logits):
    """KLDivLoss(reduction='batchmean')(log_softmax(s), softmax(t)) — the EMA
    distillation term."""
    logp_s = jax.nn.log_softmax(student_logits, axis=-1)
    p_t = jax.nn.softmax(teacher_logits, axis=-1)
    logp_t = jax.nn.log_softmax(teacher_logits, axis=-1)
    return (p_t * (logp_t - logp_s)).sum() / student_logits.shape[0]


# --------------------------- asymmetric loss --------------------------------


def asymmetric_loss(
    x, y, gamma_neg=2.0, gamma_pos=1.0, clip=0.05, eps=1e-8,
    thresh_pos=0.9, thresh_neg=-0.9, partial=True,
):
    """ASL with asymmetric clipping + focusing; ``partial`` sums/B (dualcoop)
    vs mean (full-label)."""
    xs_pos = jax.nn.sigmoid(x)
    xs_neg = 1.0 - xs_pos
    if clip and clip > 0:
        xs_neg = jnp.clip(xs_neg + clip, max=1.0)
    y_pos = (y > thresh_pos).astype(x.dtype)
    y_neg = (y < thresh_neg).astype(x.dtype)
    loss = y_pos * jnp.log(jnp.clip(xs_pos, min=eps)) + y_neg * jnp.log(jnp.clip(xs_neg, min=eps))
    pt = jax.lax.stop_gradient(xs_pos * y_pos + xs_neg * y_neg)
    one_sided_gamma = gamma_pos * y_pos + gamma_neg * y_neg
    loss = loss * jax.lax.stop_gradient((1 - pt) ** one_sided_gamma)
    if partial:
        return -loss.sum() / x.shape[0]
    return -loss.mean()


def dualcoop_loss(inputs, targets):
    return asymmetric_loss(inputs, targets, thresh_pos=0.9, thresh_neg=-0.9, partial=True)


def asl_loss(inputs, targets):
    return asymmetric_loss(inputs, targets, thresh_pos=0.9, thresh_neg=0.9, partial=False)


# --------------------------- Distribution-Balanced --------------------------


class ResampleLossParams(NamedTuple):
    """Static DBL parameters derived from the class-frequency statistics."""

    class_freq: jnp.ndarray       # [C]
    train_num: float
    reweight_func: str = "rebalance"   # 'rebalance' | 'inv' | 'sqrt_inv' | ''
    focal: bool = False
    focal_gamma: float = 2.0
    focal_balance: float = 2.0
    map_alpha: float = 0.1
    map_beta: float = 10.0
    map_gamma: float = 0.2
    neg_scale: float = 1.0
    init_bias_factor: float = 0.0
    loss_weight: float = 1.0


def make_resample_loss_params(
    class_freq, neg_class_freq, **kwargs
) -> ResampleLossParams:
    class_freq = jnp.asarray(class_freq, jnp.float32)
    train_num = float(class_freq[0] + jnp.asarray(neg_class_freq, jnp.float32)[0])
    return ResampleLossParams(class_freq=class_freq, train_num=train_num, **kwargs)


def resample_loss(logits, labels, p: ResampleLossParams):
    """Distribution-Balanced Loss (rebalanced weighted BCE with optional
    logit regularisation and focal term), matching dbl.py:263-445 with the
    trainer's config (rebalance, focal off, empty logit_reg)."""
    labels = labels.astype(jnp.float32)
    freq_inv = 1.0 / p.class_freq

    if p.reweight_func == "rebalance":
        repeat_rate = (labels * freq_inv).sum(axis=1, keepdims=True)
        pos_weight = freq_inv[None, :] / repeat_rate
        weight = jax.nn.sigmoid(p.map_beta * (pos_weight - p.map_gamma)) + p.map_alpha
    elif p.reweight_func in ("inv", "sqrt_inv"):
        w = p.train_num / p.class_freq
        if p.reweight_func == "sqrt_inv":
            w = jnp.sqrt(w)
        weight = jnp.broadcast_to(w[None, :], labels.shape)
    else:
        weight = jnp.ones_like(labels)

    if p.init_bias_factor:
        init_bias = (
            -jnp.log(p.train_num / p.class_freq - 1.0) * p.init_bias_factor / p.neg_scale
        )
        logits = logits + init_bias
    if p.neg_scale != 1.0:
        logits = logits * (1 - labels) * p.neg_scale + logits * labels
        weight = weight / p.neg_scale * (1 - labels) + weight * labels

    bce = _bce_with_logits(logits, labels)
    if p.focal:
        pt = jnp.exp(-bce)
        loss = p.focal_balance * ((1 - pt) ** p.focal_gamma) * weight * bce
    else:
        loss = weight * bce
    return p.loss_weight * loss.mean()


# --------------------------- LMPT hinge --------------------------------------


def soft_margin_hinge_loss(inputs, labels, class_counts, margin=0.2, gamma=2.0):
    """Class-frequency-scaled soft-margin hinge over per-(class, token)
    cosine distances (ref csel.py:6-29 + application
    Caption_distill_double.py:863-886). ``inputs``/``labels``: [B, C, L]."""
    dot = (inputs * labels).sum(axis=2)  # [B, C]
    cc = jnp.asarray(class_counts, jnp.float32)[None, :]
    m = margin / jnp.sqrt(jnp.sqrt(cc))
    hinge = jnp.maximum(0.0, m - dot)
    cw = (1.0 / cc) ** gamma
    cw = cw / cw.sum(axis=1, keepdims=True)
    return (hinge * cw).sum() / inputs.shape[0]


def lmpt_hinge_from_embeddings(caption_embeds, prompt_embeds, labels, class_counts,
                               m_ctx=2, margin=0.2, gamma=2.0):
    """Build the LMPT hinge inputs from raw embeddings: x = 1 - cos(caption
    token emb, prompt emb), y = ±1 from labels (ref :876-882)."""
    L = caption_embeds.shape[1] - m_ctx
    a = caption_embeds[:, :L, :][:, None]            # [B, 1, L, D]
    b = prompt_embeds[:, m_ctx:, :][None]            # [1, C, L, D]
    cos = (a * b).sum(-1) / (
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
    )
    x = 1.0 - cos                                     # [B, C, L]
    y = 2.0 * labels[:, :, None] - 1.0
    y = jnp.broadcast_to(y, x.shape)
    return soft_margin_hinge_loss(x, y, class_counts, margin=margin, gamma=gamma)
