"""Labeled caption benchmark scoring — the captions-as-images analogue of the
image TTA path, used to close the accuracy loop on the ensemble machinery.

The competition test images are unlabeled, and real CLIP weights are
unobtainable in this environment (zero egress), so images carry no label
signal under random towers. Captions do: the method's core trick is that the
frozen TEXT tower is shared between training captions and the learned
prompts (ref trainers/Caption_distill_double.py:473-545 — "texts as images"),
so trained prompts genuinely separate held-out labeled captions (probe mAP
rises over training; tests/test_recipes.py).

This module extends that symmetry to the ensemble stage: the image test path
scores multi-scale crop BLOCKS (ref Caption_distill_double.py:641-724) and
fuses them (gen_final_ans.py:18-71); here the token axis plays the spatial
axis, so a "block" is a contiguous token window of the caption, scored with
the same `_aggregate_local` the train/test branches share, and the
model-independent block retrieval sims come from the window-mean feature
against the caption bank — exactly the role the crop-block retrieval plays
at test time (ref :444-448). Outputs use the same per-model dict layout the
fusion/routing stage consumes (`output`, `output_blocks`, `output_pos`,
`output_pos_blocks` + `sims_blocks`), so `ops.ensemble.model_result` /
`route_ensemble` run unchanged on top.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dense_clip import (NEG_MASK_VALUE, CaptionFeatures,
                                 _aggregate_local, _normalize, _scales,
                                 encode_captions, retrieval_augment)
from .tta import ModelSpec


def caption_windows(n_pos: int = 77, scales: Sequence[int] = (2, 3, 4)) -> np.ndarray:
    """Contiguous token windows per scale — the 1-D analogue of the test
    loop's multi-scale crop grid (TEST.multi_scale (2,3,4) → s windows at
    scale s, like s×s crops per scale). Returns [n_blocks, 2] start/end."""
    wins = []
    for s in scales:
        edges = np.round(np.linspace(0, n_pos, s + 1)).astype(np.int64)
        wins.extend((int(edges[i]), int(edges[i + 1])) for i in range(s))
    return np.asarray(wins, np.int64)


def window_masks(windows: np.ndarray, n_pos: int = 77) -> np.ndarray:
    """[n_blocks, P] additive masks: 0 inside the window, -10000 outside
    (composes with the caption pad mask by addition, like the reference's
    pad handling)."""
    pos = np.arange(n_pos)
    inside = (pos[None, :] >= windows[:, :1]) & (pos[None, :] < windows[:, 1:])
    return np.where(inside, 0.0, NEG_MASK_VALUE).astype(np.float32)


def _window_mean_feats(feats: CaptionFeatures, wmasks: jnp.ndarray) -> jnp.ndarray:
    """L2-normalised mean token feature per window — the analogue of a crop
    block's global feature. [n_blocks, B, E]."""
    valid = (feats.pos_mask[None, :, :] + wmasks[:, None, :]) > NEG_MASK_VALUE / 2
    v = valid[..., None].astype(feats.spatial_feats.dtype)  # [W, B, P, 1]
    summed = jnp.einsum("wbp,bpe->wbe", v[..., 0], feats.spatial_feats)
    count = jnp.maximum(v.sum(axis=2), 1.0)  # [W, B, 1]
    return _normalize(summed / count)


def member_caption_scores(
    spec: ModelSpec, feats: CaptionFeatures, wmasks: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Score one ensemble member on a caption batch → the per-model dict the
    fusion stage consumes. Train-branch scales (the caption benchmark IS the
    texts-as-images branch; ref :473-545)."""
    tf = spec.text_feats
    logit_scale, tmp_scale = _scales(spec.trainable, spec.flags, train=True)
    out_global = logit_scale * feats.global_feat @ tf["pos"].T
    out_local, _ = _aggregate_local(
        feats.spatial_feats, tf, logit_scale, tmp_scale,
        spec.flags.use_evidence, feats.pos_mask,
    )
    wmeans = _window_mean_feats(feats, wmasks)  # [W, B, E]
    g_blocks = logit_scale * jnp.einsum("wbe,ce->wbc", wmeans, tf["pos"])

    def one_window(wm):
        loc, _ = _aggregate_local(
            feats.spatial_feats, tf, logit_scale, tmp_scale,
            spec.flags.use_evidence, feats.pos_mask + wm[None, :],
        )
        return loc

    l_blocks = jax.vmap(one_window)(wmasks)  # [W, B, C]
    return {
        "output": out_global,
        "output_pos": out_local,
        "output_blocks": jnp.transpose(g_blocks, (1, 0, 2)),
        "output_pos_blocks": jnp.transpose(l_blocks, (1, 0, 2)),
    }


def caption_sims_blocks(
    feats: CaptionFeatures, bank: jnp.ndarray, wmasks: jnp.ndarray, topk: int = 10
) -> jnp.ndarray:
    """Model-independent per-block retrieval sims [B, n_blocks, k]: window-mean
    feature vs the caption bank (the role crop-block retrieval plays in the
    image test loop, ref :444-448). Computed once per batch, shared by every
    member — same sharing the TTA engine does."""
    wmeans = _window_mean_feats(feats, wmasks)  # [W, B, E]
    w, b, e = wmeans.shape

    _, scores = retrieval_augment(wmeans.reshape(w * b, e), bank, topk)
    return jnp.transpose(scores.reshape(w, b, -1), (1, 0, 2))


def score_caption_benchmark(
    clip_params: dict,
    clip_cfg,
    specs: Dict[str, ModelSpec],
    tokens: np.ndarray,
    bank: jnp.ndarray = None,
    scales: Sequence[int] = (2, 3, 4),
    batch_size: int = 256,
    topk: int = 10,
) -> Tuple[Dict[str, Dict[str, np.ndarray]], np.ndarray]:
    """Score every member over a tokenized caption set.

    Returns (per-model output dicts, sims_blocks) in numpy, ready for
    `ops.ensemble.model_result` / `generate_final_answers`. Caption features
    and block retrieval are computed ONCE per batch and shared across members
    (the same model-independent sharing the TTA engine does for image
    features; ref re-runs the encoder per member, :631)."""
    any_spec = next(iter(specs.values()))
    n_pos = int(tokens.shape[1])
    wmasks_np = window_masks(caption_windows(n_pos, scales), n_pos)
    wmasks = jnp.asarray(wmasks_np)

    @jax.jit
    def encode(clip_p, caps):
        return encode_captions(clip_p, clip_cfg, caps, any_spec.flags)

    member_fns = {}
    for name, spec in specs.items():
        member_fns[name] = jax.jit(
            lambda feats, spec=spec: member_caption_scores(spec, feats, wmasks)
        )

    sims_fn = None
    if bank is not None:
        sims_fn = jax.jit(
            lambda feats, bank_: caption_sims_blocks(feats, bank_, wmasks, topk)
        )

    n = len(tokens)
    bs = min(batch_size, n)
    outs: Dict[str, Dict[str, list]] = {m: {} for m in specs}
    sims_chunks = []
    for i in range(0, n, bs):
        chunk = tokens[i:i + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        feats = encode(clip_params, jnp.asarray(chunk))
        k = bs - pad
        for name, fn in member_fns.items():
            res = fn(feats)
            for key, v in res.items():
                outs[name].setdefault(key, []).append(
                    np.asarray(v[:k], np.float32))
        if sims_fn is not None:
            sims_chunks.append(np.asarray(sims_fn(feats, bank)[:k], np.float32))
        else:
            nb = wmasks_np.shape[0]
            sims_chunks.append(np.zeros((k, nb, topk), np.float32))
    per_model = {
        m: {key: np.concatenate(v) for key, v in d.items()}
        for m, d in outs.items()
    }
    return per_model, np.concatenate(sims_chunks)
