"""DenseCLIP / CustomCLIP forwards — pure functions of (frozen CLIP params,
trainable prompt params, inputs).

Capability parity with the reference model cores (ref: project/my_code/
trainers/Caption_distill_double.py:310-559):

* **Train branch ("texts-as-images")**: captions run through the frozen text
  tower with ALL 77 positions kept; the EOT feature plays the global image
  feature and the per-token features play spatial features; pad positions are
  masked with -10000; Winner-Take-All re-weighting + evidence-prompt spatial
  softmax aggregate per-position logits into `logits_local` (:473-545).
* **Test branch**: frozen image tower gives a global feature (attention pool,
  no positional embedding) and a dense v/c-projected feature map; optional
  top-k retrieval augmentation against a caption feature bank; same WTA /
  evidence aggregation over spatial positions (:402-472).
* **CustomCLIP**: the global-logits-only variant (:310-352).

This symmetry (train on token positions, test on spatial positions) is the
core trick; both branches share `_aggregate_local` so it cannot drift.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .clip import CLIPConfig, clip_encode_image
from .prompt import assemble_prompts
from .resnet import project_dense
from .text import encode_text_embeds, encode_text_sequence
from .transformer import quick_gelu  # noqa: F401  (re-export convenience)

NEG_MASK_VALUE = -10000.0
FIXED_LOGIT_SCALE = 4.0


class DenseFlags(NamedTuple):
    """Static method flags (hashable → usable as jit static argument)."""

    use_evidence: bool = False
    learn_scale: bool = False
    learn_spatial_scale: bool = False
    spatial_scale_text: float = 50.0
    spatial_scale_image: float = 50.0
    neg_prompt_wcls: bool = True
    attention_impl: str = "auto"
    remat: bool = False


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def prompt_text_features(
    clip_params: dict,
    clip_cfg: CLIPConfig,
    trainable: dict,
    constants: dict,
    flags: DenseFlags,
    include_evidence: Optional[bool] = None,
    adapter: Optional[dict] = None,
) -> Dict[str, jnp.ndarray]:
    """Encode the three prompt sets → L2-normalised class embeddings.

    At test time call once and cache (the reference caches after the first
    batch, Caption_distill_double.py:421-439); at train time call per step —
    gradients flow into the learnable contexts."""
    prompts, prompts_neg, prompts_evd = assemble_prompts(
        trainable, constants, neg_prompt_wcls=flags.neg_prompt_wcls
    )
    heads = clip_cfg.transformer_heads
    eot = constants["eot_idx"]
    text = clip_params["text"]

    def enc(embeds):
        return _normalize(
            encode_text_embeds(
                text, embeds, eot, heads, impl=flags.attention_impl,
                remat=flags.remat, adapter=adapter,
            )
        )

    out = {"pos": enc(prompts), "neg": enc(prompts_neg)}
    if include_evidence if include_evidence is not None else flags.use_evidence:
        out["evd"] = enc(prompts_evd)
    return out


def _scales(trainable: dict, flags: DenseFlags, train: bool):
    logit_scale = (
        jnp.exp(trainable["temperature"]) if flags.learn_scale else FIXED_LOGIT_SCALE
    )
    fixed_spatial = flags.spatial_scale_text if train else flags.spatial_scale_image
    tmp_scale = (
        jnp.exp(trainable["spatial_T"]) if flags.learn_spatial_scale else fixed_spatial
    )
    return logit_scale, tmp_scale


def _aggregate_local(
    spatial_feats: jnp.ndarray,  # [B, P, E] L2-normalised per-position features
    text_feats: Dict[str, jnp.ndarray],
    logit_scale,
    tmp_scale,
    use_evidence: bool,
    pos_mask: Optional[jnp.ndarray] = None,  # [B, P] additive (-10000 at pads)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared local-logits aggregation (train token axis == test spatial axis).

    Pad handling is mathematically identical to the reference's additive
    -10000 mask (pad positions get ~0 spatial-softmax weight and ~0
    contribution) but restructured for numerical stability: the reference
    feeds masked values into the WTA product ``logits·(max+1)`` which reaches
    ~5e9 at pad positions and NaNs under fused XLA softmax; here the WTA is
    computed on raw per-position logits (identical at valid positions — the
    mask is per-position, so a valid position's class row is unmasked) and
    pad contributions are zeroed explicitly.

    Returns (logits_local [B, C], logits_neg [B, P, C] masked like the ref)."""
    logits_raw = jnp.einsum(
        "bpe,ce->bpc", spatial_feats, text_feats["neg"],
        preferred_element_type=jnp.float32,
    )
    valid = None
    logits_neg = logits_raw
    if pos_mask is not None:
        valid = (pos_mask > NEG_MASK_VALUE / 2)[:, :, None]  # [B, P, 1]
        logits_neg = logits_raw + pos_mask[:, :, None]
    if use_evidence:
        logits_evd = jnp.einsum(
            "bpe,ce->bpc", spatial_feats, text_feats["evd"],
            preferred_element_type=jnp.float32,
        )
        if pos_mask is not None:
            logits_evd = logits_evd + pos_mask[:, :, None]
        # Winner-Take-All regularisation: sharpen per-position class logits by
        # their own max before the class softmax (ref :463-465,507-509)
        w = jax.nn.softmax(
            tmp_scale * logits_raw * (logits_raw.max(-1, keepdims=True) + 1.0), axis=-1
        )
        contrib = logits_raw * w
        prob_spatial = jax.nn.softmax(logits_evd * tmp_scale, axis=1)
        logits_neg = contrib if valid is None else jnp.where(valid, contrib, 0.0)
    else:
        prob_spatial = jax.nn.softmax(logits_neg * tmp_scale, axis=1)
        if valid is not None:
            logits_neg = jnp.where(valid, logits_raw, 0.0)
    logits_local = jnp.sum(logit_scale * logits_neg * prob_spatial, axis=1)
    return logits_local, logits_neg


class CaptionFeatures(NamedTuple):
    """Frozen text-tower encodings of a caption batch, shared between the
    student and EMA-teacher heads (the reference computes them once per step,
    Caption_distill_double.py:474-477, and reuses them at :516-541)."""

    global_feat: jnp.ndarray   # [B, E] L2-normalised EOT feature
    spatial_feats: jnp.ndarray  # [B, L, E] L2-normalised per-token features
    pos_mask: jnp.ndarray      # [B, L] additive pad mask (-10000 at pads)


def encode_captions(
    clip_params: dict, clip_cfg: CLIPConfig, captions: jnp.ndarray, flags: DenseFlags,
    q8: dict = None, fused: bool = False,
) -> CaptionFeatures:
    """Captions [B, 77] → frozen "image-like" features (no gradients).

    ``q8``: optional int8 text-tower weights (ops/quant.py) — safe here
    because this branch is stop_gradient'ed (the int8 kernels have no VJP);
    the PROMPT branch must stay bf16/fp32 (gradients flow through it).
    ``fused``: bf16 fused-block kernels (ops/block_kernels.py) — same
    stop-gradient-only constraint, beats both XLA and int8 at caption shapes
    with no quantization noise (scripts/probe_text_fused.py)."""
    text = clip_params["text"]
    heads = clip_cfg.transformer_heads
    embeds = text["token_embedding"][captions]
    seq = jax.lax.stop_gradient(
        encode_text_sequence(text, embeds, heads, impl=flags.attention_impl,
                             q8=q8, fused=fused)
    )  # [B, L, E]
    eot = captions.argmax(-1)
    global_feat = _normalize(
        jnp.take_along_axis(seq, eot[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    )
    spatial_feats = _normalize(seq)
    pos_mask = (captions == 0).astype(jnp.float32) * NEG_MASK_VALUE
    return CaptionFeatures(global_feat, spatial_feats, pos_mask)


def train_logits_from_features(
    clip_params: dict,
    clip_cfg: CLIPConfig,
    trainable: dict,
    constants: dict,
    feats_in: CaptionFeatures,
    flags: DenseFlags,
    adapter: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(prompt params, frozen caption features) → (logits_global, logits_local)."""
    feats = prompt_text_features(
        clip_params, clip_cfg, trainable, constants, flags, adapter=adapter
    )
    logit_scale, tmp_scale = _scales(trainable, flags, train=True)
    logits_global = logit_scale * feats_in.global_feat @ feats["pos"].T
    logits_local, _ = _aggregate_local(
        feats_in.spatial_feats, feats, logit_scale, tmp_scale,
        flags.use_evidence, feats_in.pos_mask,
    )
    return logits_global, logits_local


def dense_train_forward(
    clip_params: dict,
    clip_cfg: CLIPConfig,
    trainable: dict,
    constants: dict,
    captions: jnp.ndarray,  # [B, 77] int32 token ids
    flags: DenseFlags,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Texts-as-images training forward → (logits_global, logits_local)."""
    caption_feats = encode_captions(clip_params, clip_cfg, captions, flags)
    return train_logits_from_features(
        clip_params, clip_cfg, trainable, constants, caption_feats, flags
    )


def retrieval_augment(
    global_feat: jnp.ndarray,  # [B, E] L2-normalised
    caption_bank: jnp.ndarray,  # [N, E] L2-normalised caption features
    topk: int = 10,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k caption retrieval: mean of the k nearest bank features is
    averaged 50/50 into the image feature (ref :444-448). Returns
    (augmented_feat [B,E], topk_scores [B,k]).

    Uses the TPU-native ``approx_max_k`` (exact ``top_k`` over a 220k-wide
    axis lowers to a full sort — orders of magnitude slower; the approximate
    variant has ≥0.95 recall and the retrieval mean is insensitive to it).
    The [B, N] similarity matrix is stored bf16 for the SEARCH (it dominates
    HBM traffic: 2 GB fp32 at TTA batch sizes); the returned scores are then
    recomputed exactly in fp32 for just the selected k rows, so score
    precision matches the all-fp32 path."""
    k_eff = min(topk, sims_n := caption_bank.shape[0])
    if exact or sims_n <= 4096:
        sims = jnp.einsum(
            "be,ne->bn", global_feat, caption_bank,
            preferred_element_type=jnp.float32,
        )
        scores, idx = jax.lax.top_k(sims, k_eff)
        selected = caption_bank[idx]  # [B, k_eff, E]
    else:
        sims = jnp.einsum(
            "be,ne->bn", global_feat, caption_bank,
            preferred_element_type=jnp.bfloat16,
        )
        _, idx = jax.lax.approx_max_k(sims, k_eff, recall_target=0.95)
        selected = caption_bank[idx]  # [B, k_eff, E]
        scores = jnp.einsum(
            "be,bke->bk", global_feat, selected,
            preferred_element_type=jnp.float32,
        )
        # the fp32 rescore can reorder ties/near-ties of the bf16 search —
        # restore the descending-score contract (cheap at k≈10)
        scores = -jnp.sort(-scores, axis=-1)
    merged = (global_feat + selected.mean(axis=1).astype(global_feat.dtype)) / 2.0
    if k_eff < topk:  # tiny banks: keep the advertised [B, topk] shape
        scores = jnp.pad(scores, ((0, 0), (0, topk - k_eff)))
    return merged, scores


class ImageFeatures(NamedTuple):
    """Frozen image-tower encodings, shared across every ensemble member —
    the reference re-runs the image encoder once PER prompt model
    (Caption_distill_double.py:631); encoding once and reusing for all M
    models' tiny [C,E] text features is a pure win."""

    global_feat: jnp.ndarray    # [B, E] L2-normalised attention-pool feature
    spatial_feats: jnp.ndarray  # [B, P, E] L2-normalised dense features


def encode_image_features(
    clip_params: dict, clip_cfg: CLIPConfig, images: jnp.ndarray, flags: DenseFlags,
    q8: dict = None, fused: bool = False,
) -> ImageFeatures:
    out = clip_encode_image(
        clip_params, clip_cfg, images, dense=True, if_pos=False,
        impl=flags.attention_impl, q8=q8, fused=fused,
        # RN dense features come from project_dense on the trunk map below —
        # the pool's per-position output is never consumed (ref
        # Caption_distill_double.py:369-373,409-413), so use the
        # single-query pool
        pool_map=False,
    )
    if clip_cfg.is_vit:
        global_raw, tokens = out  # ViT dense tokens are already projected
        dense = tokens.reshape(tokens.shape[0], -1, tokens.shape[-1])
    else:
        global_raw, _, feat_map = out
        dense = project_dense(feat_map, clip_params["visual"]["attnpool"])
    return ImageFeatures(_normalize(global_raw), _normalize(dense))


def test_logits_from_features(
    trainable: dict,
    text_feats: Dict[str, jnp.ndarray],
    image_feats: ImageFeatures,
    flags: DenseFlags,
    caption_bank: Optional[jnp.ndarray] = None,
    topk: int = 10,
    precomputed_retrieval: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> "DenseTestOutput":
    """(prompt text features, shared image features) → test logits.

    ``precomputed_retrieval=(augmented_global, topk_scores)`` lets the caller
    run the caption-bank top-k ONCE per batch (it is model-independent — the
    reference recomputes it per ensemble member)."""
    global_feat = image_feats.global_feat
    raw_sim = jnp.einsum(
        "be,ce->bc", global_feat, text_feats["pos"], preferred_element_type=jnp.float32
    )
    if precomputed_retrieval is not None:
        global_feat, topk_scores = precomputed_retrieval
    elif caption_bank is not None:
        global_feat, topk_scores = retrieval_augment(global_feat, caption_bank, topk)
    else:
        topk_scores = jnp.zeros((global_feat.shape[0], topk), jnp.float32)

    logit_scale, tmp_scale = _scales(trainable, flags, train=False)
    logits_global = logit_scale * global_feat @ text_feats["pos"].T
    logits_local, logits_neg = _aggregate_local(
        image_feats.spatial_feats, text_feats, logit_scale, tmp_scale, flags.use_evidence
    )
    return DenseTestOutput(logits_global, logits_local, logits_neg, raw_sim, topk_scores)


class DenseTestOutput(NamedTuple):
    logits_global: jnp.ndarray   # [B, C]
    logits_local: jnp.ndarray    # [B, C]
    logits_neg: jnp.ndarray      # [B, P, C]
    raw_sim: jnp.ndarray         # [B, C] un-augmented image@pos-text cosine
    topk_sim_scores: jnp.ndarray  # [B, k] retrieval similarities (or zeros)


def dense_test_forward(
    clip_params: dict,
    clip_cfg: CLIPConfig,
    trainable: dict,
    text_feats: Dict[str, jnp.ndarray],
    images: jnp.ndarray,  # [B, H, W, 3] CLIP-normalised
    flags: DenseFlags,
    caption_bank: Optional[jnp.ndarray] = None,
    topk: int = 10,
) -> DenseTestOutput:
    """Image-side test forward with dense + global logits."""
    image_feats = encode_image_features(clip_params, clip_cfg, images, flags)
    return test_logits_from_features(
        trainable, text_feats, image_feats, flags, caption_bank=caption_bank, topk=topk
    )


# ----------------------------- CustomCLIP ----------------------------------


def custom_clip_train_forward(
    clip_params, clip_cfg, trainable, constants, captions, flags: DenseFlags
):
    """Global-only variant (ref CustomCLIP :338-352): caption EOT feature vs
    positive prompt features."""
    text = clip_params["text"]
    heads = clip_cfg.transformer_heads
    embeds = text["token_embedding"][captions]
    feat = jax.lax.stop_gradient(
        encode_text_embeds(text, embeds, captions.argmax(-1), heads,
                           impl=flags.attention_impl)
    )
    feat = _normalize(feat)
    feats = prompt_text_features(
        clip_params, clip_cfg, trainable, constants, flags, include_evidence=False
    )
    return FIXED_LOGIT_SCALE * feat @ feats["pos"].T, None


def custom_clip_test_forward(
    clip_params, clip_cfg, trainable, text_feats, images, flags: DenseFlags
):
    img = _normalize(clip_encode_image(clip_params, clip_cfg, images,
                                       impl=flags.attention_impl))
    return FIXED_LOGIT_SCALE * img @ text_feats["pos"].T, None
