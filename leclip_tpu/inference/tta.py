"""Multi-scale TTA inference engine.

The reference's test pass (ref: Caption_distill_double.py:589-732 +
DatasetWrapperWithBlock) spends 10–12 h because every one of ~9.8 M crops is
PIL-cropped/resized on the CPU and the image encoder is re-run once per
ensemble model. This engine restructures it TPU-first:

* crop geometry is host-side integer math; crop extraction + bicubic resize +
  CLIP normalisation + image encoding is ONE jitted program per image-shape
  bucket (raw decoded images are padded to a small set of buckets so XLA
  compiles a handful of programs, not one per image size)
* the per-scale crop census is size-independent (40/100/164 for scales 2/3/4),
  so every image contributes a static [1 + n_crops] crop batch
* image features are encoded ONCE and scored against every ensemble member's
  cached [C, E] prompt features (the reference re-encodes per model)
* retrieval augmentation against the caption bank is a single [N, bank]
  matmul inside the same program

Outputs per model mirror the reference's saved dict: output / output_pos /
output_blocks / output_pos_blocks (+ shared retrieval sims), feeding
`ops.ensemble.generate_final_answers`.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPConfig
from ..models.dense_clip import (
    DenseFlags,
    encode_image_features,
    prompt_text_features,
    retrieval_augment,
    test_logits_from_features,
)
from ..ops.crops import crop_and_resize, tta_sampling_boxes
from ..ops.ensemble import adjust_predictions, aggregate_blocks
from ..ops.preprocess import clip_normalize

DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (256, 256), (384, 512), (512, 384), (512, 512), (512, 768), (768, 512),
    (768, 768), (768, 1024), (1024, 768), (1024, 1024), (1280, 1280),
)


def pick_bucket(h: int, w: int, buckets=DEFAULT_BUCKETS) -> Tuple[int, int]:
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return buckets[-1]


def pad_to_bucket(img: np.ndarray, bucket: Tuple[int, int]) -> np.ndarray:
    bh, bw = bucket
    h, w = img.shape[:2]
    if h > bh or w > bw:
        # downscale oversized images on host to the largest bucket (cheap,
        # and the crop geometry is computed from the RESIZED dims so scoring
        # stays self-consistent)
        from PIL import Image

        scale = min(bh / h, bw / w)
        nh, nw = int(h * scale), int(w * scale)
        img = np.asarray(
            Image.fromarray(img).resize((nw, nh), Image.BICUBIC), img.dtype
        )
        h, w = nh, nw
    out = np.zeros((bh, bw, 3), img.dtype)
    out[:h, :w] = img
    return out


class ModelSpec(NamedTuple):
    """One ensemble member: its trainable prompt params (for the learned
    scales), cached prompt text features, and its method flags."""

    trainable: dict
    text_feats: Dict[str, jnp.ndarray]
    flags: DenseFlags


_SPEC_ENCODER_CACHE: Dict[tuple, object] = {}


def _spec_encoder(clip_cfg: CLIPConfig, flags: DenseFlags, meta: tuple):
    """Cached jitted prompt-feature encoder (eager encoding dispatches the
    whole text tower op-by-op — catastrophic over a remote-TPU tunnel)."""
    key = (clip_cfg, flags, meta)
    fn = _SPEC_ENCODER_CACHE.get(key)
    if fn is None:
        meta_dict = dict(meta)

        @jax.jit
        def fn(clip_params, trainable, const_arrays):
            constants = {**const_arrays, **meta_dict}
            return prompt_text_features(clip_params, clip_cfg, trainable, constants, flags)

        _SPEC_ENCODER_CACHE[key] = fn
    return fn


_CONST_META_KEYS = ("name_lens", "n_ctx", "n_cls", "class_token_position")


def build_model_spec(
    clip_params: dict,
    clip_cfg: CLIPConfig,
    trainable: dict,
    constants: dict,
    flags: DenseFlags,
) -> ModelSpec:
    """Pre-encode the three prompt sets once (the reference caches after the
    first test batch, :421-439)."""
    meta = tuple((k, constants[k]) for k in _CONST_META_KEYS)
    arrays = {k: v for k, v in constants.items() if k not in _CONST_META_KEYS}
    encode = _spec_encoder(clip_cfg, flags, meta)
    feats = encode(clip_params, trainable, arrays)
    feats = {k: jax.device_get(v) for k, v in feats.items()}
    return ModelSpec(jax.device_get(trainable), {k: jnp.asarray(v) for k, v in feats.items()}, flags)


class TTAOutputs(NamedTuple):
    """Per model-name arrays shaped like the reference's save dict."""

    output: np.ndarray             # [N, C] global logits
    output_pos: np.ndarray         # [N, C] local (dense) logits
    output_blocks: np.ndarray      # [N, n_blocks, C]
    output_pos_blocks: np.ndarray  # [N, n_blocks, C]
    output_final: np.ndarray       # [N, C] block-aggregated global
    output_pos_final: np.ndarray   # [N, C] block-aggregated local


class TTAEngine:
    def __init__(
        self,
        clip_params: dict,
        clip_cfg: CLIPConfig,
        models: Dict[str, ModelSpec],
        scales: Tuple[int, ...] = (2, 3, 4),
        caption_bank: Optional[jnp.ndarray] = None,
        cooccurrence: Optional[np.ndarray] = None,   # row-normalised P̂
        use_freq: bool = False,
        topk: int = 10,
        block_threshold: float = 0.3,
        block_coef: float = 1.4,
        compute_dtype=jnp.float32,
        crop_size: int = 224,
    ):
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.models = models
        self.scales = tuple(scales)
        self.caption_bank = caption_bank
        self.cooccurrence = (
            jnp.asarray(cooccurrence, jnp.float32) if cooccurrence is not None else None
        )
        self.use_freq = use_freq and cooccurrence is not None
        self.topk = topk
        self.block_threshold = block_threshold
        self.block_coef = block_coef
        self.compute_dtype = compute_dtype
        self.crop_size = crop_size
        # crop census is size-independent; probe it once
        _, counts = tta_sampling_boxes(480, 640, self.scales)
        self.n_blocks = sum(counts)
        self._feature_fn_cache = {}
        self._score_fn = None

    # ------------------------- device programs ------------------------------

    def _feature_fn(self, bucket: Tuple[int, int], n_boxes: int, batch: int):
        key = (bucket, n_boxes, batch)
        fn = self._feature_fn_cache.get(key)
        if fn is not None:
            return fn
        clip_cfg = self.clip_cfg
        dtype = self.compute_dtype
        size = self.crop_size
        flags = next(iter(self.models.values())).flags
        topk = self.topk
        has_bank = self.caption_bank is not None

        # NOTE: clip params and the caption bank are jit ARGUMENTS, not
        # closures — closed-over arrays become HLO constants (hundreds of MB)
        # and wreck compile time, especially through a remote-compile tunnel.
        @jax.jit
        def feature_fn(clip_params, bank, images_u8: jnp.ndarray, boxes: jnp.ndarray):
            imgs = images_u8.astype(dtype) / 255.0

            def one(img, bxs):
                crops = crop_and_resize(img, bxs, out_size=size, method="cubic")
                return clip_normalize(crops)

            crops = jax.vmap(one)(imgs, boxes)  # [B, n, S, S, 3]
            flat = crops.reshape((-1,) + crops.shape[2:])
            feats = encode_image_features(clip_params, clip_cfg, flat, flags)
            # retrieval is model-independent → run it once here, shared by
            # every ensemble member (the reference redoes it per model)
            if has_bank:
                aug, scores = retrieval_augment(feats.global_feat, bank, topk)
            else:
                aug = feats.global_feat
                scores = jnp.zeros((flat.shape[0], topk), jnp.float32)
            return feats, aug, scores

        self._feature_fn_cache[key] = feature_fn
        return feature_fn

    def _score(self, spec: ModelSpec, feats, aug, scores):
        if self._score_fn is None:

            @functools.partial(jax.jit, static_argnums=(2,))
            def score_fn(trainable, text_feats, flags, image_feats, aug_, scores_):
                return test_logits_from_features(
                    trainable, text_feats, image_feats, flags,
                    precomputed_retrieval=(aug_, scores_),
                )

            self._score_fn = score_fn
        return self._score_fn(spec.trainable, spec.text_feats, spec.flags, feats, aug, scores)

    # ------------------------------ passes ----------------------------------

    def prepare_batch(self, images: Sequence[np.ndarray]):
        """Host side: bucket-pad images and compute sampling boxes (global
        central square first, then the pyramid)."""
        buckets = [pick_bucket(*im.shape[:2]) for im in images]
        # one program per batch: elementwise-max then snap to a bucket so the
        # shared buffer contains every image
        bucket = pick_bucket(max(b[0] for b in buckets), max(b[1] for b in buckets))
        padded, boxes = [], []
        for im in images:
            p = pad_to_bucket(im, bucket)
            h, w = min(im.shape[0], bucket[0]), min(im.shape[1], bucket[1])
            pyramid, _ = tta_sampling_boxes(h, w, self.scales)
            side = min(h, w)
            gy, gx = (h - side) / 2.0, (w - side) / 2.0
            global_box = np.asarray([[gy, gx, gy + side, gx + side]], np.float32)
            boxes.append(np.concatenate([global_box, pyramid], axis=0))
            padded.append(p)
        return np.stack(padded), np.stack(boxes), bucket

    def run_batch(self, images: Sequence[np.ndarray]) -> Dict[str, dict]:
        """Full TTA pass over a batch of decoded images → per-model raw
        score dict + shared retrieval sims."""
        padded, boxes, bucket = self.prepare_batch(images)
        b, n = boxes.shape[0], boxes.shape[1]
        feature_fn = self._feature_fn(bucket, n, b)
        bank = self.caption_bank
        if bank is None:
            # zero-size placeholder keeps the jit signature stable
            bank = jnp.zeros((1, 1), jnp.float32)
        feats, aug, scores = feature_fn(
            self.clip_params, bank, jnp.asarray(padded), jnp.asarray(boxes)
        )

        results: Dict[str, dict] = {}
        sims_saved = None
        for name, spec in self.models.items():
            out = self._score(spec, feats, aug, scores)
            g = np.asarray(out.logits_global, np.float32).reshape(b, n, -1)
            l = np.asarray(out.logits_local, np.float32).reshape(b, n, -1)
            sims = np.asarray(out.topk_sim_scores, np.float32).reshape(b, n, -1)
            if self.use_freq:
                p = np.asarray(self.cooccurrence)
                l = np.asarray(adjust_predictions(l, p))
            output, output_blocks = g[:, 0], g[:, 1:]
            output_pos, output_pos_blocks = l[:, 0], l[:, 1:]
            output_final = aggregate_blocks(
                output_blocks, self.block_threshold, self.block_coef, base=output
            )
            output_pos_final = aggregate_blocks(
                output_pos_blocks, self.block_threshold, self.block_coef, base=output_pos
            )
            results[name] = {
                "output": output,
                "output_pos": output_pos,
                "output_blocks": output_blocks,
                "output_pos_blocks": output_pos_blocks,
                "output_final": np.asarray(output_final),
                "output_pos_final": np.asarray(output_pos_final),
            }
            if sims_saved is None:
                sims_saved = {"sims_all": sims[:, 0], "sims_blocks_all": sims[:, 1:]}
        results["_sims"] = sims_saved
        return results
