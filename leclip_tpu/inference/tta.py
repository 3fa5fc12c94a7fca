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
from ..ops.resize_matmul import crop_and_resize_matmul

DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (256, 256), (384, 512), (512, 384), (512, 512), (512, 768), (768, 512),
    (768, 768), (768, 1024), (1024, 768), (1024, 1024), (1280, 1280),
)


def pick_bucket(h: int, w: int, buckets=DEFAULT_BUCKETS) -> Tuple[int, int]:
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return buckets[-1]


def pad_to_bucket(
    img: np.ndarray, bucket: Tuple[int, int]
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad `img` into `bucket`; returns (padded, content (h, w)).

    Oversized images are aspect-preservingly downscaled on host first, so the
    returned content dims are the POST-resize dims — crop boxes must be
    computed from these, not from the original image shape (otherwise boxes
    sample the zero padding and the global central crop is misplaced)."""
    bh, bw = bucket
    h, w = img.shape[:2]
    if h > bh or w > bw:
        from PIL import Image

        scale = min(bh / h, bw / w)
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        img = np.asarray(
            Image.fromarray(img).resize((nw, nh), Image.BICUBIC), img.dtype
        )
        h, w = nh, nw
    out = np.zeros((bh, bw, 3), img.dtype)
    out[:h, :w] = img
    return out, (h, w)


class ModelSpec(NamedTuple):
    """One ensemble member: its trainable prompt params (for the learned
    scales), cached prompt text features, its method flags, and whether its
    local logits get co-occurrence modulation (per-pass in the reference's
    run_eval.sh — True for best/difft, False elsewhere; None → inherit the
    engine-wide setting)."""

    trainable: dict
    text_feats: Dict[str, jnp.ndarray]
    flags: DenseFlags
    use_freq: Optional[bool] = None


def _make_batch_crop_fn(impl: str, antialias: bool, size: int, shared: bool):
    """Batch crop extractor: (imgs [B,H,W,C], boxes [B,n,4], content [B,2]) →
    normalised crops [B,n,S,S,C]. When ``shared`` (every image in the batch
    has the same content size — the common case under bucket-sorted
    batching), the per-crop interpolation matrices are built once for the
    whole batch instead of per image."""
    if shared and impl == "matmul":
        from ..ops.resize_matmul import crop_and_resize_matmul_batch

        def batch_fn(imgs, boxes, content_hw):
            # boxes [n,4] / content_hw [2]: geometry identical across the
            # batch, reduced to ONE copy on host (TTAEngine._stage_inputs) —
            # under a mesh it arrives replicated, so no batch-sharded operand
            # is ever indexed here (a [0] on one would force a gather).
            crops = crop_and_resize_matmul_batch(
                imgs, boxes, out_size=size, antialias=antialias,
                content_hw=content_hw,
            )
            return clip_normalize(crops)

        return batch_fn
    one = _make_crop_fn(impl, antialias, size)
    return jax.vmap(one)


def _make_crop_fn(impl: str, antialias: bool, size: int):
    """Per-image crop extractor: (img [H,W,C], boxes [n,4], content (h,w)) →
    normalised crops. 'matmul' runs on the MXU with optional PIL-parity
    antialiasing; 'gather' is the original 4-tap Catmull-Rom sampler."""
    if impl == "matmul":
        def fn(img, bxs, chw):
            crops = crop_and_resize_matmul(
                img, bxs, out_size=size, antialias=antialias, content_hw=chw
            )
            return clip_normalize(crops)
    elif impl == "gather":
        def fn(img, bxs, chw):
            crops = crop_and_resize(
                img, bxs, out_size=size, method="cubic", content_hw=chw
            )
            return clip_normalize(crops)
    else:
        raise ValueError(f"unknown resize_impl {impl!r}")
    return fn


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
    use_freq: Optional[bool] = None,
) -> ModelSpec:
    """Pre-encode the three prompt sets once (the reference caches after the
    first test batch, :421-439)."""
    meta = tuple((k, constants[k]) for k in _CONST_META_KEYS)
    arrays = {k: v for k, v in constants.items() if k not in _CONST_META_KEYS}
    encode = _spec_encoder(clip_cfg, flags, meta)
    feats = encode(clip_params, trainable, arrays)
    feats = {k: jax.device_get(v) for k, v in feats.items()}
    return ModelSpec(
        jax.device_get(trainable),
        {k: jnp.asarray(v) for k, v in feats.items()},
        flags,
        use_freq,
    )


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
        resize_impl: str = "matmul",   # 'matmul' (MXU, antialias-capable) | 'gather'
        antialias: bool = True,        # PIL-bicubic parity on downscale
        mesh=None,                     # jax.sharding.Mesh with a 'data' axis:
                                       # batch sharded, params/bank replicated
        shard_bank: bool = False,      # row-shard the caption bank over the
                                       # mesh (ring-kNN retrieval, parallel/
                                       # retrieval.py) instead of replicating
                                       # it — d× less bank HBM per chip
        precision: str = "bf16",       # 'bf16' | 'int8' — int8 quantizes the
                                       # ViT transformer's weight matmuls
                                       # (W8A8, ops/quant.py); ~2x MXU rate,
                                       # validated in tests/test_quant.py
        bf16_fused=None,               # None = auto (TPU + bf16 ViT); bool
                                       # forces the fused bf16 block kernels
                                       # (ops/block_kernels.py) on/off
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
        self.resize_impl = resize_impl
        self.antialias = antialias
        self.mesh = mesh
        self.shard_bank = bool(shard_bank)
        if self.shard_bank and (mesh is None or self.caption_bank is None):
            raise ValueError("shard_bank=True needs both a mesh and a caption_bank")
        if mesh is not None:
            # replicate the big read-only operands once; batches get sharded
            # per dispatch along the mesh's 'data' axis. The whole TTA program
            # is batch-parallel (per-image fusion/routing), so XLA propagates
            # the batch sharding end-to-end without collectives — the DP
            # contract of the reference (ref train_caption.py:176-179).
            # With shard_bank the bank is instead ROW-SHARDED and retrieval
            # runs the ring-kNN (parallel/retrieval.py).
            from ..parallel.mesh import pad_to_multiple, replicate, shard_along

            self.clip_params = replicate(self.clip_params, mesh)
            if self.caption_bank is not None:
                if self.shard_bank:
                    n_dev = int(np.prod(list(mesh.shape.values())))
                    # zero-pad (NOT wrap): the sharded search excludes pad
                    # rows BY INDEX (n_valid), so padded banks retrieve
                    # identically to the replicated path at any size and
                    # for any bank content (incl. unnormalised user banks)
                    padded_bank, self._bank_n_valid = pad_to_multiple(
                        np.asarray(self.caption_bank), n_dev, mode="zero"
                    )
                    self.caption_bank = shard_along(
                        jnp.asarray(padded_bank), mesh, axis=mesh.axis_names[0]
                    )
                else:
                    self.caption_bank = replicate(self.caption_bank, mesh)
            if self.cooccurrence is not None:
                self.cooccurrence = replicate(self.cooccurrence, mesh)
        if precision not in ("bf16", "int8"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision == "int8" and not clip_cfg.is_vit:
            raise ValueError("precision='int8' currently supports ViT backbones only")
        self.precision = precision
        self._q8 = None
        if precision == "int8":
            from ..ops.quant import quantize_stack_on_device

            self._q8 = quantize_stack_on_device(
                self.clip_params["visual"]["blocks"], mesh=mesh
            )
        # bf16 fused-block pallas kernels (ops/block_kernels.py): the int8
        # megakernels' fusion structure with unquantized weights. Auto-engages
        # for the bf16 ViT path on a real TPU (interpret-mode pallas would
        # slow CPU runs); bf16_fused=True/False overrides (tests force True
        # to exercise the kernels in interpret mode).
        if bf16_fused is None:
            bf16_fused = (
                precision == "bf16" and clip_cfg.is_vit
                and compute_dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
            )
        self._fused = bool(bf16_fused) and precision == "bf16" and clip_cfg.is_vit
        # crop census is size-independent; probe it once
        _, counts = tta_sampling_boxes(480, 640, self.scales)
        self.n_blocks = sum(counts)
        self._feature_fn_cache = {}
        self._score_fn = None

    # ------------------------- device programs ------------------------------

    def _retrieval_fn(self):
        """(global_feat, bank) → (augmented, topk_scores): the replicated
        top-k search, or the ring-kNN over the row-sharded bank."""
        if self.shard_bank:
            from ..parallel.retrieval import make_sharded_retriever

            return make_sharded_retriever(
                self.topk, self.mesh, self.mesh.axis_names[0],
                n_valid=self._bank_n_valid,
            )
        return functools.partial(retrieval_augment, topk=self.topk)

    def _feature_fn(self, bucket: Tuple[int, int], n_boxes: int, batch: int,
                    shared: bool = False):
        key = (bucket, n_boxes, batch, shared)
        fn = self._feature_fn_cache.get(key)
        if fn is not None:
            return fn
        clip_cfg = self.clip_cfg
        dtype = self.compute_dtype
        size = self.crop_size
        flags = next(iter(self.models.values())).flags
        topk = self.topk
        has_bank = self.caption_bank is not None
        retrieve = self._retrieval_fn()
        use_fused = self._fused

        # NOTE: clip params and the caption bank are jit ARGUMENTS, not
        # closures — closed-over arrays become HLO constants (hundreds of MB)
        # and wreck compile time, especially through a remote-compile tunnel.
        crop_batch = _make_batch_crop_fn(
            self.resize_impl, self.antialias, size, shared
        )

        @jax.jit
        def feature_fn(clip_params, bank, images_u8: jnp.ndarray, boxes: jnp.ndarray,
                       content_hw: jnp.ndarray, q8=None):
            imgs = images_u8.astype(dtype) / 255.0
            crops = crop_batch(imgs, boxes, content_hw)  # [B, n, S, S, 3]
            flat = crops.reshape((-1,) + crops.shape[2:])
            feats = encode_image_features(clip_params, clip_cfg, flat, flags, q8=q8,
                                          fused=use_fused)
            # retrieval is model-independent → run it once here, shared by
            # every ensemble member (the reference redoes it per model)
            if has_bank:
                aug, scores = retrieve(feats.global_feat, bank)
            else:
                aug = feats.global_feat
                scores = jnp.zeros((flat.shape[0], topk), jnp.float32)
            return feats, aug, scores

        self._feature_fn_cache[key] = feature_fn
        return feature_fn

    def _member_use_freq(self, spec: ModelSpec) -> bool:
        """Effective per-member co-occurrence modulation: the spec's own
        setting (from its run_eval.sh group) wins; None inherits the
        engine-wide flag. Always off without a co-occurrence matrix."""
        if self.cooccurrence is None:
            return False
        return self.use_freq if spec.use_freq is None else bool(spec.use_freq)

    def _model_groups(self):
        """Ensemble members grouped by (flags, ctx shape, use_freq), each
        group's trainables and text features stacked along a model axis →
        ONE vmapped dispatch per group instead of one per member
        (per-dispatch tunnel latency is material on networked TPUs).

        The ctx shape must be part of the key: members with different n_ctx
        (ema is 64 vs 16 elsewhere) cannot be jnp.stack'd together."""
        if getattr(self, "_groups", None) is not None:
            return self._groups
        by_key: Dict[tuple, List[str]] = {}
        for name, spec in self.models.items():
            shapes = tuple(sorted(
                (k, tuple(np.asarray(v).shape)) for k, v in spec.trainable.items()
            ))
            key = (spec.flags, shapes, self._member_use_freq(spec))
            by_key.setdefault(key, []).append(name)
        groups = []
        for (flags, _, use_freq), names in by_key.items():
            stacked_trainable = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[self.models[n].trainable for n in names],
            )
            keys = self.models[names[0]].text_feats.keys()
            stacked_feats = {
                k: jnp.stack([self.models[n].text_feats[k] for n in names])
                for k in keys
            }
            if self.mesh is not None:
                from ..parallel.mesh import replicate

                stacked_trainable = replicate(stacked_trainable, self.mesh)
                stacked_feats = replicate(stacked_feats, self.mesh)
            groups.append((names, flags, use_freq, stacked_trainable, stacked_feats))
        self._groups = groups
        return groups

    # --------------------------- mesh helpers -------------------------------

    def _mesh_size(self) -> int:
        return 1 if self.mesh is None else int(np.prod(list(self.mesh.shape.values())))

    def _mesh_pad(self, images: Sequence[np.ndarray]):
        """Pad the image list (by repeating the last image) so the batch
        divides the mesh; returns (padded_list, original_count)."""
        images = list(images)
        b = len(images)
        pad = (-b) % self._mesh_size()
        return images + [images[-1]] * pad, b

    def _put_batch(self, *arrays):
        """Host arrays → device: batch-sharded over the mesh's first axis, or
        plain asarray single-device. Multi-process meshes assemble the global
        array from identical per-process host copies (every process runs the
        engine over the SAME image list — parallel/mesh.put_global)."""
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from jax.sharding import PartitionSpec

        from ..parallel.mesh import put_global

        spec = PartitionSpec(self.mesh.axis_names[0])
        return tuple(put_global(a, self.mesh, spec) for a in arrays)

    def _fetch(self, out) -> np.ndarray:
        """Device scores → host fp32, allgathering across processes when the
        mesh spans them (each host only addresses its own shards)."""
        from ..parallel.mesh import fetch_global

        return np.asarray(fetch_global(out), np.float32)

    def _replicated(self, x):
        if self.mesh is None:
            return x
        from ..parallel.mesh import replicate

        return replicate(x, self.mesh)

    def _score_group(self, flags, stacked_trainable, stacked_feats, feats, aug, scores):
        if self._score_fn is None:

            @functools.partial(jax.jit, static_argnums=(2,))
            def score_fn(trainables, text_feats, flags_, image_feats, aug_, scores_):
                def one(tr, tf):
                    return test_logits_from_features(
                        tr, tf, image_feats, flags_,
                        precomputed_retrieval=(aug_, scores_),
                    )

                return jax.vmap(one)(trainables, text_feats)

            self._score_fn = score_fn
        return self._score_fn(stacked_trainable, stacked_feats, flags, feats, aug, scores)

    # ------------------------------ passes ----------------------------------

    def prepare_batch(self, images: Sequence[np.ndarray]):
        """Host side: bucket-pad images and compute sampling boxes (global
        central square first, then the pyramid)."""
        buckets = [pick_bucket(*im.shape[:2]) for im in images]
        # one program per batch: elementwise-max then snap to a bucket so the
        # shared buffer contains every image
        bucket = pick_bucket(max(b[0] for b in buckets), max(b[1] for b in buckets))
        padded, boxes, content = [], [], []
        for im in images:
            p, (h, w) = pad_to_bucket(im, bucket)
            pyramid, _ = tta_sampling_boxes(h, w, self.scales)
            side = min(h, w)
            gy, gx = (h - side) / 2.0, (w - side) / 2.0
            global_box = np.asarray([[gy, gx, gy + side, gx + side]], np.float32)
            boxes.append(np.concatenate([global_box, pyramid], axis=0))
            padded.append(p)
            content.append((h, w))
        return (np.stack(padded), np.stack(boxes),
                np.asarray(content, np.int32), bucket)

    def _is_shared(self, content: np.ndarray) -> bool:
        """True when every image in the batch has the same content size —
        crop geometry (boxes + interpolation matrices) is then identical
        across the batch, reduced on host to [n,4]/[2] (_stage_inputs) and
        computed once per batch instead of per image (matrix generation was
        half the crop-stage time). Mesh runs replicate the reduced geometry,
        so the shared program indexes no batch-sharded operand."""
        if self.resize_impl != "matmul":
            return False
        return bool((content == content[0]).all())

    def _stage_inputs(self, padded, boxes, content, shared: bool):
        """Images → device batch-sharded; crop geometry either batch-sharded
        alongside (per-image path) or, when ``shared``, reduced to a single
        [n,4]/[2] copy and replicated over the mesh."""
        if shared:
            (im_d,) = self._put_batch(padded)
            bx, ct = jnp.asarray(boxes[0]), jnp.asarray(content[0])
            if self.mesh is not None:
                from ..parallel.mesh import replicate

                bx, ct = replicate((bx, ct), self.mesh)
            return im_d, bx, ct
        return self._put_batch(padded, boxes, content)

    def _dump_fn(self, bucket: Tuple[int, int], n_boxes: int, batch: int,
                 shared: bool = False):
        """ONE jitted program for the per-model dump path: crops → encoder →
        every ensemble member's global/local logits (+ per-member
        co-occurrence modulation and block aggregation) → a single flat fp32
        buffer. run_batch dispatches it once and fetches ONE array per batch —
        the python per-member loop with its ~20 device→host round trips
        (~30 ms each on a networked TPU) comes off the save_pth parity flow
        (ref dump contract: Caption_distill_double.py:684-724)."""
        key = ("dump", bucket, n_boxes, batch, shared)
        fn = self._feature_fn_cache.get(key)
        if fn is not None:
            return fn
        clip_cfg = self.clip_cfg
        dtype = self.compute_dtype
        size = self.crop_size
        topk = self.topk
        has_bank = self.caption_bank is not None
        retrieve = self._retrieval_fn()
        use_fused = self._fused
        groups = self._model_groups()
        flags0 = groups[0][1]
        thr, coef = self.block_threshold, self.block_coef
        b = batch

        crop_batch = _make_batch_crop_fn(
            self.resize_impl, self.antialias, size, shared
        )

        @jax.jit
        def dump_fn(clip_params, bank, images_u8, boxes, content_hw,
                    group_trs, group_tfs, cooc, q8=None):
            imgs = images_u8.astype(dtype) / 255.0
            crops = crop_batch(imgs, boxes, content_hw)
            flat = crops.reshape((-1,) + crops.shape[2:])
            feats = encode_image_features(clip_params, clip_cfg, flat, flags0, q8=q8,
                                          fused=use_fused)
            if has_bank:
                aug, scores = retrieve(feats.global_feat, bank)
            else:
                aug = feats.global_feat
                scores = jnp.zeros((flat.shape[0], topk), jnp.float32)

            parts = []
            for gi, (names, flags, g_use_freq, _, _) in enumerate(groups):
                tr, tf = group_trs[gi], group_tfs[gi]

                def score_one(t, f, flags=flags):
                    return test_logits_from_features(
                        t, f, feats, flags, precomputed_retrieval=(aug, scores)
                    )

                out = jax.vmap(score_one)(tr, tf)
                m = len(names)
                g = out.logits_global.reshape(m, b, n_boxes, -1).astype(jnp.float32)
                l = out.logits_local.reshape(m, b, n_boxes, -1).astype(jnp.float32)
                if g_use_freq:
                    l = adjust_predictions(l, cooc)
                g_final = aggregate_blocks(
                    g[:, :, 1:].reshape(m * b, n_boxes - 1, -1), thr, coef,
                    base=g[:, :, 0].reshape(m * b, -1),
                )
                l_final = aggregate_blocks(
                    l[:, :, 1:].reshape(m * b, n_boxes - 1, -1), thr, coef,
                    base=l[:, :, 0].reshape(m * b, -1),
                )
                parts += [g, l, g_final, l_final]
            parts.append(scores.reshape(b, n_boxes, -1).astype(jnp.float32))
            # ONE device→host transfer: everything flattened into one buffer
            return jnp.concatenate([p.reshape(-1) for p in parts])

        self._feature_fn_cache[key] = dump_fn
        return dump_fn

    def dispatch_batch_dump(self, images: Sequence[np.ndarray]):
        """Dispatch the single-dispatch dump program WITHOUT fetching the
        result: returns an opaque handle for :meth:`finish_batch_dump`.
        Splitting dispatch from fetch lets the save_pth flow pipeline
        depth-2 — the ~tens-of-MB flat-buffer device→host transfer of batch
        i then overlaps batch i+1's compute (the transfer, not compute, is
        what held the dump path ~3× below the fused path on the tunnel)."""
        images, b0 = self._mesh_pad(images)
        padded, boxes, content, bucket = self.prepare_batch(images)
        b, n = boxes.shape[0], boxes.shape[1]
        shared = self._is_shared(content)
        fn = self._dump_fn(bucket, n, b, shared=shared)
        groups = self._model_groups()
        bank = self.caption_bank
        if bank is None:
            bank = self._replicated(jnp.zeros((1, 1), jnp.float32))
        n_cls = next(iter(self.models.values())).text_feats["pos"].shape[0]
        cooc = self.cooccurrence
        if cooc is None:
            cooc = self._replicated(jnp.zeros((n_cls, n_cls), jnp.float32))
        im_d, bx_d, ct_d = self._stage_inputs(padded, boxes, content, shared)
        flat_dev = fn(
            self.clip_params, bank, im_d, bx_d, ct_d,
            tuple(g[3] for g in groups), tuple(g[4] for g in groups),
            cooc, q8=self._q8,
        )
        return (flat_dev, b, n, b0)

    def run_batch(self, images: Sequence[np.ndarray]) -> Dict[str, dict]:
        """Full TTA pass over a batch of decoded images → per-model raw
        score dict + shared retrieval sims. Single dispatch + single
        device→host transfer per batch (see _dump_fn); numerically equivalent
        to the multi-dispatch loop (tests/test_tta.py)."""
        return self.finish_batch_dump(self.dispatch_batch_dump(images))

    def finish_batch_dump(self, handle) -> Dict[str, dict]:
        """Fetch + unpack a dispatch_batch_dump handle into the per-model
        raw score dict (ref dump contract: Caption_distill_double.py:684-724)."""
        flat_dev, b, n, b0 = handle
        groups = self._model_groups()
        n_cls = next(iter(self.models.values())).text_feats["pos"].shape[0]
        flat = np.asarray(flat_dev, np.float32)

        # host-side unpack of the flat buffer (shapes are known statically)
        results: Dict[str, dict] = {}
        off = 0

        def take(shape):
            nonlocal off
            sz = int(np.prod(shape))
            out = flat[off : off + sz].reshape(shape)
            off += sz
            return out

        per_model = {}
        for names, *_ in groups:
            m = len(names)
            g = take((m, b, n, n_cls))
            l = take((m, b, n, n_cls))
            g_final = take((m, b, n_cls))
            l_final = take((m, b, n_cls))
            for mi, name in enumerate(names):
                per_model[name] = (g[mi], l[mi], g_final[mi], l_final[mi])
        sims = take((b, n, self.topk))
        assert off == flat.size
        for name in self.models:
            g, l, g_final, l_final = per_model[name]
            results[name] = {
                "output": g[:b0, 0],
                "output_pos": l[:b0, 0],
                "output_blocks": g[:b0, 1:],
                "output_pos_blocks": l[:b0, 1:],
                "output_final": g_final[:b0],
                "output_pos_final": l_final[:b0],
            }
        results["_sims"] = {
            "sims_all": sims[:b0, 0], "sims_blocks_all": sims[:b0, 1:]
        }
        return results

    def run_batch_multidispatch(self, images: Sequence[np.ndarray]) -> Dict[str, dict]:
        """Multi-dispatch variant of run_batch (one feature dispatch + one
        score dispatch per model group + host-side aggregation) — kept as the
        independently-structured implementation the single-dispatch path is
        equivalence-tested against."""
        images, b0 = self._mesh_pad(images)
        padded, boxes, content, bucket = self.prepare_batch(images)
        b, n = boxes.shape[0], boxes.shape[1]
        shared = self._is_shared(content)
        feature_fn = self._feature_fn(bucket, n, b, shared=shared)
        bank = self.caption_bank
        if bank is None:
            # zero-size placeholder keeps the jit signature stable
            bank = self._replicated(jnp.zeros((1, 1), jnp.float32))
        im_d, bx_d, ct_d = self._stage_inputs(padded, boxes, content, shared)
        feats, aug, scores = feature_fn(
            self.clip_params, bank, im_d, bx_d, ct_d, q8=self._q8
        )

        results: Dict[str, dict] = {}
        sims_saved = None
        per_model = {}
        for names, flags, _, st_tr, st_tf in self._model_groups():
            out = self._score_group(flags, st_tr, st_tf, feats, aug, scores)
            g_all = np.asarray(out.logits_global, np.float32)
            l_all = np.asarray(out.logits_local, np.float32)
            s_all = np.asarray(out.topk_sim_scores, np.float32)
            for mi, name in enumerate(names):
                per_model[name] = (g_all[mi], l_all[mi], s_all[mi])
        for name in self.models:
            g_flat, l_flat, sims_flat = per_model[name]
            g = g_flat.reshape(b, n, -1)[:b0]
            l = l_flat.reshape(b, n, -1)[:b0]
            sims = sims_flat.reshape(b, n, -1)[:b0]
            if self._member_use_freq(self.models[name]):
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

    # --------------------- fully-fused single-dispatch path ------------------

    def _fused_fn(self, bucket: Tuple[int, int], n_boxes: int, batch: int,
                  shared: bool = False):
        """ONE jitted program: crops → encoder → all ensemble members →
        block fusion (fuse/fuse6) → per-class routing → fused [B, C] scores.

        On a networked TPU every dispatch and every device→host transfer pays
        ~30ms round-trip latency; the per-model python loop + per-output
        np.asarray of `run_batch` costs ~10 round trips per batch. This path
        is one dispatch and one [B, C] transfer — the production fast path
        when per-model dumps aren't requested."""
        key = ("fused", bucket, n_boxes, batch, shared)
        fn = self._feature_fn_cache.get(key)
        if fn is not None:
            return fn
        from ..ops.ensemble import fuse as fuse_fn, fuse6 as fuse6_fn

        clip_cfg = self.clip_cfg
        dtype = self.compute_dtype
        size = self.crop_size
        topk = self.topk
        has_bank = self.caption_bank is not None
        retrieve = self._retrieval_fn()
        use_fused = self._fused
        groups = self._model_groups()
        flags0 = groups[0][1]
        names_order = [n for names, *_ in groups for n in names]
        base = "best" if "best" in names_order else names_order[0]
        coef = 1.5
        b = batch

        crop_batch = _make_batch_crop_fn(
            self.resize_impl, self.antialias, size, shared
        )

        @jax.jit
        def fused_fn(clip_params, bank, images_u8, boxes, content_hw,
                     group_trs, group_tfs, routing_r, cooc, q8=None):
            imgs = images_u8.astype(dtype) / 255.0
            crops = crop_batch(imgs, boxes, content_hw)
            flat = crops.reshape((-1,) + crops.shape[2:])
            feats = encode_image_features(clip_params, clip_cfg, flat, flags0, q8=q8,
                                          fused=use_fused)
            if has_bank:
                aug, scores = retrieve(feats.global_feat, bank)
            else:
                aug = feats.global_feat
                scores = jnp.zeros((flat.shape[0], topk), jnp.float32)
            sims_blocks = scores.reshape(b, n_boxes, -1)[:, 1:]

            results = []
            for gi, (names, flags, g_use_freq, _, _) in enumerate(groups):
                tr, tf = group_trs[gi], group_tfs[gi]

                def score_one(t, f, flags=flags):
                    return test_logits_from_features(
                        t, f, feats, flags, precomputed_retrieval=(aug, scores)
                    )

                out = jax.vmap(score_one)(tr, tf)
                m = len(names)
                g = out.logits_global.reshape(m, b, n_boxes, -1)
                l = out.logits_local.reshape(m, b, n_boxes, -1)
                if g_use_freq:
                    l = adjust_predictions(l, cooc)
                for mi, name in enumerate(names):
                    use6 = name == base
                    f = fuse6_fn if use6 else fuse_fn
                    aux_coef = 1.5 if use6 else 1.0
                    o = g[mi, :, 0] + coef * f(g[mi, :, 1:], sims_blocks)
                    a = l[mi, :, 0] + coef * f(l[mi, :, 1:], sims_blocks)
                    results.append((name, o + aux_coef * a))
            stack = jnp.stack([r for _, r in results])          # [M, B, C]
            fused = jnp.take_along_axis(
                stack.transpose(1, 2, 0), routing_r[None, :, None], axis=2
            )[..., 0]
            return fused

        # routing vector over the stacking order used above
        from ..ops.ensemble import DEFAULT_ROUTING, routing_vector

        n_cls = next(iter(self.models.values())).text_feats["pos"].shape[0]
        # names_order is the exact stacking order of _fused_fn — the routing
        # take_along_axis depends on the two sharing one ordering
        self._fused_routing = self._replicated(jnp.asarray(
            routing_vector(names_order, DEFAULT_ROUTING, base=base, n_cls=n_cls)
        ))
        self._feature_fn_cache[key] = fused_fn
        return fused_fn

    def run_batch_fused(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """Single-dispatch competition scoring → fused [B, n_cls] (the
        impreds.json numbers), everything on device."""
        return self._fetch(self.dispatch_batch_fused(images))

    def stage_batch_fused(self, images: Sequence[np.ndarray]):
        """Host prep + device upload for one fused batch, WITHOUT dispatching
        compute. Returns an opaque staged tuple for dispatch_staged_fused —
        lets a producer thread (or a benchmark) stage batches ahead so the
        host→device transfer never sits on the compute critical path."""
        images, b0 = self._mesh_pad(images)
        padded, boxes, content, bucket = self.prepare_batch(images)
        b, n = boxes.shape[0], boxes.shape[1]
        shared = self._is_shared(content)
        im_d, bx_d, ct_d = self._stage_inputs(padded, boxes, content, shared)
        return (bucket, n, b, shared, im_d, bx_d, ct_d, b0)

    def dispatch_staged_fused(self, staged):
        """Dispatch the fused program on a staged batch; returns the
        on-device [B, C] result without synchronising."""
        bucket, n, b, shared, im_d, bx_d, ct_d, b0 = staged
        fn = self._fused_fn(bucket, n, b, shared=shared)
        groups = self._model_groups()
        bank = self.caption_bank
        if bank is None:
            bank = self._replicated(jnp.zeros((1, 1), jnp.float32))
        cooc = self.cooccurrence
        if cooc is None:
            n_cls = next(iter(self.models.values())).text_feats["pos"].shape[0]
            cooc = self._replicated(jnp.zeros((n_cls, n_cls), jnp.float32))
        out = fn(
            self.clip_params, bank, im_d, bx_d, ct_d,
            tuple(g[3] for g in groups), tuple(g[4] for g in groups),
            self._fused_routing, cooc, q8=self._q8,
        )
        return out if b0 == b else out[:b0]

    def dispatch_batch_fused(self, images: Sequence[np.ndarray]):
        """Async variant of run_batch_fused: returns the on-device fused
        result WITHOUT synchronising. Read with np.asarray(...) later —
        dispatching the next batch first overlaps its host→device transfer
        with this batch's compute (double buffering)."""
        return self.dispatch_staged_fused(self.stage_batch_fused(images))

    def run_batches_fused(self, batches, depth: int = 2):
        """Pipelined fused scoring over an iterable of image lists; yields
        np [B, C] per batch with `depth`-deep dispatch-ahead."""
        from collections import deque

        pending = deque()
        for images in batches:
            pending.append(self.dispatch_batch_fused(images))
            if len(pending) >= depth:
                yield self._fetch(pending.popleft())
        while pending:
            yield self._fetch(pending.popleft())

    def run_batches_fused_staged(self, batches, depth: int = 2,
                                 stage_ahead: int = 2):
        """Producer-thread variant of :meth:`run_batches_fused`: a background
        thread pulls image batches (driving JPEG decode when ``batches`` is a
        lazy ImageBatcher generator), preps and uploads them
        (stage_batch_fused) up to ``stage_ahead`` deep, while the calling
        thread only dispatches compute and reads results — host decode, crop
        geometry, and the host→device transfer all come off the compute
        critical path. This is the production driver for the competition pass
        (the reference's DataLoader worker processes play the same role, ref
        dassl/data/data_manager.py:95-98)."""
        import queue
        import threading
        from collections import deque

        q: "queue.Queue" = queue.Queue(maxsize=max(1, stage_ahead))
        err: list = []
        stop = threading.Event()  # set when the consumer exits for ANY reason

        def _put(item) -> bool:
            # bounded put that aborts when the consumer is gone — a plain
            # q.put would block forever (pinning staged device buffers and a
            # live thread) if the generator is abandoned or raises mid-pass
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for images in batches:
                    if stop.is_set() or not _put(self.stage_batch_fused(images)):
                        return
            except BaseException as e:  # re-raised on the consumer thread
                err.append(e)
            finally:
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        pending = deque()
        try:
            while True:
                staged = q.get()
                if staged is None:
                    break
                pending.append(self.dispatch_staged_fused(staged))
                if len(pending) >= depth:
                    yield self._fetch(pending.popleft())
            while pending:
                yield self._fetch(pending.popleft())
        finally:
            stop.set()
            try:  # drain so a producer mid-put can observe `stop` and exit
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10.0)
        if err:
            raise err[0]
