"""Fused image preprocessing — jit-able XLA replacements for the reference's
torchvision/PIL transform stack (ref: Dassl dassl/data/transforms/
transforms.py:188-411).

Test path: resize-smaller-edge → center-crop → CLIP-normalize, expressed as a
single central-square crop_and_resize (one gather kernel, no intermediate
full-size resize). Train path: random-resized-crop OR resize+cutout (the
reference's RandomChoice), random flip, normalize — all driven by jax PRNG
keys so the pipeline is reproducible and device-resident.

Images are float32/bfloat16 in [0, 1], NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .crops import crop_and_resize

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(img: jnp.ndarray, mean=CLIP_MEAN, std=CLIP_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def to_float(img_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return img_u8.astype(dtype) / 255.0


def resize_center_crop(
    img: jnp.ndarray, size: int = 224, method: str = "cubic"
) -> jnp.ndarray:
    """resize-smaller-edge(size) + center-crop(size) ≡ central square resized
    to size² (bicubic, matching INPUT.INTERPOLATION)."""
    h, w = img.shape[0], img.shape[1]
    side = min(h, w)
    y0, x0 = (h - side) / 2.0, (w - side) / 2.0
    box = jnp.asarray([[y0, x0, y0 + side, x0 + side]], jnp.float32)
    return crop_and_resize(img, box, out_size=size, method=method, chunk=1)[0]


def preprocess_eval(
    img_u8: jnp.ndarray, size: int = 224, dtype=jnp.float32
) -> jnp.ndarray:
    """uint8 [H, W, 3] → normalized [size, size, 3] — the full eval transform
    fused into one program."""
    return clip_normalize(resize_center_crop(to_float(img_u8, dtype), size))


# --------------------------- train-time augmentations ------------------------


def random_resized_crop_box(
    key, h: int, w: int,
    scale: Tuple[float, float] = (0.6, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jnp.ndarray:
    """Sample a torchvision-style RandomResizedCrop box [1, 4]. Ten rejection
    trials collapsed into a vectorised pick of the first valid sample, with
    the torchvision center-crop fallback. ``h``/``w`` may be static ints or
    TRACED values (bucket-padded batches pass per-image content extents)."""
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 10
    area = h * w
    target = area * jax.random.uniform(k1, (n,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k2, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    ar = jnp.exp(log_r)
    cw = jnp.sqrt(target * ar)
    ch = jnp.sqrt(target / ar)
    valid = (cw <= w) & (ch <= h)
    # fallback: full central square
    side = jnp.minimum(h, w)
    cw = jnp.where(valid, cw, side)
    ch = jnp.where(valid, ch, side)
    first = jnp.argmax(valid)  # 0 if none valid (fallback values there anyway)
    pick = jnp.where(valid.any(), first, 0)
    cw, ch = cw[pick], ch[pick]
    y0 = jax.random.uniform(k3, ()) * (h - ch)
    x0 = jax.random.uniform(k4, ()) * (w - cw)
    return jnp.stack([y0, x0, y0 + ch, x0 + cw])[None]


def random_resized_crop(
    key, img: jnp.ndarray, size: int = 224,
    scale: Tuple[float, float] = (0.6, 1.0), method: str = "cubic",
) -> jnp.ndarray:
    box = random_resized_crop_box(key, img.shape[0], img.shape[1], scale)
    return crop_and_resize(img, box, out_size=size, method=method, chunk=1)[0]


def random_flip(key, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, img[:, ::-1, :], img)


def cutout(
    key, img: jnp.ndarray, proportion: float = 0.4, fill: float = 0.0
) -> jnp.ndarray:
    """CutoutPIL analogue: one random box of `proportion`-scaled side filled
    with `fill` (ref transforms.py CutoutPIL usage :229-233)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2 = jax.random.split(key)
    ch, cw = int(h * proportion), int(w * proportion)
    y0 = jax.random.randint(k1, (), 0, max(h - ch, 1))
    x0 = jax.random.randint(k2, (), 0, max(w - cw, 1))
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inside = (rows >= y0) & (rows < y0 + ch) & (cols >= x0) & (cols < x0 + cw)
    return jnp.where(inside[..., None], jnp.asarray(fill, img.dtype), img)


def preprocess_train(
    key,
    img_u8: jnp.ndarray,
    size: int = 224,
    rrc_scale: Tuple[float, float] = (0.6, 1.0),
    cutout_proportion: float = 0.4,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """The reference train transform: RandomChoice[RandomResizedCrop,
    Resize+Cutout] → RandomFlip → normalize, fused."""
    img = to_float(img_u8, dtype)
    k_choice, k_rrc, k_cut, k_flip = jax.random.split(key, 4)
    a = random_resized_crop(k_rrc, img, size, rrc_scale)
    b = cutout(k_cut, resize_center_crop(img, size), cutout_proportion)
    img = jnp.where(jax.random.bernoulli(k_choice, 0.5), a, b)
    img = random_flip(k_flip, img)
    return clip_normalize(img)


def preprocess_train_batch(
    key,
    images_u8: jnp.ndarray,    # [B, bh, bw, 3] bucket-padded uint8
    content_hw: jnp.ndarray,   # [B, 2] true (h, w) per image
    size: int = 224,
    rrc_scale: Tuple[float, float] = (0.6, 1.0),
    cutout_proportion: float = 0.4,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched, content-aware train transform for bucket-padded raw images —
    the device side of the (image, caption) pair pipeline. Same augmentation
    family as ``preprocess_train`` (RandomChoice[RRC, center+cutout] → flip →
    CLIP normalize) but boxes are sampled inside each image's true extent and
    sampling runs through the MXU resampler."""
    from .resize_matmul import crop_and_resize_matmul

    b = images_u8.shape[0]
    keys = jax.random.split(key, b)

    def one(k, img_u8, chw):
        img = img_u8.astype(dtype) / 255.0
        k_choice, k_rrc, k_cut, k_flip = jax.random.split(k, 4)
        h = chw[0].astype(jnp.float32)
        w = chw[1].astype(jnp.float32)
        box_rrc = random_resized_crop_box(k_rrc, h, w, rrc_scale)
        side = jnp.minimum(h, w)
        cy, cx = h / 2.0, w / 2.0
        box_cc = jnp.stack(
            [cy - side / 2, cx - side / 2, cy + side / 2, cx + side / 2]
        )[None]
        use_rrc = jax.random.bernoulli(k_choice, 0.5)
        box = jnp.where(use_rrc, box_rrc, box_cc)
        crop = crop_and_resize_matmul(
            img, box.astype(jnp.float32), out_size=size, antialias=True,
            content_hw=chw,
        )[0]
        crop = jnp.where(use_rrc, crop, cutout(k_cut, crop, cutout_proportion))
        crop = random_flip(k_flip, crop)
        return clip_normalize(crop)

    return jax.vmap(one)(keys, images_u8, content_hw)
