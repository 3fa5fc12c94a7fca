"""RandAugment — device-side augmentation policies.

The reference ships torchvision-style AutoAugment/RandAugment policy files in
its transform library (ref: Dassl dassl/data/transforms/randaugment.py (363
LoC), autoaugment.py (423 LoC) — available but unused by the shipped
configs). This is the TPU-native equivalent: each op is a pure jax function
of (image in [0,1], magnitude, PRNG key); `randaugment(key, img, n, m)`
samples N ops at magnitude M per image, fully jittable — augmentation runs on
device instead of PIL.

Geometric ops use inverse-affine bilinear warps (one fused gather); color ops
are elementwise VPU work.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp

MAX_LEVEL = 30.0


# ----------------------------- warp machinery --------------------------------


def affine_warp(img: jnp.ndarray, matrix: jnp.ndarray, fill: float = 0.5) -> jnp.ndarray:
    """Inverse-warp [H, W, C] by a 2×3 affine matrix (output→input coords),
    bilinear sampling, `fill` outside."""
    h, w = img.shape[0], img.shape[1]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    src_y = matrix[0, 0] * yy + matrix[0, 1] * xx + matrix[0, 2]
    src_x = matrix[1, 0] * yy + matrix[1, 1] * xx + matrix[1, 2]

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    ty = (src_y - y0)[..., None]
    tx = (src_x - x0)[..., None]

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]
        return jnp.where(valid[..., None], vals, fill)

    out = (
        gather(y0, x0) * (1 - ty) * (1 - tx)
        + gather(y0, x0 + 1) * (1 - ty) * tx
        + gather(y0 + 1, x0) * ty * (1 - tx)
        + gather(y0 + 1, x0 + 1) * ty * tx
    )
    return out.astype(img.dtype)


def _center_affine(h, w, a, b, c, d):
    """Affine about the image center: [src_y, src_x] = M @ [y-cy, x-cx] + center."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    m = jnp.asarray([[a, b], [c, d]], jnp.float32)
    offset = jnp.asarray([cy, cx]) - m @ jnp.asarray([cy, cx])
    return jnp.asarray([[a, b, offset[0]], [c, d, offset[1]]], jnp.float32)


# ----------------------------- individual ops --------------------------------


def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def identity(img, level, key):
    return img


def brightness(img, level, key):
    return _blend(img, jnp.zeros_like(img), 1.0 + level)


def color(img, level, key):
    gray = img.mean(-1, keepdims=True) * jnp.ones_like(img)
    return _blend(img, gray, 1.0 + level)


def contrast(img, level, key):
    mean = img.mean()
    return _blend(img, jnp.full_like(img, mean), 1.0 + level)


def solarize(img, level, key):
    thresh = 1.0 - jnp.abs(level)
    return jnp.where(img >= thresh, 1.0 - img, img)


def posterize(img, level, key):
    bits = jnp.clip(8 - jnp.floor(jnp.abs(level) * 6).astype(jnp.int32), 1, 8)
    scale = (2.0**bits - 1).astype(img.dtype)
    return jnp.round(img * scale) / scale


def sharpness(img, level, key):
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], img.dtype) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.tile(kernel[None, None], (img.shape[-1], 1, 1, 1)),
        (1, 1), "SAME", feature_group_count=img.shape[-1],
    ).transpose(0, 2, 3, 1)[0]
    return _blend(img, blurred, 1.0 + level)


def autocontrast(img, level, key):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo + 1e-8), 1.0)
    return jnp.clip((img - lo) * scale, 0.0, 1.0)


def equalize(img, level, key):
    """Per-channel histogram equalisation (256 bins)."""
    def eq_channel(c):
        flat = jnp.clip((c * 255).astype(jnp.int32), 0, 255)
        hist = jnp.zeros(256).at[flat.reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        cdf_min = cdf[jnp.argmax(hist > 0)]
        denom = jnp.maximum(cdf[-1] - cdf_min, 1.0)
        lut = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)
        return lut[flat]

    return jnp.stack([eq_channel(img[..., i]) for i in range(img.shape[-1])], axis=-1)


def rotate(img, level, key):
    theta = level * jnp.pi / 6.0  # up to ±30° at full magnitude
    c, s = jnp.cos(theta), jnp.sin(theta)
    return affine_warp(img, _center_affine(img.shape[0], img.shape[1], c, -s, s, c))


def shear_x(img, level, key):
    return affine_warp(img, _center_affine(img.shape[0], img.shape[1], 1.0, 0.0, level, 1.0))


def shear_y(img, level, key):
    return affine_warp(img, _center_affine(img.shape[0], img.shape[1], 1.0, level, 0.0, 1.0))


def translate_x(img, level, key):
    shift = level * img.shape[1] / 3.0
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, -shift]], jnp.float32)
    return affine_warp(img, m)


def translate_y(img, level, key):
    shift = level * img.shape[0] / 3.0
    m = jnp.asarray([[1.0, 0.0, -shift], [0.0, 1.0, 0.0]], jnp.float32)
    return affine_warp(img, m)


def invert(img, level, key):
    """ImageOps.invert — used by the AutoAugment policies (not RandAugment)."""
    return 1.0 - img


def cutout_op(img, level, key):
    h, w = img.shape[0], img.shape[1]
    size = jnp.maximum((jnp.abs(level) * 0.5 * min(h, w)), 1.0)
    k1, k2 = jax.random.split(key)
    cy = jax.random.uniform(k1) * h
    cx = jax.random.uniform(k2) * w
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (jnp.abs(yy - cy) < size / 2) & (jnp.abs(xx - cx) < size / 2)
    return jnp.where(inside[..., None], 0.5, img)


RANDAUGMENT_OPS: List[Callable] = [
    identity, brightness, color, contrast, solarize, posterize, sharpness,
    autocontrast, equalize, rotate, shear_x, shear_y, translate_x,
    translate_y, cutout_op,
]


def randaugment(key, img: jnp.ndarray, num_ops: int = 2, magnitude: float = 9.0):
    """Apply `num_ops` randomly-chosen ops at `magnitude`∈[0,30] with random
    signs (the RandAugment recipe). Image float in [0,1], any HxW."""
    level = magnitude / MAX_LEVEL

    def apply_one(i, carry):
        im, k = carry
        k, k_op, k_sign, k_arg = jax.random.split(k, 4)
        op_idx = jax.random.randint(k_op, (), 0, len(RANDAUGMENT_OPS))
        sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
        lvl = sign * level
        branches = [
            (lambda im_, op=op: op(im_, lvl, k_arg)) for op in RANDAUGMENT_OPS
        ]
        im = jax.lax.switch(op_idx, branches, im)
        return im, k

    out, _ = jax.lax.fori_loop(0, num_ops, apply_one, (img, key))
    return out
