"""Matmul-formulated batched crop+resize — the MXU-native crop extractor.

The gather-based sampler (:mod:`leclip_tpu.ops.crops`) spends ~40% of the TTA
step in lane-crossing gathers (measured 264 ms for 1220 crops on v5e vs
~430 ms for the whole ViT-B/16 encoder). Separable resampling is really two
dense matmuls per crop:

    out[o, p, c] = Σ_h Σ_w  R_y[o, h] · img[h, w, c] · R_x[p, w]

with per-crop interpolation matrices R_y [out, H], R_x [out, W]. Dense
matmuls at these shapes run at near-peak on the MXU (~1 PFLOP-equivalent of
gathers becomes ~6 ms of bf16 matmul), and the dense formulation makes
ANTIALIASED resampling free: PIL's bicubic-with-antialias on downscale is the
same matrix with the kernel support widened by the scale factor (ref
transform: dassl/data/transforms/transforms.py:379-411 uses PIL resize,
which always antialiases — the round-1 gather sampler's non-antialiased
Catmull-Rom was PARITY deviation 4).

Semantics:
* kernel = Keys cubic a=-0.5 (Catmull-Rom == PIL's bicubic kernel)
* antialias=True: support scaled by max(1, box_span/out) and rows
  renormalised — PIL behavior on downscale; reduces to the plain kernel on
  upscale
* out-of-range taps reflect at the CONTENT boundary (np.pad 'reflect', the
  reference's square-window padding, data_manager.py:383-398); one
  reflection period is folded in, which covers every TTA window (overflow is
  always < content size)
* rows renormalised in fp32, weights then cast to the image dtype — fp32
  images give PIL-grade accuracy, bf16 images trade ~1e-3 resize noise for
  MXU throughput (the encoder is bf16 anyway)

Known deviation (shared with the gather path, documented in PARITY.md):
kernel taps within 2·scale px of a crop border read the true neighbouring
image pixels, where PIL — which resizes the materialised crop — clamps and
renormalises at the crop edge. Only border rows of each 224² crop differ,
by a sub-1% blend of adjacent real pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cubic_kernel(x: jnp.ndarray, a: float = -0.5) -> jnp.ndarray:
    """Keys cubic convolution kernel (a=-0.5 → Catmull-Rom, PIL's bicubic)."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def axis_resize_matrix(
    lo,
    hi,
    content: jnp.ndarray,
    bucket: int,
    out_size: int,
    antialias: bool = True,
) -> jnp.ndarray:
    """Interpolation matrix [out_size, bucket] resampling a [lo, hi) span of
    an axis with `content` valid pixels (bucket-padded to `bucket`).

    Half-pixel-centered source coordinates (matching crops._sample_one);
    out-of-range taps fold back via one reflection period at the content
    boundary; rows are renormalised (PIL clip-and-renormalise analogue)."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    content = jnp.asarray(content, jnp.float32)
    span = hi - lo
    o = jnp.arange(out_size, dtype=jnp.float32)
    centers = lo + (o + 0.5) * span / out_size - 0.5            # [O]
    if antialias:
        ss = jnp.maximum(span / out_size, 1.0)                  # support scale
    else:
        ss = jnp.float32(1.0)
    i = jnp.arange(bucket, dtype=jnp.float32)[None, :]           # [1, W]
    c = centers[:, None]                                         # [O, 1]
    w = cubic_kernel((i - c) / ss)
    # top reflection: source j = 2(content-1) - i for j >= content → i <= content-2
    top = cubic_kernel((2.0 * (content - 1.0) - i - c) / ss)
    w = w + jnp.where(i <= content - 2.0, top, 0.0)
    # bottom reflection: source j = -i for j < 0 → i >= 1
    bot = cubic_kernel((-i - c) / ss)
    w = w + jnp.where(i >= 1.0, bot, 0.0)
    w = jnp.where(i < content, w, 0.0)                           # zero pad cols
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def crop_and_resize_matmul(
    image: jnp.ndarray,        # [H, W, C], bucket-padded content
    boxes: jnp.ndarray,        # [N, 4] (y0, x0, y1, x1) pixel coords
    out_size: int = 224,
    antialias: bool = True,
    content_hw=None,           # optional (h, w) traced scalars
) -> jnp.ndarray:
    """Batched crop+resize via per-crop separable interpolation matmuls →
    [N, out, out, C]. Drop-in for crops.crop_and_resize(method='cubic') with
    optional PIL-style antialiasing."""
    H, W, C = image.shape
    h = content_hw[0] if content_hw is not None else H
    w = content_hw[1] if content_hw is not None else W

    ry = jax.vmap(
        lambda b: axis_resize_matrix(b[0], b[2], h, H, out_size, antialias)
    )(boxes).astype(image.dtype)                                 # [N, O, H]
    rx = jax.vmap(
        lambda b: axis_resize_matrix(b[1], b[3], w, W, out_size, antialias)
    )(boxes).astype(image.dtype)                                 # [N, O, W]

    # rows pass: one big [N·O, H] @ [H, C·W] matmul (image pre-transposed to
    # channel-major so the crop axis lands MXU-contiguous)
    img_cw = image.transpose(0, 2, 1).reshape(H, C * W)
    tmp = (
        jnp.einsum("noh,hx->nox", ry, img_cw, preferred_element_type=jnp.float32)
        .astype(image.dtype)
        .reshape(-1, out_size, C, W)
    )
    # cols pass: batched [O·C, W] @ [W, O] per crop
    out = jnp.einsum("nocw,npw->nopc", tmp, rx, preferred_element_type=jnp.float32)
    return out.astype(image.dtype)


def crop_and_resize_matmul_batch(
    images: jnp.ndarray,       # [B, H, W, C], all sharing one content size
    boxes: jnp.ndarray,        # [N, 4] — ONE box set for the whole batch
    out_size: int = 224,
    antialias: bool = True,
    content_hw=None,
) -> jnp.ndarray:
    """Shared-geometry variant of :func:`crop_and_resize_matmul`: every image
    has the same content (h, w), so the per-crop interpolation matrices are
    built ONCE for the batch instead of once per image (matrix generation is
    ~half the crop-stage VPU time — 8.2 ms per 4 images at bench shape).
    Returns [B, N, out, out, C]. Uniform-size batches are the common case
    under bucket-sorted batching; mixed batches fall back to the vmapped
    per-image path."""
    B, H, W, C = images.shape
    h = content_hw[0] if content_hw is not None else H
    w = content_hw[1] if content_hw is not None else W
    ry = jax.vmap(
        lambda b: axis_resize_matrix(b[0], b[2], h, H, out_size, antialias)
    )(boxes).astype(images.dtype)                                # [N, O, H]
    rx = jax.vmap(
        lambda b: axis_resize_matrix(b[1], b[3], w, W, out_size, antialias)
    )(boxes).astype(images.dtype)                                # [N, O, W]
    img_cw = images.transpose(0, 3, 2, 1).reshape(B, C * W, H)
    tmp = (
        jnp.einsum("noh,bxh->bnox", ry, img_cw, preferred_element_type=jnp.float32)
        .astype(images.dtype)
        .reshape(B, -1, out_size, C, W)
    )
    out = jnp.einsum(
        "bnocw,npw->bnopc", tmp, rx, preferred_element_type=jnp.float32
    )
    return out.astype(images.dtype)
