"""Multi-scale sliding-window TTA crop pyramid.

Geometry reproduces the reference's crop factory exactly (ref: Dassl
dassl/data/data_manager.py:311-492 ``DatasetWrapperWithBlock._transform_image``)
— same integer stride/padding formulas, same window families:

per scale s: ① (2s)² square windows over a reflect-padded image,
② 1×2 / 2×1 aspect windows (overflow-clamped), ③ 2:3 / 3:2 windows,
④ for s≥3, oversized 2×3 / 3×2 windows. Scales (2,3,4) → 40+100+164 = 304
crops/image (+1 global). NOTE: the reference's comment `gen_final_ans.py:8-9`
says "116", which counts only the ① square windows — the reference CODE
produces 304, and that is what we reproduce (PARITY.md deviation 1).

TPU-first split: box *geometry* is tiny host-side integer math (numpy, per
image size — cached); the heavy work, cropping + bicubic resize to 224² for
every window, is ONE batched gather-based device kernel with static shapes
(`crop_and_resize`), replacing the reference's per-crop PIL round trips.

The reference's per-crop test transform (resize-smaller-edge-224 →
center-crop-224) equals sampling the crop's central square (side =
min(h, w)) and resizing it to 224² — that identity is what lets every window
become one fixed-size sampling box.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _stride(scale: int, block: int, slide: int) -> int:
    """Reference stride formula: ((s-1)*block)//(slide-1) + 1."""
    return ((scale - 1) * block) // (slide - 1) + 1


def sliding_window_boxes(
    h: int, w: int, scales: Sequence[int] = (2, 3, 4)
) -> Tuple[np.ndarray, List[int]]:
    """All TTA window boxes for an (h, w) image.

    Returns (boxes [N, 4] float32 as (y0, x0, y1, x1) in ORIGINAL image
    coordinates — square-window boxes may extend past the bottom/right edge
    by the reflect padding — and per-scale crop counts)."""
    boxes: List[Tuple[float, float, float, float]] = []
    counts: List[int] = []
    for s in scales:
        start = len(boxes)

        # ① square sliding windows over the reflect-padded image
        slide = 2 * s
        bh, bw = h // s, w // s
        sh, sw = _stride(s, bh, slide), _stride(s, bw, slide)
        for i in range(slide):
            for j in range(slide):
                boxes.append((i * sh, j * sw, i * sh + bh, j * sw + bw))

        # ② 1×2 and 2×1 aspect windows (clamped at the image edge)
        # ③ 2:3 and 3:2 aspect windows
        # ④ (s ≥ 3) oversized 2×3 and 3×2 windows
        families = [
            ((h // s, w * 2 // s), (2 * s, s)),
            ((h * 2 // s, w // s), (s, 2 * s)),
            ((h // s, w * 3 // (2 * s)), (2 * s, 2 * s * 2 // 3)),
            ((h * 3 // (2 * s), w // s), (2 * s * 2 // 3, 2 * s)),
        ]
        if s >= 3:
            families += [
                ((h * 2 // s, w * 3 // s), (s, 2 * s // 3)),
                ((h * 3 // s, w * 2 // s), (2 * s // 3, s)),
            ]
        for (bh, bw), (snh, snw) in families:
            sh, sw = _stride(s, bh, snh), _stride(s, bw, snw)
            for i in range(snh):
                for j in range(snw):
                    ch = min(bh, h - i * sh)
                    cw = min(bw, w - j * sw)
                    if ch <= 0 or cw <= 0:
                        continue
                    boxes.append((i * sh, j * sw, i * sh + ch, j * sw + cw))
        counts.append(len(boxes) - start)
    return np.asarray(boxes, np.float32), counts


def central_square_boxes(boxes: np.ndarray) -> np.ndarray:
    """Map each window to its central square (side = min(h, w)) — the
    resize-smaller-edge + center-crop identity."""
    y0, x0, y1, x1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bh, bw = y1 - y0, x1 - x0
    side = np.minimum(bh, bw)
    cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
    half = side / 2
    return np.stack([cy - half, cx - half, cy + half, cx + half], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=64)
def tta_sampling_boxes(
    h: int, w: int, scales: Tuple[int, ...] = (2, 3, 4)
) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Cached: final square sampling boxes for the full pyramid of an (h, w)
    image, plus per-scale counts."""
    boxes, counts = sliding_window_boxes(h, w, scales)
    return central_square_boxes(boxes), tuple(counts)


# --------------------------- device sampler ---------------------------------


def _reflect_index(idx: jnp.ndarray, size) -> jnp.ndarray:
    """Reflect out-of-range indices (np.pad 'reflect' semantics: edge not
    repeated). `size` may be a traced scalar (per-image content extent of a
    bucket-padded image) or a static int."""
    if isinstance(size, (int, np.integer)):
        if size == 1:
            return jnp.zeros_like(idx)
        period = 2 * (size - 1)
        idx = jnp.abs(idx) % period
        return jnp.where(idx >= size, period - idx, idx)
    size = jnp.asarray(size, idx.dtype)
    period = jnp.maximum(2 * (size - 1), 1)
    wrapped = jnp.abs(idx) % period
    out = jnp.where(wrapped >= size, period - wrapped, wrapped)
    return jnp.where(size <= 1, jnp.zeros_like(idx), out)


def _cubic_weights(t: jnp.ndarray, a: float = -0.5):
    """Keys cubic kernel weights for the 4 taps around fractional offset t
    (a=-0.5 → Catmull-Rom, PIL's bicubic kernel)."""
    t2, t3 = t * t, t * t * t
    w0 = a * (t3 - 2 * t2 + t)                      # tap at floor-1
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1            # tap at floor
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t   # tap at floor+1
    w3 = a * (t2 - t3)                              # tap at floor+2
    return w0, w1, w2, w3


def _gather_axis(img: jnp.ndarray, coords: jnp.ndarray, axis_size: int, method: str):
    """Sample `img` along its FIRST axis at fractional `coords` [O] →
    output [O, ...]. Bilinear (2 taps) or cubic (4 taps) with reflection."""
    f = jnp.floor(coords)
    t = (coords - f).astype(img.dtype)
    base = f.astype(jnp.int32)
    if method == "cubic":
        w0, w1, w2, w3 = _cubic_weights(t)
        taps = [(base - 1, w0), (base, w1), (base + 1, w2), (base + 2, w3)]
    else:
        taps = [(base, (1.0 - t)), (base + 1, t)]
    out = None
    for idx, wgt in taps:
        g = jnp.take(img, _reflect_index(idx, axis_size), axis=0)
        term = g * wgt.reshape((-1,) + (1,) * (img.ndim - 1))
        out = term if out is None else out + term
    return out


def _sample_one(img: jnp.ndarray, box: jnp.ndarray, out_size: int, method: str,
                content_hw=None):
    """Sample one box from [H, W, C] → [out, out, C] (half-pixel centers)."""
    h, w = img.shape[0], img.shape[1]
    if content_hw is not None:
        h, w = content_hw[0], content_hw[1]
    y0, x0, y1, x1 = box[0], box[1], box[2], box[3]
    o = jnp.arange(out_size, dtype=img.dtype)
    ys = y0 + (o + 0.5) * (y1 - y0) / out_size - 0.5
    xs = x0 + (o + 0.5) * (x1 - x0) / out_size - 0.5
    rows = _gather_axis(img, ys, h, method)            # [O, W, C]
    cols = _gather_axis(rows.transpose(1, 0, 2), xs, w, method)  # [O, O, C]
    return cols.transpose(1, 0, 2)


def crop_and_resize(
    image: jnp.ndarray,        # [H, W, C]
    boxes: jnp.ndarray,        # [N, 4] (y0, x0, y1, x1) pixel coords
    out_size: int = 224,
    method: str = "cubic",
    chunk: int = 16,
    content_hw=None,           # optional (h, w) traced scalars: true content
                               # extent of a bucket-padded image
) -> jnp.ndarray:
    """Batched crop+resize with static output shape [N, out, out, C].

    Out-of-bounds coordinates reflect at the CONTENT boundary (the reference
    reflect-pads the raw image before sliding windows, data_manager.py:383-398
    — a window overflowing the image must see mirrored content, not the
    bucket's zero padding). Chunked via lax.map to bound the gather
    intermediate; within a chunk, crops vectorise."""
    n = boxes.shape[0]
    pad = (-n) % chunk
    if pad:
        boxes = jnp.concatenate([boxes, jnp.tile(boxes[-1:], (pad, 1))], axis=0)
    grouped = boxes.reshape(-1, chunk, 4)

    sample = functools.partial(
        _sample_one, image, out_size=out_size, method=method, content_hw=content_hw
    )
    out = jax.lax.map(lambda bs: jax.vmap(sample)(bs), grouped)
    out = out.reshape(-1, out_size, out_size, image.shape[-1])
    return out[:n] if pad else out
