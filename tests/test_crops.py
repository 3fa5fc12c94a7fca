"""Sliding-window pyramid geometry + device crop_and_resize numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.ops.crops import (
    central_square_boxes,
    crop_and_resize,
    sliding_window_boxes,
    tta_sampling_boxes,
)
from leclip_tpu.ops.preprocess import (
    clip_normalize,
    preprocess_eval,
    preprocess_train,
    resize_center_crop,
)


def test_census_stability():
    """Reference-formula census: 40/100/164 crops for scales (2,3,4) across
    typical photo sizes (the square-window subset alone is 16/36/64 — the
    '116' figure in reference comments counts only those)."""
    for hw in [(480, 640), (500, 375), (224, 224), (1024, 683), (333, 500)]:
        boxes, counts = sliding_window_boxes(*hw, (2, 3, 4))
        assert counts == [40, 100, 164], (hw, counts)
        assert len(boxes) == 304


def test_square_windows_cover_padded_image():
    h, w, s = 480, 640, 2
    boxes, counts = sliding_window_boxes(h, w, (s,))
    sq = boxes[: (2 * s) ** 2]
    bh, bw = sq[:, 2] - sq[:, 0], sq[:, 3] - sq[:, 1]
    assert (bh == h // s).all() and (bw == w // s).all()
    # first window at origin; windows may reflect past the edge
    assert sq[0, 0] == 0 and sq[0, 1] == 0
    assert sq[:, 2].max() >= h - 1


def test_central_square():
    boxes = np.array([[0, 0, 100, 200], [10, 20, 110, 70]], np.float32)
    sq = central_square_boxes(boxes)
    sides = sq[:, 2] - sq[:, 0]
    np.testing.assert_allclose(sides, [100, 50])
    np.testing.assert_allclose(sq[0], [0, 50, 100, 150])
    # aspect: second box is 100 tall, 50 wide → square is width-limited
    np.testing.assert_allclose(sq[1], [35, 20, 85, 70])


def test_tta_sampling_boxes_cached():
    a, ca = tta_sampling_boxes(480, 640, (2, 3))
    b, cb = tta_sampling_boxes(480, 640, (2, 3))
    assert a is b and ca == cb  # lru-cached
    sides = a[:, 2] - a[:, 0]
    np.testing.assert_allclose(sides, a[:, 3] - a[:, 1])  # squares


def test_crop_and_resize_identity():
    """Identity box at native size reproduces the image."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 48, 3)), jnp.float32)
    box = jnp.asarray([[0, 0, 32, 32]], jnp.float32)
    out = crop_and_resize(img, box, out_size=32, method="bilinear", chunk=1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img[:, :32]), atol=1e-5)


def test_crop_and_resize_matches_jax_resize():
    """Full-image box == jax.image.resize (same half-pixel convention)."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((40, 40, 3)), jnp.float32)
    box = jnp.asarray([[0, 0, 40, 40]], jnp.float32)
    ours = crop_and_resize(img, box, out_size=24, method="bilinear", chunk=1)[0]
    ref = jax.image.resize(img, (24, 24, 3), method="linear", antialias=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_crop_and_resize_cubic_matches_jax_resize():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((30, 30, 3)), jnp.float32)
    box = jnp.asarray([[0, 0, 30, 30]], jnp.float32)
    ours = crop_and_resize(img, box, out_size=36, method="cubic", chunk=1)[0]
    ref = jax.image.resize(img, (36, 36, 3), method="cubic", antialias=False)
    # border taps differ by design (we reflect, jax clamps) → compare interior
    np.testing.assert_allclose(
        np.asarray(ours)[2:-2, 2:-2], np.asarray(ref)[2:-2, 2:-2], atol=1e-4
    )


def test_reflection_out_of_bounds():
    """Boxes past the edge reflect rather than clamp/zero."""
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    box = jnp.asarray([[0, 2, 4, 6]], jnp.float32)  # right half + 2 reflected cols
    out = crop_and_resize(img, box, out_size=4, method="bilinear", chunk=1)[0]
    col = np.asarray(out[:, :, 0])
    # reflected: cols 2,3 then mirror back 2,1
    np.testing.assert_allclose(col[0], [2, 3, 2, 1], atol=1e-5)


def test_batched_chunking_consistency():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    boxes, _ = tta_sampling_boxes(64, 64, (2,))
    a = crop_and_resize(img, jnp.asarray(boxes), out_size=16, chunk=16)
    b = crop_and_resize(img, jnp.asarray(boxes), out_size=16, chunk=7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert a.shape == (len(boxes), 16, 16, 3)


def test_resize_center_crop_square_input():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((50, 50, 3)), jnp.float32)
    out = resize_center_crop(img, 50)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_preprocess_eval_stats():
    img = jnp.full((300, 400, 3), 128, jnp.uint8)
    out = preprocess_eval(img, size=64)
    assert out.shape == (64, 64, 3)
    expect = clip_normalize(jnp.full((3,), 128 / 255.0))
    np.testing.assert_allclose(np.asarray(out[32, 32]), np.asarray(expect), atol=1e-4)


def test_preprocess_train_shapes_and_determinism():
    img = jnp.asarray(np.random.default_rng(5).integers(0, 255, (120, 160, 3), np.uint8))
    a = preprocess_train(jax.random.PRNGKey(0), img, size=48)
    b = preprocess_train(jax.random.PRNGKey(0), img, size=48)
    c = preprocess_train(jax.random.PRNGKey(1), img, size=48)
    assert a.shape == (48, 48, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_content_boundary_reflection():
    """A box overflowing the content of a bucket-padded image must sample
    REFLECTED content (np.pad 'reflect', the reference's window padding), not
    the bucket's zero padding."""
    rng = np.random.default_rng(6)
    content = rng.random((20, 20, 3)).astype(np.float32)
    padded = np.zeros((32, 32, 3), np.float32)
    padded[:20, :20] = content
    # box extends 8 px past the content's bottom/right edge
    box = jnp.asarray([[4.0, 4.0, 28.0, 28.0]])
    got = crop_and_resize(
        jnp.asarray(padded), box, out_size=24, method="bilinear",
        content_hw=jnp.asarray([20, 20], jnp.int32),
    )
    # reference result: same box sampled from an explicitly reflect-padded image
    reflected = np.pad(content, ((0, 12), (0, 12), (0, 0)), mode="reflect")
    want = crop_and_resize(jnp.asarray(reflected), box, out_size=24, method="bilinear")
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want)[0], atol=1e-5)
    # without content_hw the overflow reads zeros → must differ
    plain = crop_and_resize(jnp.asarray(padded), box, out_size=24, method="bilinear")
    assert np.abs(np.asarray(plain)[0] - np.asarray(want)[0]).max() > 1e-3


def test_four_scale_census():
    """run_eval_4scales.sh variant: scales (2,3,4,5) — census stable."""
    boxes, counts = sliding_window_boxes(480, 640, (2, 3, 4, 5))
    assert counts == [40, 100, 164, 266]
    assert len(boxes) == 570
