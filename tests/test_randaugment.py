"""RandAugment ops: shape/range preservation, determinism, geometric checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.ops import randaugment as R


@pytest.fixture()
def img(rng):
    return jnp.asarray(rng.random((32, 48, 3)), jnp.float32)


@pytest.mark.parametrize("op", R.RANDAUGMENT_OPS, ids=lambda f: f.__name__)
def test_each_op_shape_and_range(op, img):
    out = op(img, 0.3, jax.random.PRNGKey(0))
    assert out.shape == img.shape
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    assert arr.min() >= -1e-5 and arr.max() <= 1.0 + 1e-5


def test_identity_at_zero_level(img):
    for op in (R.brightness, R.color, R.contrast, R.sharpness, R.shear_x,
               R.translate_x, R.rotate):
        out = op(img, 0.0, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=2e-2)


def test_translate_moves_pixels(img):
    # level chosen so the pixel shift is integral (48/3 * 0.25 = 4)
    out = R.translate_x(img, 0.25, jax.random.PRNGKey(0))
    shift = int(round(0.25 * img.shape[1] / 3.0))
    np.testing.assert_allclose(
        np.asarray(out[:, shift:-1]), np.asarray(img[:, : img.shape[1] - shift - 1]),
        atol=1e-3,
    )


def test_solarize_inverts_bright(img):
    out = R.solarize(img, 0.9, jax.random.PRNGKey(0))
    bright = np.asarray(img) >= 0.1
    inverted = np.abs(np.asarray(out) - (1 - np.asarray(img))) < 1e-6
    assert (inverted | ~bright).mean() > 0.9


def test_randaugment_jit_and_determinism(img):
    fn = jax.jit(lambda k, im: R.randaugment(k, im, num_ops=2, magnitude=9))
    a = fn(jax.random.PRNGKey(0), img)
    b = fn(jax.random.PRNGKey(0), img)
    c = fn(jax.random.PRNGKey(1), img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4
    assert np.isfinite(np.asarray(a)).all()


def test_equalize_spreads_histogram():
    flat = jnp.full((16, 16, 3), 0.5) + jnp.linspace(0, 0.1, 16)[None, :, None]
    out = R.equalize(flat, 0.5, jax.random.PRNGKey(0))
    assert float(out.max() - out.min()) > float(flat.max() - flat.min())
