"""Property tests for the shared int8 stress helpers
(leclip_tpu/ops/quant_stress.py): the outlier injection must be
FUNCTION-PRESERVING in fp (the whole point — training/scoring through the
injected tower equals the clean tower, only the quantizer sees outliers),
and the fitted profile must carry the documented statistics."""

import jax
import numpy as np

from leclip_tpu.models.transformer import init_block_stack, run_transformer
from leclip_tpu.ops.quant_stress import (apply_outlier_profile,
                                         fitted_channel_scales,
                                         inject_outliers)


def test_apply_outlier_profile_preserves_fp_function():
    layers, width, heads = 3, 64, 4
    blocks = init_block_stack(jax.random.PRNGKey(0), layers, width)
    m = fitted_channel_scales(layers, width, seed=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, width))
    ref = np.asarray(run_transformer(x, blocks, heads), np.float64)
    out = np.asarray(
        run_transformer(x, apply_outlier_profile(blocks, m), heads), np.float64)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_inject_outliers_preserves_fp_function():
    layers, width, heads = 2, 64, 2
    blocks = init_block_stack(jax.random.PRNGKey(2), layers, width)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, width))
    ref = np.asarray(run_transformer(x, blocks, heads), np.float64)
    out = np.asarray(run_transformer(
        x, inject_outliers(blocks, 50.0, heavy_tail=True), heads), np.float64)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fitted_profile_statistics():
    m = fitted_channel_scales(12, 512, seed=0,
                              outlier_frac=0.008, outlier_mult=50.0)
    assert m.shape == (12, 512)
    # 0.8% of 512 = 4 outlier channels per layer at ≥~20× (50× times
    # log-normal body noise)
    n_out = (m > 20.0).sum(axis=1)
    assert (n_out == 4).all(), n_out
    body = m[m < 20.0]
    # log-normal body: median ~1, σ(log) ~0.25
    assert 0.9 < np.median(body) < 1.1
    assert 0.2 < np.std(np.log(body)) < 0.3
