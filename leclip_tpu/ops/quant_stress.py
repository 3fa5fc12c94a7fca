"""Activation-outlier stress utilities for the int8 (W8A8) accuracy gates.

Real CLIP/LLM towers show per-channel activation scales that are mildly
log-normal with <1% of channels carrying systematic 20-100× outlier
magnitude (LLM.int8 §3, SmoothQuant §3). These helpers synthesize that
statistic *function-preservingly*: LayerNorm gain/bias channels are scaled
by a per-channel profile m and the consuming kernel's input rows divided by
m, so the fp forward computes the identical function while the dynamic
quantizer sees genuine m× outlier activations at both LN→matmul boundaries.

Shared by tests/test_quant_gate.py (the in-suite gates) and
scripts/quant_gate_realwidth.py (the real-geometry convergence gate whose
measured delta backs ``TEST.PREC auto`` → int8,
engine/config.py resolve_test_precision)."""

from __future__ import annotations

import jax
import numpy as np


def fitted_channel_scales(layers: int, width: int, seed: int = 7,
                          sigma: float = 0.25, outlier_frac: float = 0.008,
                          outlier_mult: float = 50.0) -> np.ndarray:
    """[layers, width] per-channel activation-scale multipliers fitted to the
    published statistics: log-normal body (σ≈0.25) plus ``outlier_frac`` of
    channels at ``outlier_mult``× (defaults: 0.8% at 50× — physical density
    per LLM.int8/SmoothQuant)."""
    rng = np.random.default_rng(seed)
    m = np.exp(rng.normal(0.0, sigma, (layers, width))).astype(np.float32)
    n_out = round(outlier_frac * width) if outlier_frac else 0
    for layer in range(layers):
        if n_out:
            m[layer, rng.choice(width, n_out, replace=False)] *= outlier_mult
    return m


def apply_outlier_profile(blocks: dict, m: np.ndarray) -> dict:
    """Function-preserving injection of the per-channel profile ``m``
    ([layers, width]) into a stacked transformer block pytree: LN(x)*g+b
    channels scaled by m, the consuming kernel's input rows divided by m."""
    b = jax.tree.map(lambda x: x, blocks)  # shallow-copy pytree
    b["ln_1"] = {"scale": b["ln_1"]["scale"] * m, "bias": b["ln_1"]["bias"] * m}
    b["attn"] = dict(b["attn"], qkv_kernel=b["attn"]["qkv_kernel"] / m[:, :, None])
    b["ln_2"] = {"scale": b["ln_2"]["scale"] * m, "bias": b["ln_2"]["bias"] * m}
    b["mlp"] = dict(b["mlp"], fc_kernel=b["mlp"]["fc_kernel"] / m[:, :, None])
    return b


def inject_outliers(blocks: dict, mult: float, channels=(5, 17, 42),
                    heavy_tail: bool = False) -> dict:
    """Pinned-channel variant: the given channels scaled by ``mult`` in every
    layer; ``heavy_tail`` additionally spreads the fitted log-normal body
    over ALL channels."""
    layers, width = np.asarray(blocks["ln_1"]["scale"]).shape
    m = np.ones((layers, width), np.float32)
    if heavy_tail:
        m = m * fitted_channel_scales(layers, width, outlier_frac=0.0)
    m[:, list(channels)] = mult
    return apply_outlier_profile(blocks, m)
