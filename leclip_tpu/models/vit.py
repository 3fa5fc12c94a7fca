"""CLIP VisionTransformer — pure-functional JAX, NHWC.

Capability parity with the reference ViT (ref: project/my_code/clip/
model.py:242-276), extended with a dense output mode (all projected patch
tokens) so ViT backbones can drive the same dense-logits path the reference
only wires up for RN50. Patchify is a single reshaped matmul (MXU-friendly —
equivalent to the stride-p conv but avoids conv lowering entirely).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transformer import init_block_stack, layer_norm, run_transformer


def patchify(x: jnp.ndarray, kernel: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] → [B, (H/p)*(W/p), width] via reshape + matmul."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)
    return x @ kernel.astype(x.dtype)


def encode_image_vit(
    x: jnp.ndarray,
    params: dict,
    n_heads: int,
    patch: int,
    dense: bool = False,
    impl: str = "auto",
    q8: dict = None,
    fused: bool = False,
):
    """``q8``: optional stacked int8 block weights (ops/quant.py
    quantize_block_stack) — the W8A8 inference path for the TTA engine.
    ``fused``: bf16 fused-block pallas kernels (ops/block_kernels.py)."""
    tokens = patchify(x, params["patch_kernel"], patch)
    b, n, width = tokens.shape
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype), (b, 1, width))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["positional_embedding"][: n + 1].astype(x.dtype)
    tokens = layer_norm(tokens, params["ln_pre"]["scale"], params["ln_pre"]["bias"])
    # Pad the token axis ONCE to a tile-friendly multiple of 8 (197 → 200 for
    # 224² inputs) so every layer's attention runs on aligned shapes — the
    # resident pallas kernel then needs no per-layer pad/transpose traffic.
    # Pad KEYS are masked via kv_len inside attention (numerically exact:
    # exp(-1e30) == 0); pad QUERY rows are garbage and sliced off below.
    n_real = n + 1
    t_pad = (-n_real) % 8
    if t_pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, t_pad), (0, 0)))
    tokens = run_transformer(
        tokens, params["blocks"], n_heads, impl=impl,
        kv_len=n_real if t_pad else None, q8=q8, fused=fused,
    )
    if t_pad:
        tokens = tokens[:, :n_real]
    tokens = layer_norm(tokens, params["ln_post"]["scale"], params["ln_post"]["bias"])
    proj = params["proj"].astype(x.dtype)
    g = tokens[:, 0] @ proj
    if dense:
        return g, tokens[:, 1:] @ proj
    return g


def init_vit_params(
    key,
    input_resolution: int,
    patch_size: int,
    width: int,
    layers: int,
    output_dim: int,
    dtype=jnp.float32,
) -> dict:
    ks = jax.random.split(key, 5)
    scale = width**-0.5
    grid = input_resolution // patch_size
    fan_in = patch_size * patch_size * 3
    return {
        "patch_kernel": (
            jax.random.normal(ks[0], (fan_in, width)) * (2.0 / fan_in) ** 0.5
        ).astype(dtype),
        "class_embedding": (jax.random.normal(ks[1], (width,)) * scale).astype(dtype),
        "positional_embedding": (
            jax.random.normal(ks[2], (grid * grid + 1, width)) * scale
        ).astype(dtype),
        "ln_pre": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "blocks": init_block_stack(ks[3], layers, width, dtype),
        "ln_post": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "proj": (jax.random.normal(ks[4], (width, output_dim)) * scale).astype(dtype),
    }
