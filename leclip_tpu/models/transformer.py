"""Shared transformer machinery (pre-LN residual blocks, scan-over-layers).

Used by both the text tower and the ViT. Layers are stacked along a leading
axis and iterated with ``lax.scan`` so XLA compiles ONE block body instead of
12+ unrolled copies — a TPU-first structure the reference's module-per-layer
design has no analogue for (ref behavior: project/my_code/clip/model.py:207-239).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """LayerNorm computed in fp32, result cast back (fp16/bf16-safe, matching
    the reference's LayerNorm subclass, clip/model.py:193-199)."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(orig)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x) — NOT exact GELU."""
    return x * jax.nn.sigmoid(1.702 * x)


def residual_block(x: jnp.ndarray, p: dict, n_heads: int, mask=None,
                   impl: str = "auto", kv_len=None, q8=None,
                   causal: bool = False, fused: bool = False):
    """One pre-LN residual attention block over [B, T, D].

    ``q8`` (optional) enables the W8A8 inference fast path (ops/quant.py +
    ops/quant_kernels.py): LN+quantize fused in one pallas pass feeding an
    int8 QKV matmul, and the whole MLP (LN -> int8 fc -> GELU -> int8 proj ->
    residual) as one pallas kernel with the hidden activations VMEM-resident.
    Attention core and its output projection stay bf16; softmax/LN stats fp32.

    ``fused`` (inference only — the pallas kernels define no VJP) runs the
    same fused-block structure with unquantized bf16 weights
    (ops/block_kernels.py) where the weights fit VMEM; each sub-block falls
    back to the unfused XLA path independently otherwise.
    """
    if fused and q8 is None and (mask is None or causal):
        from ..ops.block_kernels import (
            attn_block_bf16, fits_vmem_attn, fits_vmem_mlp, mlp_bf16,
        )

        d = x.shape[-1]
        hidden = p["mlp"]["fc_kernel"].shape[-1]
        if fits_vmem_attn(d):
            x = attn_block_bf16(
                x, p["ln_1"]["scale"], p["ln_1"]["bias"],
                p["attn"]["qkv_kernel"], p["attn"]["qkv_bias"],
                p["attn"]["out_kernel"], p["attn"]["out_bias"],
                n_heads, kv_len=kv_len, causal=causal,
            )
        else:
            y = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"])
            x = x + multi_head_attention(
                y, p["attn"], n_heads, mask=mask, impl=impl, kv_len=kv_len
            )
        if fits_vmem_mlp(d, hidden) and (x.shape[0] * x.shape[1]) % 8 == 0:
            return mlp_bf16(
                x, p["ln_2"]["scale"], p["ln_2"]["bias"],
                p["mlp"]["fc_kernel"], p["mlp"]["fc_bias"],
                p["mlp"]["proj_kernel"], p["mlp"]["proj_bias"],
            )
        y = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"])
        h = quick_gelu(y @ p["mlp"]["fc_kernel"] + p["mlp"]["fc_bias"])
        return x + (h @ p["mlp"]["proj_kernel"] + p["mlp"]["proj_bias"])
    if q8 is not None:
        if mask is not None and not causal:
            raise ValueError(
                "int8 (q8) blocks support unmasked or causal self-attention "
                "only; arbitrary additive masks must run the bf16 path"
            )
        from ..ops.quant_kernels import attn_block_int8, mlp_int8

        # q8's ln1/ln2 are the channel-equilibrated LN affines (quant.py
        # _equilibrate) — they REPLACE p's, paired with the rescaled kernels
        x = attn_block_int8(
            x, *q8["ln1"],
            *q8["attn"]["qkv"], p["attn"]["qkv_bias"],
            p["attn"]["out_kernel"], p["attn"]["out_bias"],
            n_heads, kv_len=kv_len, causal=causal,
        )
        return mlp_int8(
            x, *q8["ln2"],
            *q8["mlp"]["fc"], p["mlp"]["fc_bias"],
            *q8["mlp"]["proj"], p["mlp"]["proj_bias"],
        )
    y = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"])
    x = x + multi_head_attention(
        y, p["attn"], n_heads, mask=mask, impl=impl, kv_len=kv_len
    )
    y = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"])
    h = quick_gelu(y @ p["mlp"]["fc_kernel"] + p["mlp"]["fc_bias"])
    return x + (h @ p["mlp"]["proj_kernel"] + p["mlp"]["proj_bias"])


def run_transformer(
    x: jnp.ndarray,
    stacked: dict,
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    remat: bool = False,
    kv_len: Optional[int] = None,
    q8: Optional[dict] = None,
    causal: bool = False,
    fused: bool = False,
) -> jnp.ndarray:
    """Apply L stacked residual blocks via lax.scan. ``stacked`` leaves have a
    leading layer axis; ``remat`` enables rematerialisation for memory-bound
    training regimes; ``kv_len`` masks trailing pad keys (see
    multi_head_attention); ``q8`` is an optional stacked int8 weight pytree
    (ops/quant.py quantize_block_stack) scanned alongside ``stacked``;
    ``causal`` marks ``mask`` as the standard lower-triangular mask so the
    int8/fused kernel paths can apply it natively; ``fused`` runs the bf16
    fused-block kernels (ops/block_kernels.py, inference only)."""

    def body(h, xs):
        layer_params, layer_q8 = xs
        return residual_block(
            h, layer_params, n_heads, mask=mask, impl=impl, kv_len=kv_len,
            q8=layer_q8, causal=causal, fused=fused,
        ), None

    if remat:
        body = jax.checkpoint(body)
    # q8=None must not appear inside the scanned xs (scan requires arrays), so
    # broadcast a per-layer None only structurally when quantized.
    if q8 is None:
        out, _ = jax.lax.scan(lambda h, lp: body(h, (lp, None)), x, stacked)
    else:
        out, _ = jax.lax.scan(body, x, (stacked, q8))
    return out


def init_block_stack(key, layers: int, width: int, dtype=jnp.float32) -> dict:
    """Initialise L stacked blocks with the reference's init scheme
    (clip/model.py:352-359): attn std w^-0.5, out/proj std (w^-0.5)(2L)^-0.5,
    fc std (2w)^-0.5."""
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    ks = jax.random.split(key, 4)

    def normal(k, shape, std):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    return {
        "ln_1": {"scale": ones((layers, width)), "bias": zeros((layers, width))},
        "attn": {
            "qkv_kernel": normal(ks[0], (layers, width, 3 * width), attn_std),
            "qkv_bias": zeros((layers, 3 * width)),
            "out_kernel": normal(ks[1], (layers, width, width), proj_std),
            "out_bias": zeros((layers, width)),
        },
        "ln_2": {"scale": ones((layers, width)), "bias": zeros((layers, width))},
        "mlp": {
            "fc_kernel": normal(ks[2], (layers, width, 4 * width), fc_std),
            "fc_bias": zeros((layers, 4 * width)),
            "proj_kernel": normal(ks[3], (layers, 4 * width, width), proj_std),
            "proj_bias": zeros((layers, width)),
        },
    }
