"""One-off probe: where does the ViT-B/16 encoder's time go, and can int8 help?

Chained-timing methodology (see microbench_encoder.py docstring): this tunnel's
block_until_ready does not wait for execution, so each op is measured as
(t_3N - t_N) / 2N over fori_loop-chained programs whose carry consumes every
output element.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench import measure

M = 1220 * 200  # crops x padded tokens
D = 768


def main():
    k = jax.random.PRNGKey(0)
    if os.environ.get("PROBE_ONLY_ENCODER", "") == "1":
        encoder_section(k)
        return
    if os.environ.get("PROBE_LAYER_PARTS", "") == "1":
        layer_parts_section(k)
        return
    if os.environ.get("PROBE_VITL", "") == "1":
        vitl_section(k)
        return
    if os.environ.get("PROBE_BF16_FUSED", "") == "1":
        bf16_fused_section(k)
        return
    x = jax.random.normal(k, (M, D), jnp.bfloat16)
    w1 = jax.random.normal(k, (D, 4 * D), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(k, (4 * D, D), jnp.bfloat16) * 0.02

    # --- bf16 matmuls at MLP shapes
    measure("bf16 matmul M x768x3072", lambda a, w: a @ w, (x, w1),
            flops=2 * M * D * 4 * D)
    xi = (x * 10).astype(jnp.int8)
    w1i = (w1 * 500).astype(jnp.int8)
    measure("int8 matmul M x768x3072 (pre-quantized)",
            lambda a, w: jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32),
            (xi, w1i), flops=2 * M * D * 4 * D)

    # int8 incl. dynamic per-row activation quant + fp rescale of output
    def int8_dyn(a, w, wscale):
        s = jnp.max(jnp.abs(a), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
        ai = jnp.round(a.astype(jnp.float32) / s).astype(jnp.int8)
        o = jax.lax.dot_general(ai, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * s * wscale).astype(jnp.bfloat16)

    wscale = (jnp.max(jnp.abs(w1.astype(jnp.float32)), axis=0, keepdims=True) / 127.0)
    measure("int8 matmul + dyn act quant + rescale",
            lambda a, w, ws: int8_dyn(a, w, ws), (x, w1i, wscale),
            flops=2 * M * D * 4 * D)

    # --- elementwise cost floor: one LN-like fp32 pass over [M, 768]
    def ln(a):
        a32 = a.astype(jnp.float32)
        m = a32.mean(-1, keepdims=True)
        v = ((a32 - m) ** 2).mean(-1, keepdims=True)
        return ((a32 - m) * jax.lax.rsqrt(v + 1e-5)).astype(jnp.bfloat16)

    measure("layernorm pass over [M,768]", ln, (x,))

    # --- quick_gelu pass at MLP width
    h = jax.random.normal(k, (M, 4 * D), jnp.bfloat16)
    measure("quickgelu pass over [M,3072]",
            lambda a: a * jax.nn.sigmoid(1.702 * a), (h,))

    # --- full MLP (matmul+gelu+matmul) fused by XLA
    measure("full MLP bf16 (fc+gelu+proj)",
            lambda a, ww1, ww2: (lambda t: t * jax.nn.sigmoid(1.702 * t))(a @ ww1) @ ww2,
            (x, w1, w2), flops=2 * M * D * 4 * D * 2)

    # --- attention: resident kernel vs xla at bench shape
    from leclip_tpu.ops.attention import multi_head_attention
    xt = jax.random.normal(k, (1220, 200, D), jnp.bfloat16)
    attn_p = {
        "qkv_kernel": jax.random.normal(k, (D, 3 * D), jnp.bfloat16) * 0.02,
        "qkv_bias": jnp.zeros((3 * D,), jnp.bfloat16),
        "out_kernel": jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02,
        "out_bias": jnp.zeros((D,), jnp.bfloat16),
    }
    measure("attention layer (resident kernel)",
            lambda a, p: multi_head_attention(a, p, 12, kv_len=197),
            (xt, attn_p))
    measure("attention layer (xla)",
            lambda a, p: multi_head_attention(a, p, 12, impl="xla", kv_len=197),
            (xt, attn_p))

    encoder_section(k)


def layer_parts_section(k):
    """Per-part timing of the int8 residual block at TTA shape."""
    from leclip_tpu.models.transformer import init_block_stack, residual_block
    from leclip_tpu.ops.attention import attention_from_qkv
    from leclip_tpu.ops.quant import (int8_matmul_prequant,
                                      quantize_block_stack, quantize_weight)
    from leclip_tpu.ops.quant_kernels import ln_quant, mlp_int8

    B, T = 1220, 200
    x = jax.random.normal(k, (B, T, D), jnp.bfloat16)
    blocks = init_block_stack(jax.random.PRNGKey(1), 1, D, jnp.bfloat16)
    layer = jax.tree.map(lambda a: a[0], blocks)
    qkv_i8, qkv_s = quantize_weight(layer["attn"]["qkv_kernel"])
    fc_i8, fc_s = quantize_weight(layer["mlp"]["fc_kernel"])
    pj_i8, pj_s = quantize_weight(layer["mlp"]["proj_kernel"])

    measure("ln_quant [1220,200,768]",
            lambda a, s, b: ln_quant(a, s, b)[0],
            (x, layer["ln_1"]["scale"], layer["ln_1"]["bias"]))

    xi, s = ln_quant(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"])

    def qkv_fn(a, w, ws, b):
        return int8_matmul_prequant(a, s, w, ws, bias=b)

    measure("int8 QKV matmul (prequant) 768->2304",
            lambda a, w, ws, b: int8_matmul_prequant(a, s, w, ws, bias=b),
            (xi, qkv_i8, qkv_s, layer["attn"]["qkv_bias"]),
            flops=2 * B * T * D * 3 * D)

    qkv = int8_matmul_prequant(xi, s, qkv_i8, qkv_s, bias=layer["attn"]["qkv_bias"])
    measure("attention core + out proj (from qkv)",
            lambda a, p: attention_from_qkv(a, p, 12, kv_len=197),
            (qkv, layer["attn"]))
    measure("mlp_int8 fused [1220,200,768]",
            lambda a: mlp_int8(
                a, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                fc_i8, fc_s, layer["mlp"]["fc_bias"],
                pj_i8, pj_s, layer["mlp"]["proj_bias"],
            ),
            (x,), flops=2 * B * T * D * 4 * D * 2)
    from leclip_tpu.ops.quant_kernels import attn_block_int8

    measure("attn_block_int8 megakernel",
            lambda a: attn_block_int8(
                a, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
                qkv_i8, qkv_s, layer["attn"]["qkv_bias"],
                layer["attn"]["out_kernel"], layer["attn"]["out_bias"],
                12, kv_len=197,
            ),
            (x,))
    # quantize_block_stack layout (equilibrated ln1/ln2 replace the block's
    # own LN affines in the int8 path)
    q8_full = quantize_block_stack(jax.tree.map(lambda a: a[None], layer))
    q8_layer = jax.tree.map(lambda a: a[0], q8_full)
    measure("full residual block int8",
            lambda a: residual_block(a, layer, 12, kv_len=197, q8=q8_layer),
            (x,))
    measure("full residual block bf16",
            lambda a: residual_block(a, layer, 12, kv_len=197),
            (x,))


def vitl_section(k):
    """ViT-L/14 int8 vs bf16 — validates the VMEM-budget group stepping
    (d=1024, t=257→264: attn kernel must pick g=2, mlp g=1) on hardware."""
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.vit import encode_image_vit
    from leclip_tpu.ops.quant import quantize_block_stack

    cfg = PRESETS["ViT-L/14"]
    init_fn = jax.jit(lambda key: init_clip_params(key, cfg, dtype=jnp.bfloat16))
    params = init_fn(jax.random.PRNGKey(0))["visual"]
    q8 = jax.jit(quantize_block_stack)(params["blocks"])
    B = 256
    xim = jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16)
    measure(f"ViT-L/14 encoder bf16 [{B} crops]",
            lambda im, p: encode_image_vit(im, p, cfg.vision_heads, 14, dense=True)[1],
            (xim, params), n=2)
    measure(f"ViT-L/14 encoder int8 [{B} crops]",
            lambda im, p, q: encode_image_vit(
                im, p, cfg.vision_heads, 14, dense=True, q8=q)[1],
            (xim, params, q8), n=2)
    # bf16 fused-block kernels at ViT-L geometry: the 16.8 MB MLP weights
    # fail fits_vmem_mlp → XLA MLP; the attention kernel must compile at g=1
    measure(f"ViT-L/14 encoder bf16 FUSED [{B} crops]",
            lambda im, p: encode_image_vit(
                im, p, cfg.vision_heads, 14, dense=True, fused=True)[1],
            (xim, params), n=2)


def bf16_fused_section(k):
    """bf16 fused-block kernels (ops/block_kernels.py) vs the XLA bf16 path
    vs int8, at the TTA bench shape — the VERDICT-r3 'push bf16 toward its
    speed-of-light' measurement."""
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.transformer import layer_norm, quick_gelu
    from leclip_tpu.models.vit import encode_image_vit
    from leclip_tpu.ops.attention import multi_head_attention
    from leclip_tpu.ops.block_kernels import attn_block_bf16, mlp_bf16

    cfg = PRESETS["ViT-B/16"]
    init_fn = jax.jit(lambda key: init_clip_params(key, cfg, dtype=jnp.bfloat16))
    params = init_fn(jax.random.PRNGKey(0))["visual"]

    # --- layer-level: one attention sub-block / one MLP sub-block
    b, t = 1220, 200
    x = jax.random.normal(k, (b, t, D), jnp.bfloat16)
    blk = jax.tree.map(lambda a: a[0], params["blocks"])
    attn_flops = b * (8 * D * D + 4 * t * D) * t
    mlp_flops = b * 16 * D * D * t

    def attn_xla(a, p):
        y = layer_norm(a, p["ln_1"]["scale"], p["ln_1"]["bias"])
        return a + multi_head_attention(y, p["attn"], 12, kv_len=197)

    def attn_fused(a, p):
        return attn_block_bf16(
            a, p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_kernel"], p["attn"]["qkv_bias"],
            p["attn"]["out_kernel"], p["attn"]["out_bias"], 12, kv_len=197,
        )

    def mlp_xla(a, p):
        y = layer_norm(a, p["ln_2"]["scale"], p["ln_2"]["bias"])
        h = quick_gelu(y @ p["mlp"]["fc_kernel"] + p["mlp"]["fc_bias"])
        return a + (h @ p["mlp"]["proj_kernel"] + p["mlp"]["proj_bias"])

    def mlp_fused(a, p):
        return mlp_bf16(
            a, p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_kernel"], p["mlp"]["fc_bias"],
            p["mlp"]["proj_kernel"], p["mlp"]["proj_bias"],
        )

    measure("attn block bf16 XLA+resident", attn_xla, (x, blk), flops=attn_flops)
    measure("attn block bf16 FUSED", attn_fused, (x, blk), flops=attn_flops)
    measure("mlp block bf16 XLA", mlp_xla, (x, blk), flops=mlp_flops)
    measure("mlp block bf16 FUSED", mlp_fused, (x, blk), flops=mlp_flops)

    # --- full encoder
    xim = jax.random.normal(k, (1220, 224, 224, 3), jnp.bfloat16)
    enc_flops = 1220 * 12 * (12 * D * D + 2 * 197 * D) * 200 * 2
    measure("encoder bf16 XLA [1220 crops]",
            lambda im, p: encode_image_vit(im, p, 12, 16, dense=True)[1],
            (xim, params), n=2, flops=enc_flops)
    measure("encoder bf16 FUSED [1220 crops]",
            lambda im, p: encode_image_vit(im, p, 12, 16, dense=True, fused=True)[1],
            (xim, params), n=2, flops=enc_flops)

    # fused attention + XLA MLP (what ViT-L gets when its MLP weights
    # don't fit VMEM)
    import leclip_tpu.ops.block_kernels as bk
    orig = bk.fits_vmem_mlp
    bk.fits_vmem_mlp = lambda d, h: False
    try:
        measure("encoder bf16 FUSED-attn-only [1220]",
                lambda im, p: encode_image_vit(im, p, 12, 16, dense=True,
                                               fused=True)[1],
                (xim, params), n=2, flops=enc_flops)
    finally:
        bk.fits_vmem_mlp = orig


def encoder_section(k):
    # --- full encoder: bf16 vs int8 (the decisive number)
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.vit import encode_image_vit
    from leclip_tpu.ops.quant import quantize_block_stack

    cfg = PRESETS["ViT-B/16"]
    init_fn = jax.jit(lambda key: init_clip_params(key, cfg, dtype=jnp.bfloat16))
    params = init_fn(jax.random.PRNGKey(0))["visual"]
    q8 = jax.jit(quantize_block_stack)(params["blocks"])
    xim = jax.random.normal(k, (1220, 224, 224, 3), jnp.bfloat16)
    enc_flops = 1220 * 12 * (12 * D * D + 2 * 197 * D) * 200 * 2
    measure("encoder bf16 [1220 crops]",
            lambda im, p: encode_image_vit(im, p, 12, 16, dense=True)[1],
            (xim, params), n=2, flops=enc_flops)
    measure("encoder int8 [1220 crops]",
            lambda im, p, q: encode_image_vit(im, p, 12, 16, dense=True, q8=q)[1],
            (xim, params, q8), n=2, flops=enc_flops)


if __name__ == "__main__":
    main()
