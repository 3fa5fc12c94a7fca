"""Pallas TPU kernels for the W8A8 encoder path (see ops/quant.py).

Measured on v5e (scripts/probe_perf.py, M = 1220 crops x 200 tokens):
int8 matmuls hit 321 T/s vs bf16's 194, but XLA cannot fuse the dynamic
per-token quantization into the producing elementwise ops — each quantize
costs ~1.6 ms of HBM traffic, and four of them per layer exactly cancel the
matmul savings (full encoder: 353.8 ms int8 vs 348.5 bf16). These kernels
eliminate that overhead by fusing:

* ``ln_quant``  — LayerNorm + per-row abs-max + int8 round in ONE pass over
  the activations: reads x once, writes int8 (HALF the bytes LayerNorm alone
  writes) + a tiny per-row scale column.
* ``mlp_int8`` — the whole MLP with LN folded in: LN -> quantize -> int8
  fc matmul -> rescale+bias -> QuickGELU -> quantize -> int8 proj matmul ->
  rescale+bias + residual add, with the [rows, 3072] hidden activations
  living ONLY in VMEM. Replaces LN pass + fc + GELU pass + proj + residual
  (and both quantizes) with one kernel whose HBM traffic is read-x + write-out
  + weights.

Both run in interpreter mode off-TPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_group(b: int, candidates=(8, 4, 2, 1)) -> int:
    return next(g for g in candidates if b % g == 0)


def _pick_group_budget(b: int, elems_per_unit: int, budget_elems: int,
                       candidates=(8, 4, 2, 1)) -> int:
    """Largest group that divides ``b`` AND keeps the kernel's dominant
    per-program buffer (``g * elems_per_unit`` elements) inside the measured
    VMEM budget. Anchored on v5e measurements for ViT-B shapes; larger
    geometries (ViT-L) automatically step the group down instead of failing
    pallas VMEM allocation at compile time."""
    for g in candidates:
        if b % g == 0 and g * elems_per_unit <= budget_elems:
            return g
    return 1


# --------------------------- LayerNorm + quantize ---------------------------


def _ln_quant_kernel(x_ref, scale_ref, bias_ref, xi_ref, s_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # [G, T, D]
    m = x.mean(-1, keepdims=True)
    c = x - m
    v = (c * c).mean(-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0, 1e-12)
    xi_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def ln_quant(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
             eps: float = 1e-5):
    """Fused LayerNorm + symmetric per-row int8 quantization over [B, T, D].

    Returns (x_i8 [B, T, D], s [B, T, 1] fp32) with LN(x) ~= x_i8 * s.
    """
    b, t, d = x.shape
    g = _pick_group(b)
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_ln_quant_kernel, eps=eps)
    spec = pl.BlockSpec((g, t, d), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((d,), lambda i: (0,))
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[spec, wspec, wspec],
        out_specs=(
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, t, 1), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, d), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x, scale, bias)


# ----------------------- fused int8 attention block -------------------------


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, qkvw_ref, qkvs_ref, qkvb_ref,
                       outw_ref, outb_ref, o_ref, *, n_heads, kv_len, causal,
                       eps):
    """Whole pre-LN attention sub-block in VMEM: LN -> int8 quant -> int8 QKV
    matmul -> rescale -> per-head attention (scores never leave VMEM, softmax
    denominator via the appended ones-column) -> bf16 out-proj -> residual."""
    x = x_ref[:]  # [G, T, D] bf16
    g, t, d = x.shape
    dh = d // n_heads
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    c = x32 - m
    v = (c * c).mean(-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0, 1e-12)
    yi = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    qkv32 = jax.lax.dot_general(
        yi.reshape(g * t, d), qkvw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = qkv32.astype(jnp.float32) * (
        s.reshape(g * t, 1) * qkvs_ref[:].astype(jnp.float32)[None]
    ) + qkvb_ref[:].astype(jnp.float32)[None]
    qkv = qkv.astype(x.dtype).reshape(g, t, 3 * d)

    # additive pad-key (+ causal) bias computed ONCE (exp(-1e30 - m) == 0
    # exactly), not two where-selects per head
    col = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
    valid = col < kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 1)
        valid = valid & (col <= row)
    kbias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    scale = dh**-0.5
    ones = jnp.ones((g, t, 1), x.dtype)
    att_heads = []
    for h in range(n_heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        vv = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        sc = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale + kbias
        mx = sc.max(-1, keepdims=True)
        p = jnp.exp(sc - mx).astype(vv.dtype)
        v_ext = jnp.concatenate([vv, ones], axis=2)
        o_ext = jax.lax.dot_general(
            p, v_ext, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        att_heads.append((o_ext[:, :, :dh] / o_ext[:, :, dh:]).astype(x.dtype))
    # pack heads back to [g·t, D] and run ONE full-width out-proj (K = D keeps
    # the MXU's contraction dimension full, unlike per-head K = dh matmuls)
    att = jnp.concatenate(att_heads, axis=2).reshape(g * t, d)
    out = jax.lax.dot_general(
        att, outw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, t, d)
    o_ref[:] = (x32 + out + outb_ref[:].astype(jnp.float32)[None, None]).astype(
        o_ref.dtype
    )


def attn_block_int8(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    qkv_wi8: jnp.ndarray, qkv_s: jnp.ndarray, qkv_b: jnp.ndarray,
    out_w: jnp.ndarray, out_b: jnp.ndarray,
    n_heads: int,
    kv_len: int = None,
    causal: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x + OutProj(Attention(int8 QKV(LN(x)))) over [B, T, D], one kernel.
    ``causal`` adds the text tower's lower-triangular mask to the pad-key
    bias (same -1e30 additive form)."""
    b, t, d = x.shape
    if kv_len is None:
        kv_len = t
    # dominant buffer: the fp32 qkv block, g·t·3d elems (ViT-B t=200 d=768:
    # g=4 → 1.84M elems, measured fine; budget 2.0M steps ViT-L down to g=2)
    g = _pick_group_budget(b, t * 3 * d, 2_000_000, (4, 2, 1))
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _attn_block_kernel, n_heads=n_heads, kv_len=kv_len, causal=causal,
        eps=eps,
    )
    spec = pl.BlockSpec((g, t, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((d,), lambda i: (0,))
    vec_3d = pl.BlockSpec((3 * d,), lambda i: (0,))
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[
            spec, vec_d, vec_d,
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)), vec_3d, vec_3d,
            pl.BlockSpec((d, d), lambda i: (0, 0)), vec_d,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, qkv_wi8, qkv_s, qkv_b, out_w, out_b)


# ------------------------------ fused int8 MLP ------------------------------


def _mlp_int8_kernel(x_ref, lns_ref, lnb_ref, fcw_ref, fcs_ref, fcb_ref,
                     pjw_ref, pjs_ref, pjb_ref, o_ref, *, eps):
    # LN (+ residual source) in fp32
    x = x_ref[:].astype(jnp.float32)  # [G, T, D]
    g, t, d = x.shape
    m = x.mean(-1, keepdims=True)
    c = x - m
    v = (c * c).mean(-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    # quantize rows (VMEM only)
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0, 1e-12)
    yi = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    # fc: int8 x int8 -> int32 on the MXU
    h32 = jax.lax.dot_general(
        yi.reshape(g * t, d), fcw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h32.astype(jnp.float32) * (
        s.reshape(g * t, 1) * fcs_ref[:].astype(jnp.float32)[None]
    ) + fcb_ref[:].astype(jnp.float32)[None]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    hs = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, 1e-12)
    hi = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        hi, pjw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = o32.astype(jnp.float32) * (hs * pjs_ref[:].astype(jnp.float32)[None])
    o = o + pjb_ref[:].astype(jnp.float32)[None]
    o_ref[:] = (x + o.reshape(g, t, d)).astype(o_ref.dtype)


def mlp_int8(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    fc_wi8: jnp.ndarray, fc_s: jnp.ndarray, fc_b: jnp.ndarray,
    pj_wi8: jnp.ndarray, pj_s: jnp.ndarray, pj_b: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x + MLP(LN(x)) over [B, T, D] with int8 weight matmuls; the hidden
    [rows, 4D] activations never leave VMEM."""
    b, t, d = x.shape
    hidden = fc_wi8.shape[1]
    # dominant buffer: the int32/fp32 hidden block, g·t·hidden elems (ViT-B
    # t=200 hidden=3072: g=2 → 1.23M elems, measured fine/fastest; g=4
    # exceeds VMEM at compile — budget 1.6M also steps ViT-L down to g=1)
    g = _pick_group_budget(b, t * hidden, 1_600_000, (2, 1))
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_mlp_int8_kernel, eps=eps)
    spec = pl.BlockSpec((g, t, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((d,), lambda i: (0,))
    vec_h = pl.BlockSpec((hidden,), lambda i: (0,))
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[
            spec, vec_d, vec_d,
            pl.BlockSpec((d, hidden), lambda i: (0, 0)), vec_h, vec_h,
            pl.BlockSpec((hidden, d), lambda i: (0, 0)), vec_d, vec_d,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, fc_wi8, fc_s, fc_b, pj_wi8, pj_s, pj_b)
