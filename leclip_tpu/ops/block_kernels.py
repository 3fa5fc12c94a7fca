"""Pallas TPU kernels for fused bf16 transformer blocks (inference).

The W8A8 megakernels (ops/quant_kernels.py) beat the XLA bf16 path by more
than the int8 MXU rate alone explains: most of the win was FUSION — one pass
over the activations per sub-block instead of LN-write + matmul-read +
attention + out-proj each touching HBM, and the [rows, 4D] MLP hidden living
only in VMEM. This module ports that fused-block *structure* to unquantized
bf16 weights so the bf16 inference path (TEST.PREC bf16 — the fallback when
the int8 task-level gate is not in force, and the only option for non-128-
tileable widths) gets the same HBM-traffic treatment:

* ``attn_block_bf16`` — LN → bf16 QKV matmul → per-head attention (scores
  VMEM-resident, softmax fp32 via the appended ones-column) → out-proj →
  residual, one kernel per crop-group.
* ``mlp_bf16``       — LN → bf16 fc matmul → QuickGELU → bf16 proj matmul →
  residual, tiled over ROWS (LN/MLP are row-independent, so [B, T, D] is
  flattened to [B·T, D] and tiled freely — unlike attention, which needs the
  full token axis per image).

Both require the block weights (bf16) to fit VMEM alongside the activation
tiles (~16 MB/core); ``fits_vmem_*`` report this and callers fall back to
the unfused XLA path (ViT-L's 16.8 MB MLP weights don't fit — its fused
path is the int8 one, whose weights are half the size).

No reference counterpart (the reference runs unfused fp32 CUDA modules,
ref: project/my_code/clip/model.py:207-239); this is TPU-native perf work.
Gradients are not defined — inference only (like the int8 path).

Measured v5e, ViT-B/16 TTA shape [1220, 200, 768] (scripts/probe_perf.py
PROBE=bf16_fused): see README one-table — the kernels are adopted only where
they beat XLA at these shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .quant_kernels import _pick_group_budget

# per-core VMEM is ~16 MB; leave headroom for double-buffered activation
# tiles and compiler temporaries
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem_attn(d: int) -> bool:
    """bf16 QKV [D, 3D] + out [D, D] weights must be VMEM-resident."""
    return 2 * (d * 3 * d + d * d) <= _VMEM_BUDGET_BYTES


def fits_vmem_mlp(d: int, hidden: int) -> bool:
    """bf16 fc [D, H] + proj [H, D] weights must be VMEM-resident."""
    return 2 * (2 * d * hidden) <= _VMEM_BUDGET_BYTES


# ------------------------- fused bf16 attention block ------------------------


def _attn_block_bf16_kernel(x_ref, lns_ref, lnb_ref, qkvw_ref, qkvb_ref,
                            outw_ref, outb_ref, o_ref, *, n_heads, kv_len,
                            causal, eps):
    """Whole pre-LN attention sub-block in VMEM: LN → bf16 QKV matmul →
    per-head attention (scores never leave VMEM, softmax denominator via the
    appended ones-column) → bf16 out-proj → residual. Same structure as
    quant_kernels._attn_block_kernel minus the quantize/rescale steps."""
    x = x_ref[:]  # [G, T, D] bf16
    g, t, d = x.shape
    dh = d // n_heads
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    c = x32 - m
    v = (c * c).mean(-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        y.astype(x.dtype).reshape(g * t, d), qkvw_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
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


def attn_block_bf16(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    qkv_w: jnp.ndarray, qkv_b: jnp.ndarray,
    out_w: jnp.ndarray, out_b: jnp.ndarray,
    n_heads: int,
    kv_len: int = None,
    causal: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x + OutProj(Attention(QKV(LN(x)))) over [B, T, D], one kernel."""
    b, t, d = x.shape
    if kv_len is None:
        kv_len = t
    # dominant buffer: the fp32+bf16 qkv copies, ~g·t·6d elems; bf16 weights
    # take ~2.3× the int8 kernel's, so the group budget steps down one notch
    g = _pick_group_budget(b, t * 6 * d, 2_400_000, (4, 2, 1))
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _attn_block_bf16_kernel, n_heads=n_heads, kv_len=kv_len, causal=causal,
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
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)), vec_3d,
            pl.BlockSpec((d, d), lambda i: (0, 0)), vec_d,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, qkv_w, qkv_b, out_w, out_b)


# ------------------------------ fused bf16 MLP -------------------------------


def _mlp_bf16_kernel(x_ref, lns_ref, lnb_ref, fcw_ref, fcb_ref,
                     pjw_ref, pjb_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # [R, D] row tile
    m = x.mean(-1, keepdims=True)
    c = x - m
    v = (c * c).mean(-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    h = jax.lax.dot_general(
        y.astype(o_ref.dtype), fcw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fcb_ref[:].astype(jnp.float32)[None]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    o = jax.lax.dot_general(
        h.astype(o_ref.dtype), pjw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + pjb_ref[:].astype(jnp.float32)[None]
    o_ref[:] = (x + o).astype(o_ref.dtype)


def mlp_bf16(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    fc_w: jnp.ndarray, fc_b: jnp.ndarray,
    pj_w: jnp.ndarray, pj_b: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x + MLP(LN(x)) over [B, T, D]; the [rows, 4D] hidden activations never
    leave VMEM. LN and the MLP are row-independent, so the input is flattened
    to [B·T, D] and tiled over rows — finer-grained than the int8 kernel's
    batch groups, which keeps the per-program hidden buffer small enough to
    coexist with the 2× bigger bf16 weights."""
    b, t, d = x.shape
    hidden = fc_w.shape[1]
    rows = b * t
    if rows % 8:
        raise ValueError(f"rows ({rows}) must be divisible by 8 for mlp_bf16")
    # row tile: the LARGEST multiple-of-8 divisor of rows whose fp32 hidden
    # buffer [R, H] fits the budget (R=400 at the bench's 244,000 rows /
    # H=3072 → 1.23M elems ≈ 4.9 MB + 9.4 MB weights). A naive power-of-two
    # ladder degenerates to R=8 here (244,000 = 2^5·5^3·61) — 30,500 grid
    # steps whose per-program overhead made the kernel 4.7× SLOWER than XLA.
    budget = 1_600_000
    r = max((c for c in range(8, min(rows, 1024) + 1, 8)
             if rows % c == 0 and c * hidden <= budget), default=8)
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_mlp_bf16_kernel, eps=eps)
    xf = x.reshape(rows, d)
    spec = pl.BlockSpec((r, d), lambda i: (i, 0))
    vec_d = pl.BlockSpec((d,), lambda i: (0,))
    vec_h = pl.BlockSpec((hidden,), lambda i: (0,))
    out = pl.pallas_call(
        kern,
        grid=(rows // r,),
        in_specs=[
            spec, vec_d, vec_d,
            pl.BlockSpec((d, hidden), lambda i: (0, 0)), vec_h,
            pl.BlockSpec((hidden, d), lambda i: (0, 0)), vec_d,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(xf, ln_scale, ln_bias, fc_w, fc_b, pj_w, pj_b)
    return out.reshape(b, t, d)
