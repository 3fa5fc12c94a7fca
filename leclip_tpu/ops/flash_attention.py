"""Fused flash-attention Pallas TPU kernel.

Online-softmax attention over [B, H, T, D] with K/V streamed block-by-block —
the logits matrix never materialises in HBM. Grid is (B·H, Tq-blocks,
Tk-blocks) with the K axis innermost ('arbitrary'), running max/denominator/
accumulator live in VMEM scratch, and the output block is written once on the
last K step. Non-multiple-of-block sequence lengths are zero-padded and the
pad keys are killed with a finite -1e30 bias (finite so padded QUERY rows —
whose entire bias row is -1e30 — still produce a well-defined softmax instead
of exp(inf); those rows are sliced away on return).

This replaces the cuDNN attention the reference gets from
torch.nn.MultiheadAttention (ref: project/my_code/clip/model.py:104-122,211)
in the ViT/text towers. On CPU the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref, l_ref, *, scale):
    """Online-softmax attention over a GROUP of G batch·head slices per
    program — per-program work is G batched [bq,D]×[D,bk] matmuls, enough to
    keep the MXU busy (one-slice-per-program grids at short T leave it
    >90% idle)."""
    jk = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(jk == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]  # [G, bq, D]
    k = k_ref[:]  # [G, bk, D]
    v = v_ref[:]  # [G, bk, D]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, bq, bk]
    s = s + bias_ref[:][None]

    m_prev = m_ref[:, :, :1]                   # [G, bq, 1]
    m_cur = jnp.maximum(m_prev, s.max(-1, keepdims=True))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)                     # [G, bq, bk]
    l_ref[:, :, :1] = l_ref[:, :, :1] * corr + p.sum(-1, keepdims=True)
    m_ref[:, :, :1] = m_cur
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jk == n_k - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] / l_ref[:, :, :1]).astype(o_ref.dtype)


def _flash_kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    """Single-K-block variant: the whole (padded) key axis fits one block, so
    softmax is computed directly — no online stats, no scratch (halves VMEM
    and drops the correction math)."""
    q = q_ref[:]  # [G, bq, D]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale + bias_ref[:][None]
    m = s.max(-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "group", "interpret")
)
def _flash_attention_padded(q, k, v, bias, block_q: int, block_k: int,
                            group: int, interpret: bool):
    bh, tq, d = q.shape
    tk = k.shape[1]
    scale = d**-0.5
    grid = (bh // group, tq // block_q, tk // block_k)
    single_k = tk // block_k == 1

    kernel = functools.partial(
        _flash_kernel_single if single_k else _flash_kernel, scale=scale
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((group, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((group, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((block_q, block_k), lambda b, i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((group, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[] if single_k else [
            pltpu.VMEM((group, block_q, d), jnp.float32),
            pltpu.VMEM((group, block_q, 128), jnp.float32),
            pltpu.VMEM((group, block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias)


def _resident_kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads, kv_len, scale):
    """Resident-head attention: the ENTIRE sequence of a group of images sits
    in VMEM; heads stay packed on the lane axis ([G, T, H·Dh] blocks, the
    natural layout of the qkv projection) and are peeled off as 64-lane
    slices — no HBM head transpose, no sequence padding, no [T, T] matrices
    in HBM. Per head: one MXU QK^T, a fused max/exp/pad-mask VPU pass, and
    one MXU P·[V|1] where the appended ones-column yields the softmax
    denominator as output column Dh (the MXU pads N=64→128 anyway, so the
    extra column is free and replaces a full-width VPU sum+divide)."""
    qa, ka, va = q_ref[:], k_ref[:], v_ref[:]  # [G, T, W]
    g, t, w = qa.shape
    dh = w // n_heads
    col = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
    for h in range(n_heads):
        q = qa[:, :, h * dh:(h + 1) * dh]
        k = ka[:, :, h * dh:(h + 1) * dh]
        v = va[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        # mask pad keys BEFORE the max: pad columns carry garbage activations
        # (the ViT lets pad rows compute junk through all layers) and a pad
        # score that exceeds every real score by ~88 would underflow all real
        # exp() terms → 0 denominator → NaN. Each where fuses into the pass
        # that consumes it (reduce / exp) — no extra VPU sweep.
        valid = col < kv_len
        m = jnp.where(valid, s, NEG_INF).max(-1, keepdims=True)
        p = jnp.where(valid, jnp.exp(s - m), 0.0).astype(v.dtype)
        ones = jnp.ones((g, t, 1), v.dtype)
        v_ext = jnp.concatenate([v, ones], axis=2)
        o_ext = jax.lax.dot_general(
            p, v_ext, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o = o_ext[:, :, :dh] / o_ext[:, :, dh:]
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def _resident_call(q, k, v, n_heads: int, kv_len: int, group: int,
                   interpret: bool):
    b, t, w = q.shape
    dh = w // n_heads
    kern = functools.partial(
        _resident_kernel, n_heads=n_heads, kv_len=kv_len, scale=dh**-0.5
    )
    spec = pl.BlockSpec((group, t, w), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, k, v)


def _xla_packed_attention(q, k, v, n_heads: int, kv_len: int):
    """Reference math for the resident kernel (same [B, T, W] packed layout);
    also the recompute path for its backward pass."""
    b, t, w = q.shape
    dh = w // n_heads
    scale = dh**-0.5

    def heads(x):
        return x.reshape(b, t, n_heads, dh)

    s = jnp.einsum(
        "bqhd,bkhd->bhqk", heads(q) * scale, heads(k),
        preferred_element_type=jnp.float32,
    )
    if kv_len < t:
        s = jnp.where(jnp.arange(t) < kv_len, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), heads(v))
    return o.reshape(b, t, w).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def resident_attention(q, k, v, n_heads: int, kv_len: Optional[int] = None):
    """Fused attention over PACKED-head layout [B, T, H·Dh] → [B, T, H·Dh].

    Designed for the TTA encoder's regime (T a few hundred, huge B): the whole
    sequence is VMEM-resident per program, so the [T, T] score matrices never
    touch HBM and no head-transpose layout change is paid. Measured 5.1 ms vs
    10.1 ms for the tuned XLA path at [1220, 197(→200), 12·64] on v5e.

    `kv_len` masks trailing pad KEY positions (queries beyond kv_len produce
    garbage rows the caller slices off). T must be a multiple of 8; B must be
    divisible by a small group factor (any B works — group falls back to 1).
    Differentiable: the backward pass recomputes attention in XLA form.
    """
    return _resident_fwd(q, k, v, n_heads, kv_len)[0]


def _resident_fwd(q, k, v, n_heads: int, kv_len: Optional[int]):
    b, t, w = q.shape
    if kv_len is None:
        kv_len = t
    # VMEM-budget group selection: dominant buffers are the four [g, t, w]
    # bf16 blocks (q/k/v/o, 8·g·t·w bytes) plus the per-head fp32 score and
    # iota blocks (~12·g·t² bytes). ViT-B (t=200, w=768) fits g=4; ViT-L
    # (t=264, w=1024) at g=4 exceeds the 16 MB scoped-vmem limit (measured:
    # 16.5 MB) and must step down to g=2.
    group = next(
        (g for g in (4, 2, 1)
         if b % g == 0 and g * (8 * t * w + 12 * t * t) <= 11_000_000),
        1,
    )
    interpret = jax.default_backend() != "tpu"
    out = _resident_call(q, k, v, n_heads, kv_len, group, interpret)
    return out, (q, k, v)


def _resident_bwd(n_heads, kv_len, res, g):
    q, k, v = res
    kv = q.shape[1] if kv_len is None else kv_len
    _, vjp = jax.vjp(
        lambda qq, kk, vv: _xla_packed_attention(qq, kk, vv, n_heads, kv), q, k, v
    )
    return vjp(g)


resident_attention.defvjp(_resident_fwd, _resident_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    block_k: int = 256,
    group: int = 8,
) -> jnp.ndarray:
    """Fused attention over [B, H, T, D]; `mask` is an additive [Tq, Tk]
    float mask (e.g. causal). Matches the XLA path to fp32-accumulation
    rounding. ``group`` batch·head slices are processed per program."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    # TPU tiling: the bias block's last dim is block_k → multiple of 128;
    # block_q only needs sublane (8) alignment.
    block_q = min(block_q, _round_up(tq, 8))
    block_q = _round_up(block_q, 8)
    block_k = max(128, min(block_k, _round_up(tk, 128)))
    block_k = _round_up(block_k, 128)
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)
    bh = b * h
    while group > 1 and bh % group:
        group //= 2

    def flat(x, t_p, t):
        x = x.reshape(bh, t, d)
        if t_p != t:
            x = jnp.pad(x, ((0, 0), (0, t_p - t), (0, 0)))
        return x

    qf, kf, vf = flat(q, tq_p, tq), flat(k, tk_p, tk), flat(v, tk_p, tk)

    bias = jnp.zeros((tq_p, tk_p), jnp.float32)
    if mask is not None:
        m = jnp.maximum(jnp.asarray(mask, jnp.float32), NEG_INF)
        bias = bias.at[:tq, :tk].set(m)
    if tk_p != tk:
        bias = bias.at[:, tk:].set(NEG_INF)

    interpret = jax.default_backend() != "tpu"
    out = _flash_attention_padded(qf, kf, vf, bias, block_q, block_k, group, interpret)
    return out[:, :tq].reshape(b, h, tq, d)
