"""Multi-head attention ops.

The single attention entry point used by every tower (text transformer, ViT,
RN50 attention-pool). Two implementations:

* ``xla``   — plain einsum/softmax; XLA fuses this well for short sequences
  (CLIP text is 77 tokens, RN50 pool is 50).
* ``pallas`` — a fused flash-attention TPU kernel (see
  :mod:`leclip_tpu.ops.flash_attention`) for longer sequences / big batches.

Weights follow the packed-QKV layout of the reference towers
(ref: project/my_code/clip/model.py:104-122,211) but stored as ``[in, out]``
kernels so activations hit the MXU without transposes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Measured on v5e (bf16, D=64): XLA's attention emission matches or beats our
# flash kernel at every length we can benchmark (T=197: 165 vs 161ms/12
# layers; T=1024 and T=4096: XLA ≤ flash net of the ~30ms dispatch floor).
# The pallas kernel therefore only auto-engages at lengths where the [T, T]
# logits become a memory hazard; pass impl='pallas' to force it.
_PALLAS_MIN_SEQ = 8192


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, T, Dh] tensors.

    ``mask`` is an additive [T, T] (or broadcastable) float mask. Softmax is
    computed in fp32 regardless of input dtype.
    """
    seq = q.shape[-2]
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and seq >= _PALLAS_MIN_SEQ) else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)

    scale = q.shape[-1] ** -0.5
    # bf16 inputs: store the [.., T, T] logits/probs in bf16 (softmax math
    # still fp32 inside the fused elementwise chain) — the attention matrices
    # dominate HBM traffic at short T and halving them is a ~10% encoder win.
    store_dtype = q.dtype if q.dtype == jnp.bfloat16 else jnp.float32
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    logits = logits.astype(store_dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _attention_bthd(q, k, v, mask, impl):
    """Attention over [B, T, H, Dh] without explicit head transposes — the
    einsums let XLA choose layouts instead of materialising [B,H,T,D]
    permutes (which cost real HBM traffic at TTA batch sizes).

    bf16 inputs get a manual bf16-storage softmax: the [.., T, T] matrices are
    the HBM-traffic hot spot, and jax.nn.softmax's fp32 upcast materialises a
    second fp32 copy (measured: attention core 235ms → ~². The max/sum
    reductions still accumulate in fp32; only element STORAGE is bf16."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    if q.dtype == jnp.bfloat16:
        logits = logits.astype(jnp.bfloat16)
        m = logits.max(-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        probs = (e / s.astype(jnp.bfloat16))
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def multi_head_attention(
    x: jnp.ndarray,
    params: dict,
    n_heads: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Self-attention over [B, T, D] with packed-QKV parameters.

    params: {qkv_kernel [D,3D], qkv_bias [3D], out_kernel [D,D], out_bias [D]}

    ``kv_len`` (static) marks trailing KEY positions as padding: callers that
    pad T up to a tile-friendly length (the ViT encoder pads 197→200) mask the
    pad keys here; pad QUERY rows compute garbage the caller slices off.

    (The W8A8 int8 path does not come through here — it uses the fused
    ``attn_block_int8`` pallas kernel, ops/quant_kernels.py.)
    """
    qkv = x @ params["qkv_kernel"] + params["qkv_bias"]
    return attention_from_qkv(
        qkv, params, n_heads, mask=mask, impl=impl, kv_len=kv_len
    )


def attention_from_qkv(
    qkv: jnp.ndarray,
    params: dict,
    n_heads: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Attention core + output projection given the packed [B, T, 3D] QKV
    activations (lets callers own the QKV matmul — e.g. the W8A8 path feeds
    it from the fused ln_quant kernel)."""
    b, t, d3 = qkv.shape
    d = d3 // 3
    hd = d // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # resident-head pallas kernel: packed-layout, VMEM-resident [T, T] —
        # measured 5.1 vs 10.1 ms (XLA) at ViT-TTA shape [1220, 200, 768].
        # Engages on aligned unmasked sequences big enough that the [T, T]
        # matrices dominate (the 77-token text tower is causal-masked → XLA).
        if on_tpu and mask is None and t % 8 == 0 and t >= 128 and hd == 64:
            impl = "resident"
        else:
            impl = "pallas" if (on_tpu and t >= _PALLAS_MIN_SEQ) else "xla"
    def out_proj(out):
        return out @ params["out_kernel"] + params["out_bias"]

    if impl == "resident":
        from .flash_attention import resident_attention

        out = resident_attention(q, k, v, n_heads, kv_len)
        return out_proj(out)
    if kv_len is not None and kv_len < t:
        pad_mask = jnp.where(jnp.arange(t) < kv_len, 0.0, -1e30)
        mask = pad_mask if mask is None else mask + pad_mask
    if impl == "pallas":
        def heads(y):
            return y.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)

        out = attention_core(heads(q), heads(k), heads(v), mask=mask, impl=impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    else:
        out = _attention_bthd(
            q.reshape(b, t, n_heads, hd),
            k.reshape(b, t, n_heads, hd),
            v.reshape(b, t, n_heads, hd),
            mask, impl,
        ).reshape(b, t, d)
    return out_proj(out)


@functools.lru_cache()
def causal_mask(context_length: int):
    """Additive causal mask (upper triangle = -inf), as the text tower uses.
    Cached as NUMPY so the cache never captures a tracer; tracing constant-
    folds it."""
    import numpy as np

    mask = np.full((context_length, context_length), -np.inf, np.float32)
    return np.triu(mask, k=1)
