"""Int8 (W8A8) matmul path for the TTA image encoder.

The v5e MXU executes int8 x int8 -> int32 at twice the bf16 rate, and the
ViT-B/16 encoder at TTA batch sizes is matmul-bound (~80% of step time), so
quantizing the transformer's six weight matmuls is the only lever that can
push single-chip TTA throughput past bf16 speed-of-light (~4.4k crop-fwd/s)
toward the >=5k north-star (BASELINE.md targets).

Scheme — standard W8A8 dynamic quantization:
* weights: symmetric per-output-channel int8 (`quantize_weight`), folded once
  at engine build;
* activations: symmetric per-row (per-token) int8 computed on the fly
  (`int8_matmul`); the abs-max + scale pass fuses into the elementwise chain
  that produced the activation (layernorm / GELU), so it costs one extra VMEM
  pass, not an HBM round trip;
* accumulation in int32 on the MXU, rescale `s_x[m] * s_w[n]` in fp32 fused
  into the bias add.

This is an extension over the reference (which runs fp32 CUDA,
ref: project/my_code/trainers/Caption_distill_double.py:746-748 clip_model
.float()). It is the TEST.PREC='auto' default for ViT towers whose width
fills the 128-lane int8 tiles (engine/config.py resolve_test_precision),
off for training (except the opt-in TRAIN.int8_captions frozen branch).
Accuracy: per-op bounds + end-to-end encoder agreement in tests/
test_quant.py, and a task-level probe-mAP gate vs the reference's ±0.2
tolerance in tests/test_quant_gate.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of a [K, N] kernel.

    Returns (w_i8 [K, N], s_w [N] fp32) with w ~= w_i8 * s_w.
    """
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    w_i8 = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return w_i8, s


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row (per-token) int8 quantization of [..., K] activations.

    Returns (x_i8, s_x [..., 1] fp32) with x ~= x_i8 * s_x.
    """
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    x_i8 = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return x_i8, s


def int8_matmul(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """``x @ w`` with dynamic per-row activation quantization.

    x: [..., K] float; w_i8/s_w from :func:`quantize_weight`. The int8xint8
    contraction accumulates in int32 on the MXU; the fp32 rescale and bias
    fold into one elementwise epilogue.
    """
    x_i8, s_x = quantize_rows(x)
    o = jax.lax.dot_general(
        x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = o.astype(jnp.float32) * (s_x * s_w.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_matmul_prequant(
    x_i8: jnp.ndarray,
    s_x: jnp.ndarray,
    w_i8: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Like :func:`int8_matmul` but with activations already quantized (e.g.
    by the fused ``ln_quant`` kernel, ops/quant_kernels.py)."""
    o = jax.lax.dot_general(
        x_i8, w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = o.astype(jnp.float32) * (s_x * s_w.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _equilibrate(ln_scale, ln_bias, kernel):
    """SmoothQuant-style channel equilibration (exact in fp): divide the
    LN-output channel c by m_c and multiply the following kernel's input row
    c by m_c, with m_c = sqrt(|gain_c| / mean|gain|). Real CLIP ViTs carry a
    few high-magnitude LN channels; per-token activation quantization sets
    the whole row's scale from the outlier, crushing every other channel.
    The sqrt split (alpha = 0.5) shares the outlier between the activation
    and weight quantizers."""
    g = ln_scale.astype(jnp.float32)
    m = jnp.sqrt(
        jnp.maximum(jnp.abs(g), 1e-6)
        / jnp.maximum(jnp.mean(jnp.abs(g), axis=-1, keepdims=True), 1e-6)
    )
    m = jnp.clip(m, 1e-2, 1e4)
    ln_q = (
        (g / m).astype(ln_scale.dtype),
        (ln_bias.astype(jnp.float32) / m).astype(ln_bias.dtype),
    )
    return ln_q, kernel * m[..., None].astype(kernel.dtype)


def quantize_stack_on_device(blocks: dict, mesh=None) -> dict:
    """Build the int8 stack for a transformer block pytree: width guard,
    ONE jitted quantization program (eager per-op dispatch over a networked
    TPU is catastrophic, and the stack is tens of MB — jit argument), and
    optional mesh replication. The single entry point for every int8
    consumer (TTA engine, caption bank, trainer caption branch)."""
    width = int(blocks["attn"]["qkv_kernel"].shape[-2])
    if jax.default_backend() == "tpu" and width % 128 != 0:
        # Mosaic int8 matmuls need the contraction dim in full 128-lane
        # tiles; real CLIP towers (512/640/768/1024) all qualify — only toy
        # geometries hit this (CPU interpret mode accepts any width)
        raise ValueError(
            f"int8 transformer kernels on TPU need width % 128 == 0 (got {width})"
        )
    q8 = jax.jit(quantize_block_stack)(blocks)
    if mesh is not None:
        from ..parallel.mesh import replicate

        q8 = replicate(q8, mesh)
    return q8


def quantize_block_stack(blocks: dict) -> dict:
    """Quantize a stacked transformer block pytree (leading layer axis) into
    int8 kernels + fp32 scales; layout mirrors the bf16 stack so the scan in
    run_transformer can carry it alongside.

    The two LN→matmul boundaries (ln_1→qkv, ln_2→fc) are channel-
    equilibrated (see :func:`_equilibrate`) — the returned ``ln1``/``ln2``
    entries REPLACE the block's own LN affine parameters in the int8 path.
    The attention OUT projection is deliberately not quantized: its input is
    the bf16 attention mix, and dynamically quantizing it costs more HBM
    traffic than the int8 matmul saves (measured, scripts/probe_perf.py)."""

    def q(stacked_kernel):
        # vmap over the layer axis so scales are per-layer, per-channel
        return jax.vmap(quantize_weight)(stacked_kernel)

    ln1, qkv_eq = _equilibrate(
        blocks["ln_1"]["scale"], blocks["ln_1"]["bias"],
        blocks["attn"]["qkv_kernel"],
    )
    ln2, fc_eq = _equilibrate(
        blocks["ln_2"]["scale"], blocks["ln_2"]["bias"],
        blocks["mlp"]["fc_kernel"],
    )
    qkv_i8, qkv_s = q(qkv_eq)
    fc_i8, fc_s = q(fc_eq)
    proj_i8, proj_s = q(blocks["mlp"]["proj_kernel"])
    return {
        "ln1": ln1,
        "ln2": ln2,
        "attn": {"qkv": (qkv_i8, qkv_s)},
        "mlp": {"fc": (fc_i8, fc_s), "proj": (proj_i8, proj_s)},
    }
