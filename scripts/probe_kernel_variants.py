"""One-off: candidate megakernel variants vs the shipped int8 kernels.

E1: attention block with the OUT-PROJ also int8 (W8A8) — the r2 finding
    "out-proj stays bf16" was measured for the UNFUSED path where the
    attention mix came from HBM; inside the megakernel the mix is
    VMEM-resident, so the dynamic quantize costs only VPU work.
E2: MLP block computing QuickGELU in bf16 instead of fp32 — the result is
    quantized to int8 immediately after, so bf16 rounding is already below
    the quantization noise floor.

Chained timing per scripts/_bench.py.

MEASURED (v5e, [1220, 200, 768]): both variants LOSE —
  attn shipped 8.64 ms vs E1 9.02 ms (the int8 att buffer pushes g=4 over
  the 16 MB VMEM stack limit, so E1 runs at g=2, and the in-kernel quantize
  VPU pass eats the int8 out-proj matmul saving);
  mlp shipped 10.25 ms vs E2 11.00 ms (bf16 exp is not faster than fp32 on
  the VPU — transcendentals evaluate at fp32 internally, the casts are pure
  overhead).
With per-layer matmul floors at the measured ~230 T/s int8 MXU rate for
these M/K/N (not the 321 T/s 8192-cube peak), the shipped kernels are ~89%
matmul-bound: attn+mlp sum 18.9 ms vs a ~16.8 ms pure-matmul floor. The
int8 encoder is at its practical speed-of-light; further e2e gains must
come from outside the encoder (which is 93% of the fused dispatch —
scripts/probe_fused_breakdown.py).
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench import measure

D = 768
B, T = 1220, 200


# ---------------- E1: attn block, int8 out-proj ----------------


def _attn_kernel_e1(x_ref, lns_ref, lnb_ref, qkvw_ref, qkvs_ref, qkvb_ref,
                    outwi_ref, outs_ref, outb_ref, o_ref, *, n_heads, kv_len,
                    eps):
    x = x_ref[:]
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

    col = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
    kbias = jnp.where(col < kv_len, 0.0, -1e30).astype(jnp.float32)
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
    att = jnp.concatenate(att_heads, axis=2).reshape(g * t, d)  # bf16
    # in-kernel dynamic per-row quantize of the VMEM-resident mix
    s2 = jnp.maximum(
        jnp.max(jnp.abs(att), axis=-1, keepdims=True).astype(jnp.float32) / 127.0,
        1e-12,
    )
    ai = jnp.clip(jnp.round(att.astype(jnp.float32) / s2), -127, 127).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        ai, outwi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = o32.astype(jnp.float32) * (s2 * outs_ref[:].astype(jnp.float32)[None])
    out = out.reshape(g, t, d)
    o_ref[:] = (x32 + out + outb_ref[:].astype(jnp.float32)[None, None]).astype(
        o_ref.dtype
    )


def attn_e1(x, lns, lnb, qkv_i8, qkv_s, qkv_b, out_i8, out_s, out_b,
            n_heads, kv_len, g=2):
    b, t, d = x.shape
    kern = functools.partial(_attn_kernel_e1, n_heads=n_heads, kv_len=kv_len,
                             eps=1e-5)
    spec = pl.BlockSpec((g, t, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((d,), lambda i: (0,))
    vec_3d = pl.BlockSpec((3 * d,), lambda i: (0,))
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[
            spec, vec_d, vec_d,
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)), vec_3d, vec_3d,
            pl.BlockSpec((d, d), lambda i: (0, 0)), vec_d, vec_d,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, lns, lnb, qkv_i8, qkv_s, qkv_b, out_i8, out_s, out_b)


# ---------------- E2: mlp block, bf16 GELU ----------------


def _mlp_kernel_e2(x_ref, lns_ref, lnb_ref, fcw_ref, fcs_ref, fcb_ref,
                   pjw_ref, pjs_ref, pjb_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    g, t, d = x.shape
    m = x.mean(-1, keepdims=True)
    c = x - m
    v = (c * c).mean(-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0, 1e-12)
    yi = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    h32 = jax.lax.dot_general(
        yi.reshape(g * t, d), fcw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h32.astype(jnp.float32) * (
        s.reshape(g * t, 1) * fcs_ref[:].astype(jnp.float32)[None]
    ) + fcb_ref[:].astype(jnp.float32)[None]
    # E2: GELU in bf16 (output is int8-quantized right after; bf16 rounding
    # sits below the quantization noise floor)
    hb = h.astype(jnp.bfloat16)
    e = jnp.exp(jnp.asarray(-1.702, jnp.bfloat16) * hb)
    hb = hb / (jnp.asarray(1.0, jnp.bfloat16) + e)
    hs = jnp.maximum(
        jnp.max(jnp.abs(hb), axis=-1, keepdims=True).astype(jnp.float32) / 127.0,
        1e-12,
    )
    hi = jnp.clip(jnp.round(hb.astype(jnp.float32) / hs), -127, 127).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        hi, pjw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = o32.astype(jnp.float32) * (hs * pjs_ref[:].astype(jnp.float32)[None])
    o = o + pjb_ref[:].astype(jnp.float32)[None]
    o_ref[:] = (x + o.reshape(g, t, d)).astype(o_ref.dtype)


def mlp_e2(x, lns, lnb, fc_i8, fc_s, fc_b, pj_i8, pj_s, pj_b):
    b, t, d = x.shape
    hidden = fc_i8.shape[1]
    g = 2
    kern = functools.partial(_mlp_kernel_e2, eps=1e-5)
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
        interpret=jax.default_backend() != "tpu",
    )(x, lns, lnb, fc_i8, fc_s, fc_b, pj_i8, pj_s, pj_b)


def main():
    from leclip_tpu.models.transformer import init_block_stack
    from leclip_tpu.ops.quant import quantize_weight
    from leclip_tpu.ops.quant_kernels import attn_block_int8, mlp_int8

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, T, D), jnp.bfloat16)
    blocks = init_block_stack(jax.random.PRNGKey(1), 1, D, jnp.bfloat16)
    layer = jax.tree.map(lambda a: a[0], blocks)
    qkv_i8, qkv_s = quantize_weight(layer["attn"]["qkv_kernel"])
    out_i8, out_s = quantize_weight(layer["attn"]["out_kernel"])
    fc_i8, fc_s = quantize_weight(layer["mlp"]["fc_kernel"])
    pj_i8, pj_s = quantize_weight(layer["mlp"]["proj_kernel"])

    measure("attn megakernel SHIPPED (bf16 out-proj)",
            lambda a: attn_block_int8(
                a, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
                qkv_i8, qkv_s, layer["attn"]["qkv_bias"],
                layer["attn"]["out_kernel"], layer["attn"]["out_bias"],
                12, kv_len=197),
            (x,))
    measure("attn megakernel E1 (int8 out-proj)",
            lambda a: attn_e1(
                a, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
                qkv_i8, qkv_s, layer["attn"]["qkv_bias"],
                out_i8, out_s, layer["attn"]["out_bias"], 12, 197),
            (x,))
    measure("mlp megakernel SHIPPED (fp32 gelu)",
            lambda a: mlp_int8(
                a, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                fc_i8, fc_s, layer["mlp"]["fc_bias"],
                pj_i8, pj_s, layer["mlp"]["proj_bias"]),
            (x,))
    measure("mlp megakernel E2 (bf16 gelu)",
            lambda a: mlp_e2(
                a, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                fc_i8, fc_s, layer["mlp"]["fc_bias"],
                pj_i8, pj_s, layer["mlp"]["proj_bias"]),
            (x,))

    # numerics: E1/E2 vs shipped on the same inputs
    ship_a = attn_block_int8(
        x, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
        qkv_i8, qkv_s, layer["attn"]["qkv_bias"],
        layer["attn"]["out_kernel"], layer["attn"]["out_bias"], 12, kv_len=197)
    e1_a = attn_e1(
        x, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
        qkv_i8, qkv_s, layer["attn"]["qkv_bias"],
        out_i8, out_s, layer["attn"]["out_bias"], 12, 197)
    da = np.asarray((ship_a - e1_a).astype(jnp.float32))
    na = np.asarray(ship_a.astype(jnp.float32))
    print(f"attn E1 vs shipped: rms delta {np.sqrt((da**2).mean()):.5f} "
          f"(signal rms {np.sqrt((na**2).mean()):.3f})")
    ship_m = mlp_int8(
        x, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
        fc_i8, fc_s, layer["mlp"]["fc_bias"],
        pj_i8, pj_s, layer["mlp"]["proj_bias"])
    e2_m = mlp_e2(
        x, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
        fc_i8, fc_s, layer["mlp"]["fc_bias"],
        pj_i8, pj_s, layer["mlp"]["proj_bias"])
    dm = np.asarray((ship_m - e2_m).astype(jnp.float32))
    nm = np.asarray(ship_m.astype(jnp.float32))
    print(f"mlp E2 vs shipped: rms delta {np.sqrt((dm**2).mean()):.5f} "
          f"(signal rms {np.sqrt((nm**2).mean()):.3f})")


if __name__ == "__main__":
    main()
