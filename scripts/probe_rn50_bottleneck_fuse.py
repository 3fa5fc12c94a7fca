"""Probe: can the RN50 trunk beat its measured XLA floor by reformulating
the frozen bottlenecks?  (STATUS r3 open item 6)

The r3 stage breakdown (STATUS item 13) shows L1-L3 each spend ~27 ms per
2,440 crops ABOVE their conv-time sum — elementwise HBM traffic (separate
BN affines, the residual add + relu) that XLA does not fuse into
`lax.conv_general_dilated` outputs.  Two structural levers, both exact for a
FROZEN tower (inference BN = per-channel affine):

  B. fold BN into the conv kernels/biases at parameter-prep time (fp32 fold,
     cast once) — removes one multiply-add pass per conv site; and
  C. additionally express the 1x1 convs as reshaped [M, Cin] @ [Cin, Cout]
     matmuls — XLA fuses elementwise epilogues (bias, residual add, relu)
     into dot outputs, so the bottleneck tail `relu(out + identity)` rides
     the conv3 matmul instead of a separate 3-pass elementwise op.

This probe measures, per stage at B=64 crops (the probe_rn50_int8.py
geometry) and for the full trunk:
  A. the current resnet.bottleneck formulation (ground truth)
  B. BN-folded, convs kept as lax.conv
  C. BN-folded + 1x1-as-matmul (+ fused residual epilogue)
and the per-stage pure conv-time sum as the floor reference.

MEASURED (v5e, B=64, n=32 chains, 2026-08-19) — BOTH levers are NO-GOs:
    stage              A current   B folded-conv   C folded-dot
    layer1 3blk 56^2     1.57 ms    1.55 (1.01x)    4.14 (0.38x)
    layer2 4blk ->28^2   1.31 ms    1.28 (1.02x)    1.83 (0.71x)
    layer3 6blk ->14^2   1.25 ms    1.27 (0.98x)    1.77 (0.71x)
    layer4 3blk ->7^2    0.79 ms    0.81 (0.98x)    1.01 (0.79x)
  * B (BN fold): XLA ALREADY fuses the inference-BN affine into conv
    outputs — folding moves the multiply into the weights and saves
    nothing.  The r3 stage-breakdown's "~27 ms/stage over the conv sum"
    is NOT unfused elementwise traffic; it is the convs' real cost at
    stage geometry (the per-conv floor table times isolated convs on
    layout-friendly inputs).
  * C (1x1 as flattened matmul): 0.4-0.8x — XLA's TPU conv emitter beats
    a reshaped [B*H*W, C] dot at every stage shape, even with the
    residual riding the dot epilogue.  The reshape forces relayouts that
    cost more than the fused epilogue saves.
    FULL trunk (current resnet_features, B=64, n=8): 5.73 ms — the
    stage-A sum (4.92) + stem, i.e. the stage rows account for the
    whole trunk; no inter-stage fusion is being left on the table.
  → conclusion: the current lax.conv formulation (models/resnet.py) IS
    the XLA floor; confirms STATUS open item 6 by direct measurement.
    Only hand-written pallas conv kernels could go further — and the
    repo's hand-tiled-matmul-loses-to-XLA findings make that expectation
    ≤1.1x, below the complexity bar.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench import measure

from leclip_tpu.models.resnet import (
    init_resnet_params,
    resnet_features,
    bottleneck,
    avg_pool,
    conv2d,
    _BN_EPS,
)

B = 64


# ---------------------------------------------------------------------------
# BN folding (exact in fp32: scale into kernel output channels, offset as bias)
# ---------------------------------------------------------------------------

def fold_bn(conv_kernel, bn, dtype=jnp.bfloat16):
    scale = (bn["scale"].astype(jnp.float32)
             * jax.lax.rsqrt(bn["var"].astype(jnp.float32) + _BN_EPS))
    offset = bn["bias"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * scale
    k = conv_kernel.astype(jnp.float32) * scale  # [kh,kw,cin,cout] * [cout]
    return k.astype(dtype), offset.astype(dtype)


def fold_block(p, dtype=jnp.bfloat16):
    out = {}
    for i in (1, 2, 3):
        k, b = fold_bn(p[f"conv{i}"], p[f"bn{i}"], dtype)
        out[f"w{i}"], out[f"b{i}"] = k, b
    if "downsample" in p:
        k, b = fold_bn(p["downsample"]["conv"], p["downsample"]["bn"], dtype)
        out["wd"], out["bd"] = k, b
    return out


def bottleneck_folded_conv(x, f, stride):
    """Variant B: BN folded, all convs stay lax.conv."""
    out = jax.nn.relu(conv2d(x, f["w1"]) + f["b1"])
    out = jax.nn.relu(conv2d(out, f["w2"]) + f["b2"])
    out = avg_pool(out, stride)
    out = conv2d(out, f["w3"]) + f["b3"]
    if "wd" in f:
        identity = conv2d(avg_pool(x, stride), f["wd"]) + f["bd"]
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _dot1x1(x, w, b):
    """[B,H,W,Cin] @ [1,1,Cin,Cout] as a flattened matmul + bias."""
    bb, h, ww, cin = x.shape
    y = x.reshape(bb * h * ww, cin) @ w.reshape(cin, -1) + b
    return y.reshape(bb, h, ww, -1)


def bottleneck_folded_dot(x, f, stride):
    """Variant C: BN folded, 1x1 convs as matmuls, residual in the dot
    epilogue."""
    out = jax.nn.relu(_dot1x1(x, f["w1"], f["b1"]))
    out = jax.nn.relu(conv2d(out, f["w2"]) + f["b2"])
    out = avg_pool(out, stride)
    if "wd" in f:
        identity = _dot1x1(avg_pool(x, stride), f["wd"], f["bd"])
    else:
        identity = x
    return jax.nn.relu(_dot1x1(out, f["w3"], f["b3"]) + identity)


# ---------------------------------------------------------------------------

STAGES = [  # (name, n_blocks, H_in, Cin, mid, stride)
    ("layer1 3blk 56^2", 3, 56, 64, 64, 1),
    ("layer2 4blk 56->28^2", 4, 56, 256, 128, 2),
    ("layer3 6blk 28->14^2", 6, 28, 512, 256, 2),
    ("layer4 3blk 14->7^2", 3, 14, 1024, 512, 2),
]


def main():
    from leclip_tpu.models.resnet import _init_bottleneck

    key = jax.random.PRNGKey(0)

    for name, n_blocks, h, cin, mid, stride in STAGES:
        ks = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31), n_blocks + 1)
        blocks = [_init_bottleneck(ks[0], cin, mid, stride, jnp.bfloat16)]
        # non-zero bn3 scale so folded kernels aren't all-zero (zero-init
        # would let XLA constant-fold); randomize all bn stats slightly
        def randomize_bn(p, k):
            leaves, treedef = jax.tree.flatten(p)
            rks = jax.random.split(k, len(leaves))
            return jax.tree.unflatten(
                treedef,
                # keep var/scale strictly positive (rsqrt) and non-zero so
                # nothing constant-folds away
                [jnp.abs(l + 0.5 * jax.random.normal(rk, l.shape, l.dtype)) + 0.05
                 if l.ndim == 1 else l
                 for l, rk in zip(leaves, rks)],
            )
        blocks[0] = randomize_bn(blocks[0], ks[0])
        for i in range(1, n_blocks):
            blocks.append(randomize_bn(
                _init_bottleneck(ks[i], mid * 4, mid, 1, jnp.bfloat16), ks[i]))
        folded = [fold_block(p) for p in blocks]

        x = jax.random.normal(jax.random.fold_in(key, 1), (B, h, h, cin), jnp.bfloat16)

        def stage_a(a, blks=blocks, s=stride):
            hh = bottleneck(a, blks[0], s)
            for p in blks[1:]:
                hh = bottleneck(hh, p, 1)
            return hh

        def stage_b(a, blks=folded, s=stride):
            hh = bottleneck_folded_conv(a, blks[0], s)
            for p in blks[1:]:
                hh = bottleneck_folded_conv(hh, p, 1)
            return hh

        def stage_c(a, blks=folded, s=stride):
            hh = bottleneck_folded_dot(a, blks[0], s)
            for p in blks[1:]:
                hh = bottleneck_folded_dot(hh, p, 1)
            return hh

        # numerics: folded variants must match A to bf16 rounding
        ya = np.asarray(jax.jit(stage_a)(x), np.float32)
        yb = np.asarray(jax.jit(stage_b)(x), np.float32)
        yc = np.asarray(jax.jit(stage_c)(x), np.float32)
        scale = np.abs(ya).mean() + 1e-6
        print(f"{name}: |B-A| {np.abs(yb - ya).max() / scale:.2e}"
              f"  |C-A| {np.abs(yc - ya).max() / scale:.2e}  (rel to mean|A|)")

        ta = measure(f"{name}  A current", stage_a, (x,), n=32)
        tb = measure(f"{name}  B folded-conv", stage_b, (x,), n=32)
        tc = measure(f"{name}  C folded-dot", stage_c, (x,), n=32)
        print(f"    -> B {ta / tb:5.2f}x   C {ta / tc:5.2f}x\n")

    # full trunk reference number.  Params are passed as ARGUMENTS (closing
    # over them would bake bn3's reference zero-init scale into the HLO and
    # let XLA DCE every conv3) and bn stats randomized positive.
    params = jax.jit(lambda k: init_resnet_params(k, (3, 4, 6, 3), 1024, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    ks = iter(jax.random.split(jax.random.PRNGKey(3), 600))
    params = jax.tree.map(
        lambda l: jnp.abs(l + 0.5 * jax.random.normal(next(ks), l.shape, l.dtype)) + 0.05
        if l.ndim == 1 else l,
        params,
    )
    jax.tree.map(lambda a: a.block_until_ready(), params)
    x = jax.random.normal(key, (B, 224, 224, 3), jnp.bfloat16)
    measure("FULL trunk A (current resnet_features)",
            lambda a, p: resnet_features(a, p), (x, params), n=16)


if __name__ == "__main__":
    main()
