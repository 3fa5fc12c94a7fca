"""One-off: is int8 conv worth building for the RN50 trunk? (STATUS r3 item 2)

The W8A8 transformer megakernels don't touch the RN50 conv trunk (RN50 runs
6,288 crop-fwd/s bf16 end-to-end). Before building any int8-conv path, this
probe answers the gating question: does XLA lower s8xs8->s32
`lax.conv_general_dilated` to the MXU int8 path profitably at RN50's actual
shapes on v5e?

Measures, with the chained-timing methodology of scripts/_bench.py:
  * per-conv bf16 vs PRE-QUANTIZED int8 (the best case for int8 — dynamic
    activation quantization would add an HBM pass per site on top)
  * the full resnet_features trunk in bf16 as the reference cost
  * the stage-weighted int8 upper bound implied by the per-conv numbers

Decision rule: int8 only pays if the pre-quantized conv is >=~1.3x faster
at the layer2-4 shapes that dominate the FLOPs; otherwise the quantize
overhead (4+ extra HBM passes per bottleneck, exactly the plain-XLA W8A8
failure mode measured in r2 for transformers) eats the margin.

MEASURED (v5e, B=64 crops, n=64 chains) — NO-GO, recorded in STATUS.md:
  * per-conv pre-quantized int8 DOES hit the MXU int8 path: 1.5-2.8x at the
    L2-L4 shapes (conv-time sum 5.42 -> 3.12 ms upper bound, 1.74x).
  * but the realistic full-stage W8A8 (dynamic act quant on the clock,
    plain XLA) is a net LOSS over the trunk: 0.92x (layer1 0.64x,
    layer2 1.04x, layer3 1.46x, layer4 1.49x) — the same
    quantize-pass-per-site failure mode measured for the transformers in r2.
  * mixed posture (int8 only layer3/4) = 4.18 -> 3.63 ms stage time = 1.15x
    on convs ~= +5% end-to-end for RN50 — below the complexity bar for a
    non-headline backbone already at 6,288 crop-fwd/s bf16 (25x baseline).
    Capturing more would need fused pallas conv kernels (quantize+conv+BN+
    ReLU in-kernel); deliberately not built.
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

B = 64  # crops per dispatch slice; RN50 bench runs far larger batches but
        # per-conv relative speed is what we're probing


def conv_bf16(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_int8(x_i8, k_i8, stride=1):
    return jax.lax.conv_general_dilated(
        x_i8, k_i8, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# (label, H, Cin, Cout, kh, n_per_trunk) — RN50 @224^2, NHWC.
# n_per_trunk counts how many times this conv shape runs per image forward
# (stride handled as its own row where the spatial size differs).
SHAPES = [
    ("stem 3x3 112^2 3->32 s2", 224, 3, 32, 3, 1),
    ("stem 3x3 112^2 32->32", 112, 32, 32, 3, 1),
    ("stem 3x3 112^2 32->64", 112, 32, 64, 3, 1),
    ("L1 1x1 56^2 64->64", 56, 64, 64, 1, 1),
    ("L1 3x3 56^2 64->64", 56, 64, 64, 3, 3),
    ("L1 1x1 56^2 64->256", 56, 64, 256, 1, 3),
    ("L1 1x1 56^2 256->64", 56, 256, 64, 1, 2),
    ("L2 1x1 56^2 256->128", 56, 256, 128, 1, 1),
    ("L2 3x3 56^2 128->128", 56, 128, 128, 3, 1),
    ("L2 1x1 28^2 128->512", 28, 128, 512, 1, 4),
    ("L2 1x1 28^2 512->128", 28, 512, 128, 1, 3),
    ("L2 3x3 28^2 128->128", 28, 128, 128, 3, 3),
    ("L3 1x1 28^2 512->256", 28, 512, 256, 1, 1),
    ("L3 3x3 28^2 256->256", 28, 256, 256, 3, 1),
    ("L3 1x1 14^2 256->1024", 14, 256, 1024, 1, 6),
    ("L3 1x1 14^2 1024->256", 14, 1024, 256, 1, 5),
    ("L3 3x3 14^2 256->256", 14, 256, 256, 3, 5),
    ("L4 1x1 14^2 1024->512", 14, 1024, 512, 1, 1),
    ("L4 3x3 14^2 512->512", 14, 512, 512, 3, 1),
    ("L4 1x1 7^2 512->2048", 7, 512, 2048, 1, 3),
    ("L4 1x1 7^2 2048->512", 7, 2048, 512, 1, 2),
    ("L4 3x3 7^2 512->512", 7, 512, 512, 3, 2),
]


# ---------------------------------------------------------------------------
# Realistic end-to-end check: a full bottleneck STAGE in plain-XLA W8A8
# (dynamic per-tensor activation quant before every conv, per-channel weight
# scales, BN folded into the int32->bf16 rescale) vs the same stage in bf16.
# This is the number that decides — the per-conv table above ignores the
# quantize passes that killed plain-XLA W8A8 for the transformer towers.
# ---------------------------------------------------------------------------

def _make_stage(key, n_blocks, cin, mid, cout):
    ks = jax.random.split(key, n_blocks * 3 + 1)
    blocks = []
    for i in range(n_blocks):
        c_in = cin if i == 0 else cout
        blocks.append({
            "conv1": jax.random.normal(ks[3 * i], (1, 1, c_in, mid), jnp.bfloat16) * 0.05,
            "conv2": jax.random.normal(ks[3 * i + 1], (3, 3, mid, mid), jnp.bfloat16) * 0.05,
            "conv3": jax.random.normal(ks[3 * i + 2], (1, 1, mid, cout), jnp.bfloat16) * 0.05,
        })
    blocks[0]["downsample"] = jax.random.normal(ks[-1], (1, 1, cin, cout), jnp.bfloat16) * 0.05
    return blocks


def _stage_bf16(x, blocks):
    for p in blocks:
        out = jax.nn.relu(conv_bf16(x, p["conv1"]))
        out = jax.nn.relu(conv_bf16(out, p["conv2"]))
        out = conv_bf16(out, p["conv3"])
        identity = conv_bf16(x, p["downsample"]) if "downsample" in p else x
        x = jax.nn.relu(out + identity)
    return x


def _quant_act(x):
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6) / 127.0
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8), s


def _quant_w(w):
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)), 1e-9) / 127.0
    return jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8), s


def _stage_w8a8(x, qblocks):
    def qconv(h, wq, ws, stride=1, relu=True):
        hq, hs = _quant_act(h)
        out = conv_int8(hq, wq, stride).astype(jnp.bfloat16)
        out = out * (ws * hs).astype(jnp.bfloat16)
        return jax.nn.relu(out) if relu else out

    for p in qblocks:
        out = qconv(x, *p["conv1"])
        out = qconv(out, *p["conv2"])
        out = qconv(out, *p["conv3"], relu=False)
        identity = qconv(x, *p["downsample"], relu=False) if "downsample" in p else x
        x = jax.nn.relu(out + identity)
    return x


# (label, n_blocks, H_in, Cin, mid, Cout) — RN50 stages at their real sizes.
# Stride omitted (all rows measured at output spatial size) — the per-conv
# table shows stride rows separately; stage-relative speed is what matters.
STAGES = [
    ("layer1 3blk 56^2 256/64", 3, 56, 256, 64, 256),
    ("layer2 4blk 28^2 512/128", 4, 28, 512, 128, 512),
    ("layer3 6blk 14^2 1024/256", 6, 14, 1024, 256, 1024),
    ("layer4 3blk 7^2 2048/512", 3, 7, 2048, 512, 2048),
]


def stage_experiment():
    print("\nfull-stage plain-XLA W8A8 (dyn act quant on the clock) vs bf16:")
    key = jax.random.PRNGKey(7)
    tot_b = tot_q = 0.0
    for label, n, h, cin, mid, cout in STAGES:
        blocks = _make_stage(jax.random.fold_in(key, hash(label) % 2**31), n, cin, mid, cout)
        qblocks = [
            {k: _quant_w(v) for k, v in p.items()} for p in blocks
        ]
        x = jax.random.normal(jax.random.fold_in(key, 1), (B, h, h, cin), jnp.bfloat16)
        t_b = measure(f"{label} bf16", _stage_bf16, (x, blocks), n=32)
        t_q = measure(f"{label} W8A8", _stage_w8a8, (x, qblocks), n=32)
        print(f"    -> W8A8/bf16 speed ratio {t_b / t_q:5.2f}x")
        tot_b += t_b
        tot_q += t_q
    print(f"\nall stages bf16: {tot_b * 1e3:7.2f} ms   W8A8: {tot_q * 1e3:7.2f} ms"
          f"   ({tot_b / tot_q:.2f}x)")


def main():
    k = jax.random.PRNGKey(0)
    total_bf16 = total_int8_best = 0.0
    print(f"per-conv, batch {B} crops (s2 rows measured at the input size):")
    for label, h, cin, cout, kh, n in SHAPES:
        stride = 2 if "s2" in label else 1
        kx, kk = jax.random.split(jax.random.fold_in(k, hash(label) % 2**31))
        x = jax.random.normal(kx, (B, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(kk, (kh, kh, cin, cout), jnp.bfloat16) * 0.05
        flops = 2 * B * (h // stride) ** 2 * cin * cout * kh * kh
        # These convs are 0.05-1.5 ms each: at the default chain length the
        # (t_3N - t_N)/2N delta is swamped by per-dispatch jitter on the
        # tunnel (first run produced negative times). n=64 integrates ~128
        # op-executions per delta — per-op noise < ~5%.
        t_b = measure(f"{label} bf16", lambda a, kern=w, s=stride: conv_bf16(a, kern, s), (x,), n=64, flops=flops)
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(w.astype(jnp.float32) * 127), -127, 127).astype(jnp.int8)
        try:
            t_i = measure(f"{label} int8", lambda a, kern=wi, s=stride: conv_int8(a, kern, s), (xi,), n=64, flops=flops)
        except Exception as e:  # noqa: BLE001 — probe records lowering failures
            print(f"{label} int8: FAILED to lower/run: {type(e).__name__}: {e}")
            t_i = t_b
        total_bf16 += n * t_b
        total_int8_best += n * min(t_b, t_i)
        print(f"    -> int8/bf16 speed ratio {t_b / t_i:5.2f}x")

    print(f"\ntrunk conv time per {B} crops, bf16 sum:        {total_bf16 * 1e3:8.2f} ms")
    print(f"trunk conv time, int8-where-it-wins UPPER BOUND: {total_int8_best * 1e3:8.2f} ms")
    print("(upper bound ignores ALL activation-quantize costs — the plain-XLA")
    print(" W8A8 transformer path lost exactly those; treat <1.15x total as a no-go)")

    # ground truth: the actual full trunk forward in bf16
    from leclip_tpu.models.resnet import init_resnet_params, resnet_features

    params = jax.jit(lambda key: init_resnet_params(key, (3, 4, 6, 3), 1024, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    jax.tree.map(lambda a: a.block_until_ready(), params)
    x = jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16)
    measure("FULL resnet_features trunk bf16", lambda a: resnet_features(a, params), (x,), n=16)

    stage_experiment()


if __name__ == "__main__":
    main()
