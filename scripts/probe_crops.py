"""One-off: crop-extraction stage timing at bench shape."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from leclip_tpu.ops.crops import tta_sampling_boxes
from leclip_tpu.ops.resize_matmul import axis_resize_matrix, crop_and_resize_matmul


def chain(f, args, n):
    @jax.jit
    def prog(*a):
        def body(i, s):
            out = f(a[0] + s.astype(a[0].dtype), *a[1:])
            return s + 1e-6 * jnp.asarray(out, jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return prog


def measure(label, f, args, n=4):
    p1, p3 = chain(f, args, n), chain(f, args, 3 * n)
    np.asarray(p1(*args)); np.asarray(p3(*args))
    t0 = time.perf_counter(); np.asarray(p1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(p3(*args)); t3 = time.perf_counter() - t0
    per = (t3 - t1) / (2 * n)
    print(f"{label:<46} {per * 1e3:8.2f} ms", flush=True)


def main():
    B = 4
    h, w, bh, bw = 480, 640, 512, 768
    pyramid, _ = tta_sampling_boxes(h, w, (2, 3, 4))
    side = min(h, w)
    gb = np.asarray([[(h - side) / 2, (w - side) / 2,
                      (h + side) / 2, (w + side) / 2]], np.float32)
    boxes = np.concatenate([gb, pyramid]).astype(np.float32)
    boxes_b = jnp.asarray(np.stack([boxes] * B))          # [B, 305, 4]
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, bh, bw, 3)), jnp.bfloat16
    ) / 255.0
    chw = jnp.asarray([[h, w]] * B, jnp.int32)

    measure("crop_and_resize_matmul x4 imgs (305 crops)",
            lambda im, bx, c: jax.vmap(
                lambda i, b, cc: crop_and_resize_matmul(
                    i, b, out_size=224, antialias=True, content_hw=cc)
            )(im, bx, c),
            (imgs, boxes_b, chw))

    # matrix generation alone
    def mats(bx, c):
        ry = jax.vmap(lambda b: axis_resize_matrix(b[0], b[2], c[0], bh, 224, True))(bx)
        rx = jax.vmap(lambda b: axis_resize_matrix(b[1], b[3], c[1], bw, 224, True))(bx)
        return ry.sum() + rx.sum()

    measure("matrix generation alone x4 imgs",
            lambda bx, c: jax.vmap(mats)(bx, c), (boxes_b, chw))


if __name__ == "__main__":
    main()
