"""One-off: crop-extraction stage timing at bench shape."""
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
from leclip_tpu.ops.crops import tta_sampling_boxes
from leclip_tpu.ops.resize_matmul import axis_resize_matrix, crop_and_resize_matmul


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
