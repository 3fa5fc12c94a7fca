"""Chained-timing encoder microbenchmark (resident kernel vs XLA attention).

Timing method for this tunnel (block_until_ready does NOT wait for execution;
only data fetches do): run the op N and 3N times inside fori_loop-jitted
programs with a scalar dependency carry, per-op = (t_3N - t_N) / 2N — cancels
the ~32 ms dispatch floor and the fetch. The carry must CONSUME every output
element (out.mean()): chaining a single output scalar lets XLA slice-propagate
/ DCE most of the op (a bare matmul "measured" 1370 TF/s that way).

r2 result: encoder 464 -> 349 ms per 1220 crops (auto=resident vs impl=xla).
"""
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench import measure as _measure
from leclip_tpu.models.clip import PRESETS, init_clip_params
from leclip_tpu.models.vit import encode_image_vit

B = 1220


def main():
    cfg = PRESETS["ViT-B/16"]
    init_fn = jax.jit(lambda key: init_clip_params(key, cfg, dtype=jnp.bfloat16))
    params = init_fn(jax.random.PRNGKey(0))["visual"]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16)

    _measure("encoder auto (resident kernel)",
            lambda im, p: encode_image_vit(im, p, 12, 16, dense=True)[1],
            (x, params))
    _measure("encoder impl=xla (old path)",
            lambda im, p: encode_image_vit(im, p, 12, 16, dense=True, impl="xla")[1],
            (x, params))


if __name__ == "__main__":
    main()
