"""One-off: mlp_int8 group-size sweep at TTA shape."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from leclip_tpu.models.transformer import init_block_stack
from leclip_tpu.ops.quant import quantize_weight

D, B, T = 768, 1220, 200


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
    print(f"{label:<42} {per * 1e3:8.2f} ms", flush=True)


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, T, D), jnp.bfloat16)
    blocks = init_block_stack(jax.random.PRNGKey(1), 1, D, jnp.bfloat16)
    layer = jax.tree.map(lambda a: a[0], blocks)
    fc_i8, fc_s = quantize_weight(layer["mlp"]["fc_kernel"])
    pj_i8, pj_s = quantize_weight(layer["mlp"]["proj_kernel"])

    for g in ("1", "2", "4"):
        os.environ["LECLIP_MLP_G"] = g
        # re-import not needed: env read at trace time inside mlp_int8
        from leclip_tpu.ops.quant_kernels import mlp_int8

        try:
            measure(f"mlp_int8 g={g}",
                    lambda a: mlp_int8(
                        a, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                        fc_i8, fc_s, layer["mlp"]["fc_bias"],
                        pj_i8, pj_s, layer["mlp"]["proj_bias"],
                    ),
                    (x,))
        except Exception as e:
            print(f"mlp_int8 g={g} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
