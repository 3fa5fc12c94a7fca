"""Probe: does the fused bf16 block path win at TEXT-tower shapes?

Text tower at caption-branch scale: [1024 captions, 77 tokens, 512 width],
12 layers, 8 heads, causal. Compares the XLA path, the fused bf16 block
kernels (ops/block_kernels.py) and the W8A8 int8 path over the full stack.
Chained-timing methodology (scripts/_bench.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench import measure


def main():
    from leclip_tpu.models.transformer import init_block_stack, run_transformer
    from leclip_tpu.ops.attention import causal_mask
    from leclip_tpu.ops.quant import quantize_block_stack

    B, T, D, L, H = 1024, 77, 512, 12, 8
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, T, D), jnp.bfloat16)
    blocks = init_block_stack(jax.random.PRNGKey(1), L, D, jnp.bfloat16)
    mask = causal_mask(T)

    measure("text stack XLA bf16 [1024,77,512]x12",
            lambda a, p: run_transformer(a, p, H, mask=mask, causal=True),
            (x, blocks))
    measure("text stack fused bf16",
            lambda a, p: run_transformer(a, p, H, mask=mask, causal=True,
                                         fused=True),
            (x, blocks))
    q8 = jax.jit(quantize_block_stack)(blocks)
    measure("text stack int8",
            lambda a, p, q: run_transformer(a, p, H, mask=mask, causal=True,
                                            q8=q),
            (x, blocks, q8))


if __name__ == "__main__":
    main()
