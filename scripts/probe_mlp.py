"""One-off: mlp_int8 timing at TTA shape (group size is auto-selected by the
VMEM-budget rule in quant_kernels; g=2 measured fastest at ViT-B shapes,
g=4 exceeds VMEM at compile)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench import measure
from leclip_tpu.models.transformer import init_block_stack
from leclip_tpu.ops.quant import quantize_weight
from leclip_tpu.ops.quant_kernels import mlp_int8

D, B, T = 768, 1220, 200


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, T, D), jnp.bfloat16)
    blocks = init_block_stack(jax.random.PRNGKey(1), 1, D, jnp.bfloat16)
    layer = jax.tree.map(lambda a: a[0], blocks)
    fc_i8, fc_s = quantize_weight(layer["mlp"]["fc_kernel"])
    pj_i8, pj_s = quantize_weight(layer["mlp"]["proj_kernel"])
    measure("mlp_int8 (auto group)",
            lambda a: mlp_int8(
                a, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                fc_i8, fc_s, layer["mlp"]["fc_bias"],
                pj_i8, pj_s, layer["mlp"]["proj_bias"],
            ),
            (x,))


if __name__ == "__main__":
    main()
