"""Decompose the train step: caption text-encode vs prompt branch vs grad."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from leclip_tpu.models.clip import PRESETS, init_clip_params
from leclip_tpu.models.dense_clip import DenseFlags, encode_captions
from leclip_tpu.ops.attention import attention_core

B, T, Wt, Ht = 1024, 77, 512, 8


def chain(f, args, n):
    @jax.jit
    def prog(*a):
        def body(i, s):
            out = f(a[0] + s.astype(a[0].dtype), *a[1:])
            return s + 1e-6 * jax.tree.leaves(out)[0].mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return prog


def measure(label, f, args, n=6, flops=None):
    p1, p3 = chain(f, args, n), chain(f, args, 3 * n)
    r = p1(*args); np.asarray(r)
    r = p3(*args); np.asarray(r)
    t0 = time.perf_counter(); r = p1(*args); np.asarray(r); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); r = p3(*args); np.asarray(r); t3 = time.perf_counter() - t0
    per = (t3 - t1) / (2 * n)
    tf = f" {flops / per / 1e12:.1f} TF/s" if flops else ""
    print(f"{label:<46} {per * 1e3:8.2f} ms{tf}", flush=True)
    return per


def main():
    cfg = PRESETS["RN50"]
    init_fn = jax.jit(lambda k: init_clip_params(k, cfg))
    params = init_fn(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    flags = DenseFlags()

    toks = jnp.zeros((B, T), jnp.int32).at[:, :10].set(
        jax.random.randint(jax.random.PRNGKey(1), (B, 10), 1, 40000)
    ).at[:, 10].set(49407)
    emb = params["text"]["token_embedding"][toks].astype(jnp.bfloat16)

    # full caption encode (12-layer text transformer, causal)
    measure("encode_captions [1024,77]",
            lambda e, p: encode_captions(p, cfg, toks, flags).spatial_feats,
            (emb, params), n=4)

    # attention core at text shape, causal mask
    from leclip_tpu.ops.attention import causal_mask
    q = jax.random.normal(jax.random.PRNGKey(2), (B, Ht, T, 64), jnp.bfloat16)
    mask = jnp.asarray(causal_mask(T))
    measure("attention XLA [1024,8,77,64] causal",
            lambda qq: attention_core(qq, qq, qq, mask=mask, impl="xla"),
            (q,), n=6, flops=4 * B * Ht * T * T * 64)

    # bare text-MLP-class matmul [78848,512]x[512,2048]
    x2 = jax.random.normal(jax.random.PRNGKey(3), (B * T, Wt), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(4), (Wt, 4 * Wt), jnp.bfloat16)
    measure("bare matmul [78848,512]x[512,2048]",
            lambda a, ww: a @ ww, (x2, w), n=6, flops=2 * B * T * Wt * 4 * Wt)


if __name__ == "__main__":
    main()
