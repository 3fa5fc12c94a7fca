"""Flash-attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.ops.attention import attention_core, causal_mask
from leclip_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 4, 197, 64), (2, 2, 77, 64)])
def test_matches_xla(rng, shape):
    b, h, t, d = shape
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ours = flash_attention(q, k, v, block_q=64, block_k=64)
    ref = attention_core(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_causal(rng):
    b, h, t, d = 1, 2, 77, 32
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    mask = jnp.asarray(causal_mask(t))
    ours = flash_attention(q, k, v, mask=mask, block_q=32, block_k=32)
    ref = attention_core(q, k, v, mask=mask, impl="xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
    # causality: output at position p must not depend on future keys
    v2 = v.at[:, :, -1, :].set(100.0)
    ours2 = flash_attention(q, k, v2, mask=mask, block_q=32, block_k=32)
    np.testing.assert_allclose(
        np.asarray(ours[:, :, :-1]), np.asarray(ours2[:, :, :-1]), atol=2e-5
    )


def test_non_multiple_block_sizes(rng):
    q = jnp.asarray(rng.normal(size=(1, 1, 50, 64)), jnp.float32)
    out = flash_attention(q, q, q, block_q=128, block_k=128)
    ref = attention_core(q, q, q, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16(rng):
    q = jnp.asarray(rng.normal(size=(1, 2, 64, 64)), jnp.bfloat16)
    out = flash_attention(q, q, q)
    ref = attention_core(q, q, q, impl="xla")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05
    )
