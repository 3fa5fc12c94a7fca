"""Resident-head attention kernel: parity vs the XLA packed-layout math
(interpret mode on CPU), kv_len pad-key masking, gradients through the
custom VJP, and the padded-ViT equivalence the kernel enables."""

import jax
import jax.numpy as jnp
import numpy as np

from leclip_tpu.ops.attention import multi_head_attention
from leclip_tpu.ops.flash_attention import (
    _xla_packed_attention,
    resident_attention,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_resident_matches_xla_packed():
    b, t, heads, dh = 4, 16, 2, 8
    w = heads * dh
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, (b, t, w)) for kk in ks)
    out = resident_attention(q, k, v, heads)
    ref = _xla_packed_attention(q, k, v, heads, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_resident_kv_len_masks_pad_keys():
    b, t_real, heads, dh, pad = 2, 13, 2, 8, 3
    w = heads * dh
    t = t_real + pad
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand(kk, (b, t_real, w)) for kk in ks)
    qp, kp, vp = (jnp.pad(a, ((0, 0), (0, pad), (0, 0))) for a in (q, k, v))
    out = resident_attention(qp, kp, vp, heads, t_real)[:, :t_real]
    ref = _xla_packed_attention(q, k, v, heads, t_real)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_resident_gradients_match_xla():
    b, t, heads, dh = 2, 8, 2, 8
    w = heads * dh
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q, k, v = (_rand(kk, (b, t, w)) for kk in ks[:3])
    cot = _rand(ks[3], (b, t, w))

    def loss_res(q, k, v):
        return (resident_attention(q, k, v, heads) * cot).sum()

    def loss_xla(q, k, v):
        return (_xla_packed_attention(q, k, v, heads, t) * cot).sum()

    g_res = jax.grad(loss_res, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_res, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5)


def test_multi_head_attention_kv_len_pad_equivalence():
    """Padding T and masking via kv_len must reproduce the unpadded result on
    the XLA path (what CPU runs; on TPU the resident kernel takes over)."""
    b, t_real, heads, dh, pad = 3, 21, 4, 8, 3
    d = heads * dh
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = _rand(ks[0], (b, t_real, d))
    params = {
        "qkv_kernel": _rand(ks[1], (d, 3 * d)) * 0.1,
        "qkv_bias": _rand(ks[2], (3 * d,)) * 0.1,
        "out_kernel": _rand(ks[3], (d, d)) * 0.1,
        "out_bias": _rand(ks[4], (d,)) * 0.1,
    }
    ref = multi_head_attention(x, params, heads, impl="xla")
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = multi_head_attention(xp, params, heads, impl="xla", kv_len=t_real)
    np.testing.assert_allclose(
        np.asarray(out[:, :t_real]), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_vit_padded_token_axis_matches_dense_outputs():
    """encode_image_vit pads 197→200 internally; global+dense outputs must be
    invariant (the pad keys are masked, pad queries sliced)."""
    from leclip_tpu.models.vit import encode_image_vit, init_vit_params

    params = init_vit_params(jax.random.PRNGKey(0), 32, 8, 32, 2, 16)
    x = _rand(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.1
    # grid 4x4 → 17 tokens → pads to 24; compare against a manual no-pad run
    g, dense = encode_image_vit(x, params, n_heads=2, patch=8, dense=True)
    assert g.shape == (2, 16) and dense.shape == (2, 16, 16)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(dense)).all()

    from leclip_tpu.models.transformer import layer_norm, run_transformer
    from leclip_tpu.models.vit import patchify

    tokens = patchify(x, params["patch_kernel"], 8)
    b, n, width = tokens.shape
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, width))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["positional_embedding"][: n + 1]
    tokens = layer_norm(tokens, params["ln_pre"]["scale"], params["ln_pre"]["bias"])
    tokens = run_transformer(tokens, params["blocks"], 2)  # no padding
    tokens = layer_norm(tokens, params["ln_post"]["scale"], params["ln_post"]["bias"])
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(tokens[:, 0] @ params["proj"]), atol=2e-5, rtol=2e-5
    )


def test_resident_pad_keys_with_huge_garbage_no_nan():
    """Pad-key activations are garbage in the padded ViT; if a pad score
    exceeded every real score the old mask-after-max form underflowed all
    real exp() terms -> 0 denominator -> NaN. Mask must precede the max."""
    b, t_real, heads, dh, pad = 2, 13, 2, 8, 3
    w = heads * dh
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (_rand(kk, (b, t_real, w)) for kk in ks)
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)), constant_values=1e4)
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)), constant_values=1e4)
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)), constant_values=1e4)
    out = resident_attention(qp, kp, vp, heads, t_real)[:, :t_real]
    assert np.isfinite(np.asarray(out)).all()
    ref = _xla_packed_attention(q, k, v, heads, t_real)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
