"""Fused bf16 block kernels (ops/block_kernels.py): kernel-level parity with
the unfused XLA path, and end-to-end TTA engine agreement. Run in pallas
interpreter mode on the CPU test mesh; fp32 inputs make the comparison exact
up to reduction order (conftest pins matmul precision to float32)."""

import jax
import jax.numpy as jnp
import numpy as np

from leclip_tpu.models.transformer import (
    init_block_stack, layer_norm, quick_gelu, run_transformer,
)
from leclip_tpu.ops.attention import multi_head_attention
from leclip_tpu.ops.block_kernels import attn_block_bf16, mlp_bf16


def test_attn_block_bf16_matches_unfused():
    d, heads, t = 64, 2, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, d), jnp.float32)
    p = {
        "qkv_kernel": jax.random.normal(jax.random.PRNGKey(1), (d, 3 * d)) * 0.05,
        "qkv_bias": jax.random.normal(jax.random.PRNGKey(2), (3 * d,)) * 0.02,
        "out_kernel": jax.random.normal(jax.random.PRNGKey(3), (d, d)) * 0.05,
        "out_bias": jax.random.normal(jax.random.PRNGKey(4), (d,)) * 0.02,
    }
    sc = jnp.ones((d,)) + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (d,))
    bi = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (d,))

    out = np.asarray(attn_block_bf16(
        x, sc, bi, p["qkv_kernel"], p["qkv_bias"], p["out_kernel"],
        p["out_bias"], heads, kv_len=t - 2,
    ), np.float32)
    ref = np.asarray(
        x + multi_head_attention(layer_norm(x, sc, bi), p, heads, impl="xla",
                                 kv_len=t - 2),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # pad-key masking: perturbing a pad key must not change valid outputs
    x2 = x.at[:, t - 1].add(3.0)
    out2 = np.asarray(attn_block_bf16(
        x2, sc, bi, p["qkv_kernel"], p["qkv_bias"], p["out_kernel"],
        p["out_bias"], heads, kv_len=t - 2,
    ), np.float32)
    np.testing.assert_allclose(out[:, : t - 2], out2[:, : t - 2], atol=1e-5)


def test_attn_block_bf16_causal_matches_mask():
    from leclip_tpu.ops.attention import causal_mask

    d, heads, t = 64, 2, 16
    x = jax.random.normal(jax.random.PRNGKey(10), (2, t, d), jnp.float32)
    p = {
        "qkv_kernel": jax.random.normal(jax.random.PRNGKey(11), (d, 3 * d)) * 0.05,
        "qkv_bias": jnp.zeros((3 * d,)),
        "out_kernel": jax.random.normal(jax.random.PRNGKey(12), (d, d)) * 0.05,
        "out_bias": jnp.zeros((d,)),
    }
    sc, bi = jnp.ones((d,)), jnp.zeros((d,))
    out = np.asarray(attn_block_bf16(
        x, sc, bi, p["qkv_kernel"], p["qkv_bias"], p["out_kernel"],
        p["out_bias"], heads, causal=True,
    ), np.float32)
    ref = np.asarray(
        x + multi_head_attention(layer_norm(x, sc, bi), p, heads, impl="xla",
                                 mask=jnp.asarray(causal_mask(t))),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_mlp_bf16_matches_unfused():
    d, t = 64, 16
    x = jax.random.normal(jax.random.PRNGKey(20), (3, t, d), jnp.float32)
    fc_w = jax.random.normal(jax.random.PRNGKey(21), (d, 4 * d)) * 0.05
    fc_b = jax.random.normal(jax.random.PRNGKey(22), (4 * d,)) * 0.02
    pj_w = jax.random.normal(jax.random.PRNGKey(23), (4 * d, d)) * 0.05
    pj_b = jax.random.normal(jax.random.PRNGKey(24), (d,)) * 0.02
    sc = jnp.ones((d,)) + 0.1 * jax.random.normal(jax.random.PRNGKey(25), (d,))
    bi = 0.1 * jax.random.normal(jax.random.PRNGKey(26), (d,))

    out = np.asarray(mlp_bf16(x, sc, bi, fc_w, fc_b, pj_w, pj_b), np.float32)
    y = layer_norm(x, sc, bi)
    ref = np.asarray(x + (quick_gelu(y @ fc_w + fc_b) @ pj_w + pj_b), np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_transformer_stack_fused_agrees():
    """fused=True through run_transformer (scan) reproduces the unfused
    stack; fp32 interpret mode → tight tolerance."""
    width, layers, heads = 64, 3, 2
    blocks = init_block_stack(jax.random.PRNGKey(30), layers, width)
    x = jax.random.normal(jax.random.PRNGKey(31), (4, 16, width))
    ref = np.asarray(run_transformer(x, blocks, heads), np.float32)
    out = np.asarray(run_transformer(x, blocks, heads, fused=True), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_text_tower_fused_agrees():
    """encode_text(fused=True) — the caption-branch fast path — reproduces
    the unfused causal text tower (fp32 interpret mode → tight tolerance)."""
    from leclip_tpu.models.text import encode_text, init_text_params

    width, layers, heads, ctx = 64, 2, 2, 16
    params = init_text_params(jax.random.PRNGKey(40), 97, ctx, width, layers, 32)
    toks = np.zeros((8, ctx), np.int32)
    rng = np.random.default_rng(0)
    for i in range(8):  # BPE-like: prefix of tokens, EOT = max id, zero pad
        n = rng.integers(3, ctx)
        toks[i, :n] = rng.integers(1, 90, n)
        toks[i, n] = 96
    toks = jnp.asarray(toks)
    for sequence in (False, True):
        ref = np.asarray(encode_text(params, toks, heads, sequence=sequence),
                         np.float32)
        out = np.asarray(
            encode_text(params, toks, heads, sequence=sequence, fused=True),
            np.float32,
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_caption_bank_bf16_fused_precision():
    """build_caption_bank(precision='bf16') agrees with the default fp32 bank
    at bf16-rounding tolerance (CPU: fused=False — the cast path is what's
    under test; the kernels themselves are covered above)."""
    from leclip_tpu.inference.pipeline import build_caption_bank
    from leclip_tpu.models.clip import PRESETS, init_clip_params

    cfg = PRESETS["ViT-TEST"]
    params = init_clip_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(1)
    toks = np.zeros((6, cfg.context_length), np.int32)
    for i in range(6):
        n = rng.integers(3, cfg.context_length)
        toks[i, :n] = rng.integers(1, cfg.vocab_size - 2, n)
        toks[i, n] = cfg.vocab_size - 1
    ref = build_caption_bank(params, cfg, toks, batch_size=8)
    out = build_caption_bank(params, cfg, toks, batch_size=8, precision="bf16")
    assert out.shape == ref.shape
    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert cos.min() > 0.99, cos.min()


def test_train_step_caption_fused_agrees():
    """One train step with caption_fused=True matches the unfused step
    (stop-gradient branch only — gradients never touch the fused kernels)."""
    import optax

    from leclip_tpu.engine.trainer import make_train_step
    from leclip_tpu.engine.train_state import create_train_state
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner

    cfg = PRESETS["ViT-TEST"]
    params = init_clip_params(jax.random.PRNGKey(3), cfg)
    tr, cs = build_prompt_learner(
        jax.random.PRNGKey(4), params, ["cat", "dog", "car"], n_ctx=4
    )
    opt = optax.sgd(1e-3)
    rng = np.random.default_rng(2)
    captions = np.zeros((8, cfg.context_length), np.int32)
    for i in range(8):
        n = rng.integers(3, cfg.context_length)
        captions[i, :n] = rng.integers(1, cfg.vocab_size - 2, n)
        captions[i, n] = cfg.vocab_size - 1
    labels = rng.integers(0, 2, (8, 3)).astype(np.float32)
    outs = []
    for fused in (False, True):
        step = make_train_step(params, cfg, cs, opt, DenseFlags(),
                               caption_fused=fused)
        state = create_train_state(jax.tree.map(jnp.array, tr), opt)
        state, aux = step(state, jnp.asarray(captions), jnp.asarray(labels))
        outs.append((jax.device_get(state.params), float(aux["loss"])))
    (p0, l0), (p1, l1) = outs
    assert np.isfinite(l1) and abs(l0 - l1) < 1e-4, (l0, l1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_tta_engine_bf16_fused_end_to_end():
    """TTAEngine(bf16_fused=True) competition scores match the unfused
    engine (bf16 compute in both → bf16-level tolerance)."""
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.inference.tta import TTAEngine, build_model_spec
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner

    cfg = PRESETS["ViT-TEST"]
    # bf16 params + bf16 compute = the production bench configuration
    params = init_clip_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    classnames = COCO_OBJECT_CATEGORIES[:8]
    tr, cs = build_prompt_learner(jax.random.PRNGKey(1), params, classnames,
                                  n_ctx=4)
    spec = build_model_spec(params, cfg, tr, cs, DenseFlags())
    imgs = [
        np.random.default_rng(i).integers(0, 255, (96, 128, 3)).astype(np.uint8)
        for i in range(2)
    ]
    kw = dict(scales=(2,), crop_size=cfg.image_resolution,
              compute_dtype=jnp.bfloat16)
    ref = TTAEngine(params, cfg, {"best": spec}, bf16_fused=False,
                    **kw).run_batch_fused(imgs)
    out = TTAEngine(params, cfg, {"best": spec}, bf16_fused=True,
                    **kw).run_batch_fused(imgs)
    assert out.shape == ref.shape and np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)
    c = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert c > 0.999, c
