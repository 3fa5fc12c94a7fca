"""PromptLearner modes: CSC, ctx-init, class-token positions, EMA helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.data.tokenizer import get_tokenizer
from leclip_tpu.models.clip import PRESETS, init_clip_params
from leclip_tpu.models.dense_clip import DenseFlags, prompt_text_features
from leclip_tpu.models.prompt import assemble_prompts, build_prompt_learner, ema_init, ema_update

TINY = PRESETS["RN-TEST"]
CLASSNAMES = ["dog", "cat", "teddy bear", "pizza"]


@pytest.fixture(scope="module")
def clip_params():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


def test_end_position_shapes(clip_params):
    trainable, consts = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, CLASSNAMES, n_ctx=4
    )
    p, pn, pe = assemble_prompts(trainable, consts)
    assert p.shape == pn.shape == pe.shape == (4, 77, TINY.transformer_width)
    # token scaffolding: SOS prefix is identical across prompt sets
    np.testing.assert_array_equal(np.asarray(p[:, 0]), np.asarray(pn[:, 0]))


@pytest.mark.parametrize("position", ["middle", "front"])
def test_middle_front_positions(clip_params, position):
    trainable, consts = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, CLASSNAMES, n_ctx=4,
        class_token_position=position,
    )
    p, pn, pe = assemble_prompts(trainable, consts)
    assert p.shape == (4, 77, TINY.transformer_width)
    feats = prompt_text_features(clip_params, TINY, trainable, consts, DenseFlags())
    assert feats["pos"].shape == (4, TINY.embed_dim)
    assert np.isfinite(np.asarray(feats["pos"])).all()


def test_csc_contexts(clip_params):
    trainable, consts = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, CLASSNAMES, n_ctx=4, csc=True
    )
    assert trainable["ctx"].shape == (4, 4, TINY.transformer_width)  # [C, n_ctx, D]
    # evidence context stays class-agnostic (reference behavior)
    assert trainable["ctx_evidence"].shape == (4, TINY.transformer_width)
    p, _, _ = assemble_prompts(trainable, consts)
    assert p.shape == (4, 77, TINY.transformer_width)
    # class-specific rows differ in the ctx slots
    assert np.abs(np.asarray(p[0, 1:5]) - np.asarray(p[1, 1:5])).max() > 1e-4


def test_ctx_init_from_words(clip_params):
    trainable, consts = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, CLASSNAMES, ctx_init="a photo of a"
    )
    tok = get_tokenizer()
    n = len(tok.encode("a photo of a"))
    assert trainable["ctx"].shape == (n, TINY.transformer_width)
    # initialised from the words' token embeddings, not random
    emb = np.asarray(clip_params["text"]["token_embedding"])
    from leclip_tpu.data.tokenizer import tokenize

    ids = tokenize("a photo of a")[0][1 : 1 + n]
    np.testing.assert_allclose(np.asarray(trainable["ctx"]), emb[ids], atol=1e-6)


@pytest.mark.parametrize("kwargs", [
    {"n_ctx": 16}, {"n_ctx": 4}, {"ctx_init": "a photo of a"},
])
def test_sparse_token_embedding_stub_identical(clip_params, kwargs):
    """The sparse host stub (only the rows the prompts index) must yield a
    prompt learner identical to one built from the full embedding table."""
    from leclip_tpu.models.prompt import sparse_token_embedding_stub

    table = sparse_token_embedding_stub(
        clip_params["text"]["token_embedding"], CLASSNAMES, **kwargs
    )
    assert table.shape == clip_params["text"]["token_embedding"].shape
    # genuinely sparse: the vast majority of rows never cross the link
    assert (np.abs(table).sum(-1) > 0).sum() < 200
    ref_tr, ref_cs = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, CLASSNAMES, **kwargs
    )
    tr, cs = build_prompt_learner(
        jax.random.PRNGKey(1), {"text": {"token_embedding": table}},
        CLASSNAMES, **kwargs,
    )
    for k in ref_cs:
        if hasattr(ref_cs[k], "shape"):
            np.testing.assert_array_equal(np.asarray(ref_cs[k]), np.asarray(cs[k]))
        else:
            assert ref_cs[k] == cs[k], k
    for k in ref_tr:
        np.testing.assert_array_equal(np.asarray(ref_tr[k]), np.asarray(tr[k]))


def test_ema_helpers():
    params = {"ctx": jnp.ones((2, 3)), "temperature": jnp.asarray(3.0)}
    ema = ema_init(params)
    np.testing.assert_array_equal(np.asarray(ema["ctx"]), np.asarray(params["ctx"]))
    new_params = {"ctx": jnp.zeros((2, 3)), "temperature": jnp.asarray(1.0)}
    updated = ema_update(ema, new_params, momentum=0.9)
    np.testing.assert_allclose(np.asarray(updated["ctx"]), 0.9)
    np.testing.assert_allclose(float(updated["temperature"]), 0.9 * 3.0 + 0.1 * 1.0,
                               rtol=1e-6)
