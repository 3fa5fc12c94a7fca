"""GC_module golden tests vs direct numpy transcriptions of the reference
math (trainers/utils.py:199-307)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.models.gcn import gcn_forward, gen_adj, init_gcn_params


def _ref_layer(x, w, a, bias=None):
    out = a @ (x @ w)
    return out + bias if bias is not None else out


def test_single_layer_matches_reference_math():
    n_cls, dim = 7, 16
    params = init_gcn_params(jax.random.PRNGKey(0), n_cls, dim, layers=1)
    x = np.random.default_rng(0).normal(size=(n_cls, dim)).astype(np.float32)
    out = np.asarray(gcn_forward(params, jnp.asarray(x)))
    a = np.asarray(params["layers"][0]["A"])
    w = np.asarray(params["layers"][0]["weight"])
    np.testing.assert_allclose(out, _ref_layer(x, w, a), rtol=2e-5, atol=1e-5)
    # default adjacency prior: eye*(1-0.001*C)+0.001 (utils.py:207-209)
    np.testing.assert_allclose(
        a, np.eye(n_cls) * (1 - 0.001 * n_cls) + 0.001, atol=1e-7
    )


def test_two_layer_leaky_relu_and_bias():
    n_cls, dim = 5, 8
    params = init_gcn_params(jax.random.PRNGKey(1), n_cls, dim, layers=2, bias=True)
    x = np.random.default_rng(1).normal(size=(3, n_cls, dim)).astype(np.float32)
    out = np.asarray(gcn_forward(params, jnp.asarray(x)))
    h = x
    for i, layer in enumerate(params["layers"]):
        h = _ref_layer(
            h, np.asarray(layer["weight"]), np.asarray(layer["A"]),
            np.asarray(layer["bias"]),
        )
        if i == 0:
            h = np.where(h > 0, h, 0.15 * h)  # LeakyReLU(0.15)
    np.testing.assert_allclose(out, h, rtol=2e-4, atol=2e-4)


def test_init_prob_thresholded_shared_adjacency():
    n_cls = 6
    cp = np.random.default_rng(2).random((n_cls, n_cls)).astype(np.float32)
    params = init_gcn_params(
        jax.random.PRNGKey(2), n_cls, 8, layers=1, count_prob=cp, init_prob=True
    )
    adj = np.asarray(params["adj"])
    np.testing.assert_allclose(adj, np.where(cp < 0.3, 0.0, cp), atol=1e-7)
    # the shared adjacency overrides the per-layer prior in the forward
    x = np.ones((n_cls, 8), np.float32)
    out = np.asarray(gcn_forward(params, jnp.asarray(x)))
    w = np.asarray(params["layers"][0]["weight"])
    np.testing.assert_allclose(out, _ref_layer(x, w, adj), rtol=2e-5, atol=1e-5)
    with pytest.raises(ValueError):
        init_gcn_params(jax.random.PRNGKey(0), n_cls, 8, init_prob=True)


def test_gen_adj_symmetric_normalisation():
    a = np.abs(np.random.default_rng(3).normal(size=(5, 5))).astype(np.float32) + 0.1
    got = np.asarray(gen_adj(jnp.asarray(a)))
    d = np.diag(a.sum(1) ** -0.5)
    ref = (a @ d).T @ d  # utils.py:236-240
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
