"""Graph-convolution head over per-class features.

Rebuild of the reference's GC_module / GraphConvolution (ref:
project/my_code/trainers/utils.py:199-307) — a 1- or 2-layer GCN that mixes
per-class prompt/text features through a learnable class-adjacency matrix.
The reference ships it unused by any registered trainer (dead code in the
shipped configs); it is rebuilt here for inventory completeness and as the
hook for label-graph experiments.

Functional JAX port decisions:
* params are a plain pytree (weights + learnable adjacency), so the module
  composes with the trainer's optimizer and EMA machinery unchanged;
* the adjacency seed is either the reference's near-identity prior
  (eye·(1−0.001·C) + 0.001, GraphConvolution.__init__:207-209) or a
  thresholded co-occurrence matrix (GC_module.__init__:268-275, t=0.3) built
  from `data/freq_stats.py` artifacts instead of a torch.load'd tensor;
* forward is two matmuls per layer ([C,C]@[...,C,D]@[D,D]) — MXU-friendly,
  batched over any leading dims; LeakyReLU(0.15) between layers as in the
  reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _near_identity_prior(n_cls: int) -> jnp.ndarray:
    """eye·(1 − 0.001·C) + 0.001 (ref utils.py:207-209)."""
    return jnp.eye(n_cls) * (1.0 - 0.001 * n_cls) + 0.001


def init_gcn_params(
    key: jax.Array,
    n_cls: int,
    dim: int = 1024,
    layers: int = 1,
    count_prob: Optional[np.ndarray] = None,
    init_prob: bool = False,
    threshold: float = 0.3,
    bias: bool = False,
) -> dict:
    """GC_module parameter pytree.

    count_prob: class co-occurrence probabilities [C, C] (the reference
    torch.load's `init_prob_file`; here pass e.g. the row-normalised matrix
    from data/freq_stats.py). With init_prob=True entries below `threshold`
    are zeroed and the result becomes the LEARNABLE shared adjacency
    (ref utils.py:267-275); otherwise each layer keeps its own learnable
    near-identity adjacency (ref :251-263 → GraphConvolution defaults).
    """
    if layers not in (1, 2):
        raise ValueError(f"GC_module supports 1 or 2 layers, got {layers}")
    params = {"layers": []}
    stdv = 1.0 / np.sqrt(dim)
    for i in range(layers):
        key, wk, bk = jax.random.split(key, 3)
        layer = {
            "weight": jax.random.uniform(wk, (dim, dim), minval=-stdv, maxval=stdv),
            "A": _near_identity_prior(n_cls),
        }
        if bias:
            layer["bias"] = jax.random.uniform(bk, (1, 1, dim), minval=-stdv, maxval=stdv)
        params["layers"].append(layer)
    if init_prob:
        if count_prob is None:
            raise ValueError("init_prob=True requires count_prob")
        cp = jnp.asarray(count_prob, jnp.float32)
        params["adj"] = jnp.where(cp < threshold, 0.0, cp)
    return params


def gen_adj(a: jnp.ndarray) -> jnp.ndarray:
    """Symmetric degree normalisation (A·D^-½)ᵀ·D^-½ (ref utils.py:236-240).

    Provided-but-unwired, EXACTLY like the reference: its GC_module.forward
    multiplies the raw adjacency and never calls gen_adj either (utils.py
    :277-285). Callers doing ML-GCN-style propagation should pass
    ``adj=gen_adj(A)`` to gcn_forward explicitly."""
    d = jnp.power(a.sum(1), -0.5)
    ad = a * d[None, :]          # A @ diag(D)
    return ad.T * d[None, :]     # (A D)^T @ diag(D)


def gcn_forward(
    params: dict, x: jnp.ndarray, adj: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """x [..., C, D] → [..., C, D]: per-layer adj @ (x @ W) (+ bias), with
    LeakyReLU(0.15) between the two layers (ref utils.py:277-285)."""
    shared = params.get("adj") if adj is None else adj
    out = x
    for i, layer in enumerate(params["layers"]):
        a = shared if shared is not None else layer["A"]
        support = out @ layer["weight"]
        out = a @ support
        if "bias" in layer:
            out = out + layer["bias"]
        if i + 1 < len(params["layers"]):
            out = jax.nn.leaky_relu(out, 0.15)
    return out
