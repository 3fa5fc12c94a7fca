"""Bottleneck text adapter — the `Caption_distill_double_adapter` variant.

Capability parity with the reference adapter stack (ref: project/my_code/
trainers/Caption_distill_double_adapter.py:84-127,305-322,463-627): a 2-layer
bias-free bottleneck MLP (width → width/reduction → width, ReLU after both)
applied as a residual over the transformer output BEFORE ln_final, and only
on the PROMPT encoding path (captions go through the plain text tower).

Note: the reference freezes everything outside "prompt_learner", so its
adapter stays at random init; here the adapter params live in their own
pytree and `adapter_trainable` opts them into the optimizer — strictly more
capable, defaulting to the reference behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_adapter_params(key, width: int, reduction: int = 4, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    hidden = width // reduction
    scale1 = (2.0 / width) ** 0.5
    scale2 = (2.0 / hidden) ** 0.5
    return {
        "down_kernel": (jax.random.normal(k1, (width, hidden)) * scale1).astype(dtype),
        "up_kernel": (jax.random.normal(k2, (hidden, width)) * scale2).astype(dtype),
    }


def apply_adapter(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """relu(relu(x @ down) @ up) — the bottleneck transform (no residual;
    callers add it)."""
    h = jax.nn.relu(x @ params["down_kernel"].astype(x.dtype))
    return jax.nn.relu(h @ params["up_kernel"].astype(x.dtype))
