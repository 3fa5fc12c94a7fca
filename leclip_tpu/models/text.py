"""CLIP text tower — pure-functional JAX.

Capabilities of the reference text path (ref: project/my_code/clip/
model.py:318-392 and trainers/Caption_distill_double.py:72-101 TextEncoder):

* ``encode_text(tokens)``           → EOT feature [N, E] (argmax convention)
* ``encode_text_embeds(embeds, eot_idx)`` → same, from pre-built embeddings
  (the prompt-learner path, where learnable context vectors are spliced in)
* ``encode_text_sequence(...)``     → ALL projected positions [N, L, E]
  (the "texts-as-images" path: token features act as spatial features)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import causal_mask
from .transformer import init_block_stack, layer_norm, run_transformer


def init_text_params(
    key,
    vocab_size: int,
    context_length: int,
    width: int,
    layers: int,
    embed_dim: int,
    dtype=jnp.float32,
) -> dict:
    k_tok, k_pos, k_blocks, k_proj = jax.random.split(key, 4)
    return {
        "token_embedding": (jax.random.normal(k_tok, (vocab_size, width)) * 0.02).astype(dtype),
        "positional_embedding": (jax.random.normal(k_pos, (context_length, width)) * 0.01).astype(dtype),
        "blocks": init_block_stack(k_blocks, layers, width, dtype),
        "ln_final": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "text_projection": (jax.random.normal(k_proj, (width, embed_dim)) * width**-0.5).astype(dtype),
    }


def embed_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token ids [N, L] → embeddings [N, L, W]."""
    return params["token_embedding"][tokens]


def _backbone(
    params: dict,
    x: jnp.ndarray,
    n_heads: int,
    impl: str = "auto",
    remat: bool = False,
    adapter: dict = None,
    q8: dict = None,
    fused: bool = False,
) -> jnp.ndarray:
    """Embeddings [N, L, W] → post-ln_final features [N, L, W]. ``adapter``
    inserts a residual bottleneck over the transformer output before ln_final
    (the AdapterTextEncoder variant, ref Caption_distill_double_adapter.py:99-112).
    ``q8``: optional stacked int8 block weights (ops/quant.py) — the W8A8
    causal-attention inference path (not differentiable; eval-side only).
    ``fused``: bf16 fused-block pallas kernels (ops/block_kernels.py) — at
    text shapes ([1024, 77, 512]×12 layers) they measure 49.1 ms vs 78.2 XLA
    vs 51.3 int8, i.e. fused bf16 BEATS int8 here with zero quantization
    noise (scripts/probe_text_fused.py). Inference-only (no VJP)."""
    ctx_len = x.shape[1]
    x = x + params["positional_embedding"][:ctx_len].astype(x.dtype)
    x = run_transformer(
        x, params["blocks"], n_heads, mask=causal_mask(ctx_len), impl=impl,
        remat=remat, q8=q8, causal=True, fused=fused,
    )
    if adapter is not None:
        from .adapter import apply_adapter

        x = x + apply_adapter(x, adapter)
    return layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"])


def encode_text_sequence(
    params: dict,
    embeds: jnp.ndarray,
    n_heads: int,
    impl: str = "auto",
    remat: bool = False,
    adapter: dict = None,
    q8: dict = None,
    fused: bool = False,
) -> jnp.ndarray:
    """All projected token features [N, L, E] — the text-as-image regime where
    every position acts as a spatial feature (ref Caption_distill_double.py:94-96)."""
    x = _backbone(params, embeds, n_heads, impl=impl, remat=remat,
                  adapter=adapter, q8=q8, fused=fused)
    return x @ params["text_projection"].astype(x.dtype)


def encode_text_embeds(
    params: dict,
    embeds: jnp.ndarray,
    eot_idx: jnp.ndarray,
    n_heads: int,
    impl: str = "auto",
    remat: bool = False,
    adapter: dict = None,
    q8: dict = None,
    fused: bool = False,
) -> jnp.ndarray:
    """EOT-position features [N, E] from pre-built embeddings; ``eot_idx`` is
    tokens.argmax(-1) — EOT has the highest token id by construction."""
    x = _backbone(params, embeds, n_heads, impl=impl, remat=remat,
                  adapter=adapter, q8=q8, fused=fused)
    eot = jnp.take_along_axis(x, eot_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return eot @ params["text_projection"].astype(x.dtype)


def encode_text(
    params: dict,
    tokens: jnp.ndarray,
    n_heads: int,
    impl: str = "auto",
    remat: bool = False,
    sequence: bool = False,
    q8: dict = None,
    fused: bool = False,
) -> jnp.ndarray:
    """Token ids [N, L] → EOT feature [N, E] (or all positions if sequence)."""
    embeds = embed_tokens(params, tokens)
    if sequence:
        return encode_text_sequence(
            params, embeds, n_heads, impl=impl, remat=remat, q8=q8, fused=fused
        )
    return encode_text_embeds(
        params, embeds, tokens.argmax(-1), n_heads, impl=impl, remat=remat,
        q8=q8, fused=fused,
    )
