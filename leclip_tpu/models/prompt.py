"""PromptLearner — the trainable heart of the method.

Capability parity with the reference PromptLearner (ref: project/my_code/
trainers/Caption_distill_double.py:104-308): three independent learnable
context-token sets (positive / negative-"local" / evidence), three learnable
scalar temperatures, frozen SOS-prefix / CLS+EOS-suffix token embeddings per
class, and end/middle/front class-token placement.

Split into a *trainable* pytree (what the optimizer and EMA twin see — a few
thousand floats) and a *constant* pytree (embedded prompt scaffolding), so
checkpoints stay tiny and `load` can ignore stale class buffers exactly like
the reference's strict=False load (Caption_distill_double.py:929-938).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import get_tokenizer, tokenize


def build_prompt_learner(
    key,
    clip_params: dict,
    classnames: List[str],
    n_ctx: int = 16,
    csc: bool = False,
    ctx_init: str = "",
    class_token_position: str = "end",
    dtype=jnp.float32,
) -> Tuple[dict, dict]:
    """Returns (trainable, constants).

    trainable: ctx / ctx_double / ctx_evidence [n_ctx, D] (or [C, n_ctx, D]
    when class-specific), temperature / spatial_T / ranking_scale scalars.
    constants: token_prefix [C,1,D], token_suffix [C,*,D], token_suffix_nocls,
    tokenized_prompts [C,77], name_lens, n_ctx, class_token_position.
    """
    token_embedding = np.asarray(clip_params["text"]["token_embedding"])
    ctx_dim = token_embedding.shape[1]
    n_cls = len(classnames)
    tok = get_tokenizer()

    if ctx_init:
        words = ctx_init.replace("_", " ")
        init_ids = tokenize(words)[0]
        # reference convention: n_ctx = word count, NOT BPE token count
        # (Caption_distill_double.py:147-152) — the embedding slice takes the
        # first n_ctx tokens even when a word spans several BPE tokens, and
        # the suffix offset follows the same word-count layout
        n_ctx = len(words.split(" "))
        ctx = jnp.asarray(token_embedding[init_ids[1 : 1 + n_ctx]], dtype)
        ctx_double = ctx
        ctx_evidence = ctx
        prompt_prefix = words
    else:
        ks = jax.random.split(key, 3)
        shape = (n_cls, n_ctx, ctx_dim) if csc else (n_ctx, ctx_dim)
        ctx = (jax.random.normal(ks[0], shape) * 0.02).astype(dtype)
        ctx_double = (jax.random.normal(ks[1], shape) * 0.02).astype(dtype)
        # evidence context is always class-agnostic in the reference
        ctx_evidence = (jax.random.normal(ks[2], (n_ctx, ctx_dim)) * 0.02).astype(dtype)
        prompt_prefix = " ".join(["X"] * n_ctx)

    classnames = [c.replace("_", " ") for c in classnames]
    name_lens = [len(tok.encode(c)) for c in classnames]
    prompts = [f"{prompt_prefix} {c}." for c in classnames]
    tokenized = tokenize(prompts, truncate=True)  # [C, 77]
    embedded = token_embedding[tokenized]  # [C, 77, D]

    nocls = tokenize([f"{prompt_prefix}."] * n_cls, truncate=True)
    embedded_nocls = token_embedding[nocls]

    trainable = {
        "ctx": ctx,
        "ctx_double": ctx_double,
        "ctx_evidence": ctx_evidence,
        "temperature": jnp.asarray(3.0, dtype),
        "spatial_T": jnp.asarray(3.0, dtype),
        "ranking_scale": jnp.asarray(4.0, dtype),
    }
    constants = {
        "token_prefix": jnp.asarray(embedded[:, :1], dtype),          # SOS
        "token_suffix": jnp.asarray(embedded[:, 1 + n_ctx :], dtype),  # CLS, EOS
        "token_suffix_nocls": jnp.asarray(embedded_nocls[:, 1 + n_ctx :], dtype),
        "tokenized_prompts": jnp.asarray(tokenized, jnp.int32),
        "eot_idx": jnp.asarray(tokenized.argmax(-1), jnp.int32),
        "name_lens": tuple(name_lens),
        "n_ctx": n_ctx,
        "n_cls": n_cls,
        "class_token_position": class_token_position,
    }
    return trainable, constants


def sparse_token_embedding_stub(
    token_embedding, classnames: List[str], n_ctx: int = 16, ctx_init: str = ""
) -> np.ndarray:
    """Host copy of the token-embedding table holding ONLY the rows that
    `build_prompt_learner` will index for these classnames (~100 of 49,408);
    all other rows are zero.

    Use this when the full table lives on a device: fetching the whole
    [49408, D] table over a networked-TPU link costs ~50 MB (measured 136 s
    on a degraded link), while the prompt scaffolding only ever embeds the
    tokens of "<prefix> <classname>." prompts — so gather those rows
    on-device and ship ~0.2 MB instead. The returned table is a drop-in
    `clip_params["text"]["token_embedding"]` stub for `build_prompt_learner`
    (same n_ctx / ctx_init), verified to produce identical constants.
    """
    if ctx_init:
        words = ctx_init.replace("_", " ")
        prefix = words
        probe_rows = [tokenize(words)[0]]  # covers the ctx slice ids
    else:
        prefix = " ".join(["X"] * n_ctx)
        probe_rows = []
    names = [c.replace("_", " ") for c in classnames]
    probe = tokenize([f"{prefix} {c}." for c in names] + [f"{prefix}."],
                     truncate=True)
    ids = np.unique(np.concatenate([np.asarray(probe).ravel()]
                                   + [np.asarray(r) for r in probe_rows]))
    if isinstance(token_embedding, np.ndarray):
        rows = token_embedding[ids]
    else:
        rows = np.asarray(jax.jit(lambda e, i: e[i])(
            token_embedding, jnp.asarray(ids)))
    table = np.zeros((token_embedding.shape[0], rows.shape[1]), rows.dtype)
    table[ids] = rows
    return table


def assemble_prompts(
    trainable: dict, constants: dict, neg_prompt_wcls: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate [prefix | ctx | suffix] per class for the three prompt sets
    → three [C, 77, D] embedding tensors."""
    n_cls = constants["n_cls"]
    n_ctx = constants["n_ctx"]
    prefix = constants["token_prefix"]
    suffix = constants["token_suffix"]
    suffix_nocls = constants["token_suffix_nocls"]
    position = constants["class_token_position"]

    def expand(ctx):
        if ctx.ndim == 2:
            return jnp.broadcast_to(ctx[None], (n_cls, *ctx.shape))
        return ctx

    ctx = expand(trainable["ctx"])
    ctx_double = expand(trainable["ctx_double"])
    ctx_evidence = expand(trainable["ctx_evidence"])

    if position == "end":
        prompts = jnp.concatenate([prefix, ctx, suffix], axis=1)
        sfx_neg = suffix if neg_prompt_wcls else suffix_nocls
        prompts_neg = jnp.concatenate([prefix, ctx_double, sfx_neg], axis=1)
        prompts_evd = jnp.concatenate([prefix, ctx_evidence, sfx_neg], axis=1)
        return prompts, prompts_neg, prompts_evd

    if position in ("middle", "front"):
        # name_lens are static python ints → per-class concatenation is
        # shape-static and unrolled (80 classes, built once per step).
        half = n_ctx // 2
        rows = []
        for i, name_len in enumerate(constants["name_lens"]):
            pre = prefix[i : i + 1]
            cls_tok = suffix[i : i + 1, :name_len]
            rest = suffix[i : i + 1, name_len:]
            c = ctx[i : i + 1]
            if position == "middle":
                row = jnp.concatenate(
                    [pre, c[:, :half], cls_tok, c[:, half:], rest], axis=1
                )
            else:
                row = jnp.concatenate([pre, cls_tok, c, rest], axis=1)
            rows.append(row)
        prompts = jnp.concatenate(rows, axis=0)
        # reference only rebuilds the positive set for middle/front
        prompts_neg = jnp.concatenate([prefix, ctx_double, suffix], axis=1)
        prompts_evd = jnp.concatenate([prefix, ctx_evidence, suffix], axis=1)
        return prompts, prompts_neg, prompts_evd

    raise ValueError(f"unknown class_token_position {position!r}")


def ema_init(trainable: dict) -> dict:
    """EMA twin starts as a copy (ref copy_params, :547-552)."""
    return jax.tree.map(jnp.array, trainable)


def ema_update(ema: dict, trainable: dict, momentum: float) -> dict:
    """param_m ← m·param_m + (1-m)·param (ref _momentum_update, :554-559)."""
    return jax.tree.map(lambda m, p: m * momentum + p * (1.0 - momentum), ema, trainable)
