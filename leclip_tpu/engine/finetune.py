"""Dual-encoder CLIP fine-tuning — BASELINE config 4 ("Dual-encoder
fine-tune ViT-B/16 + RN101, data-parallel pmap replacing DDP").

Unlike prompt tuning (frozen towers, tiny trainable pytree), this trains the
FULL dual encoder: symmetric InfoNCE over (image, caption) pairs with the
learnable logit_scale (clamped at 100 like CLIP), AdamW, optional
rematerialisation for memory, batch sharded over the data mesh with params
replicated — XLA inserts the gradient all-reduce.

Supports multi-backbone ensembles by running one FineTuner per backbone
(e.g. ViT-B/16 + RN101) over the same pair stream.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip import CLIPConfig, clip_encode_image, clip_encode_text
from ..parallel.mesh import data_mesh, replicate, shard_batch

MAX_LOGIT_SCALE = float(np.log(100.0))


class FinetuneState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: object


def clip_contrastive_loss(params, clip_cfg: CLIPConfig, images, tokens,
                          impl: str = "auto", remat: bool = False):
    """Symmetric InfoNCE over in-batch pairs (the CLIP pre-training loss,
    ref clip/model.py:394-408 forward + standard CE over both axes)."""
    img = clip_encode_image(params, clip_cfg, images, impl=impl)
    txt = clip_encode_text(params, clip_cfg, tokens, impl=impl, remat=remat)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(jnp.clip(params["logit_scale"], max=MAX_LOGIT_SCALE))
    logits = scale * img @ txt.T
    labels = jnp.arange(logits.shape[0])
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (loss_i + loss_t), logits


def multilabel_finetune_loss(params, clip_cfg, images, class_text_feats, labels,
                             impl: str = "auto"):
    """Alternative objective: BCE of image features vs fixed class prompt
    features — supervised multi-label fine-tuning."""
    img = clip_encode_image(params, clip_cfg, images, impl=impl)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    logits = 4.0 * img @ class_text_feats.T
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return bce.mean(), logits


class CLIPFineTuner:
    """Full-model fine-tuner over a data mesh."""

    def __init__(
        self,
        clip_params: dict,
        clip_cfg: CLIPConfig,
        lr: float = 1e-5,
        weight_decay: float = 0.2,
        warmup_steps: int = 100,
        total_steps: int = 10_000,
        mesh=None,
        remat: bool = True,
        attention_impl: str = "auto",
    ):
        self.clip_cfg = clip_cfg
        self.mesh = mesh if mesh is not None else data_mesh()
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(schedule, weight_decay=weight_decay,
                        mask=self._decay_mask(clip_params)),
        )
        state = FinetuneState(
            step=jnp.zeros((), jnp.int32),
            params=clip_params,
            opt_state=self.optimizer.init(clip_params),
        )
        self.state = replicate(state, self.mesh)
        self._impl = attention_impl
        self._remat = remat
        self.train_step = self._build_step()

    @staticmethod
    def _decay_mask(params):
        """No weight decay on norms/biases/embeddings (standard CLIP FT)."""
        def mask(path, x):
            name = "/".join(str(p) for p in path).lower()
            skip = any(t in name for t in ("bias", "scale", "mean", "var",
                                           "embedding", "logit_scale"))
            return not skip and getattr(x, "ndim", 0) >= 2

        return jax.tree_util.tree_map_with_path(mask, params)

    def _build_step(self):
        optimizer = self.optimizer
        clip_cfg = self.clip_cfg
        impl, remat = self._impl, self._remat

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: FinetuneState, images, tokens):
            def loss_fn(p):
                loss, logits = clip_contrastive_loss(
                    p, clip_cfg, images, tokens, impl=impl, remat=remat
                )
                acc = (logits.argmax(-1) == jnp.arange(logits.shape[0])).mean()
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return FinetuneState(state.step + 1, params, opt_state), {
                "loss": loss, "acc": acc,
            }

        return step

    def fit(self, batches, log_every: int = 10):
        """batches: iterable of {'image': [B,H,W,3] float, 'tokens': [B,77]}."""
        for i, batch in enumerate(batches):
            sb = shard_batch(batch, self.mesh)
            self.state, metrics = self.train_step(self.state, sb["image"], sb["tokens"])
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise FloatingPointError(f"non-finite loss at step {i}")
            if (i + 1) % log_every == 0:
                print(f"finetune step {i + 1}: loss {loss:.4f} "
                      f"acc {float(metrics['acc']):.3f}")
        return self.state
