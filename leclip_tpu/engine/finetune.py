"""Dual-encoder CLIP fine-tuning — BASELINE config 4 ("Dual-encoder
fine-tune ViT-B/16 + RN101, data-parallel pmap replacing DDP").

Unlike prompt tuning (frozen towers, tiny trainable pytree), this trains the
FULL dual encoder: symmetric InfoNCE over (image, caption) pairs with the
learnable logit_scale (clamped at 100 like CLIP), AdamW, optional
rematerialisation for memory, batch sharded over the data mesh with params
replicated — XLA inserts the gradient all-reduce.

A full pipeline, not just a step function: ``fit_pairs`` consumes a
``data.loader.PairBatcher`` (native JPEG decode on host, content-aware
augmentation fused into the train step on device), writes JSONL metrics,
checkpoints per epoch in the same ``{dir}/{name}/model.ckpt-{e}`` layout as
the prompt trainer, and resumes (params + optimizer + step). Reference
equivalents: DatasetWrapper/DataManager (dassl/data/data_manager.py:215-285)
and torchtools resume (dassl/utils/torchtools.py:126-165).

Supports multi-backbone ensembles by running one FineTuner per backbone
(e.g. ViT-B/16 + RN101) over the same pair stream.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip import CLIPConfig, clip_encode_image, clip_encode_text
from ..parallel.mesh import data_mesh, prefetch_sharded, replicate, shard_batch

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

    def _build_raw_step(self):
        """Train step over RAW bucket-padded uint8 batches: the content-aware
        augmentation runs inside the same XLA program as the encoders."""
        if getattr(self, "_raw_step", None) is not None:
            return self._raw_step
        from ..ops.preprocess import preprocess_train_batch

        optimizer = self.optimizer
        clip_cfg = self.clip_cfg
        impl, remat = self._impl, self._remat
        size = clip_cfg.image_resolution

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: FinetuneState, seed, images_u8, content, tokens):
            # PRNG key derived on device from a host int (avoids a per-step
            # host-side key-split dispatch over the tunnel)
            key = jax.random.PRNGKey(seed)
            images = preprocess_train_batch(key, images_u8, content, size=size)
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

        self._raw_step = step
        return step

    # --------------------------- persistence --------------------------------

    def save(self, directory: str, name: str = "clip_finetune",
             epoch: int = 0) -> str:
        """Checkpoint params + optimizer + step (same layout/pointer contract
        as the prompt trainer's checkpoints)."""
        from flax import serialization

        model_dir = os.path.join(directory, name)
        os.makedirs(model_dir, exist_ok=True)
        path = os.path.join(model_dir, f"model.ckpt-{epoch}")
        payload = {
            "params": serialization.to_state_dict(jax.device_get(self.state.params)),
            "opt_state": serialization.to_state_dict(jax.device_get(self.state.opt_state)),
            "step": int(self.state.step),
            "epoch": epoch,
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        with open(os.path.join(model_dir, "checkpoint"), "w") as f:
            f.write(os.path.basename(path))
        return path

    def resume(self, directory: str, name: str = "clip_finetune") -> int:
        """Restore the newest checkpoint if present; returns start_epoch."""
        from flax import serialization

        from .checkpoint import latest_checkpoint, load_checkpoint

        path = latest_checkpoint(directory, name)
        if path is None:
            return 0
        payload = load_checkpoint(path)
        host = jax.device_get(self.state)
        params = serialization.from_state_dict(host.params, payload["params"])
        opt = serialization.from_state_dict(host.opt_state, payload["opt_state"])
        state = FinetuneState(
            jnp.asarray(payload.get("step", 0), jnp.int32), params, opt
        )
        self.state = replicate(state, self.mesh)
        return int(payload.get("epoch", -1)) + 1

    # ------------------------------- loops -----------------------------------

    @staticmethod
    def _sync_cadence(sync_every: int, log_every: int) -> int:
        """0 = auto: defer host syncs to log boundaries on TPU (each float()
        costs a ~32 ms tunnel round trip — same rule as trainer.train's
        TRAIN.sync_every); per-step elsewhere (CPU in-process collectives
        deadlock past ~hundreds of queued steps, and tests want NaNs now)."""
        if sync_every > 0:
            return sync_every
        return max(log_every, 1) if jax.default_backend() == "tpu" else 1

    def _drain_metrics(self, pending, writer, where: str):
        """Fetch queued per-step device metrics in one host pass; per-step
        JSONL rows are preserved — only WHEN they convert moves."""
        for step, m in pending:
            loss = float(m["loss"])
            if not np.isfinite(loss):
                raise FloatingPointError(f"non-finite loss at {where}")
            if writer is not None:
                writer.write_scalars(
                    {"loss": loss, "acc": float(m["acc"])}, step,
                    prefix="finetune/",
                )
        last = pending[-1][1]
        pending.clear()
        return float(last["loss"]), float(last["acc"])

    def fit(self, batches, log_every: int = 10, metrics_writer=None,
            prefetch: int = 0, sync_every: int = 0):
        """batches: iterable of {'image': [B,H,W,3] float, 'tokens': [B,77]}.

        prefetch > 0 uploads batch N+1 from a background thread while batch N
        computes; sync_every (0 = auto) batches the device→host metric
        fetches so the loop pipelines on-device between log boundaries."""
        sync = self._sync_cadence(sync_every, log_every)
        pending = []
        step0 = int(self.state.step)  # fetched ONCE; int(step) per step would
        for i, sb in enumerate(       # re-serialise the loop on the tunnel
            prefetch_sharded(batches, self.mesh, depth=prefetch)
        ):
            self.state, metrics = self.train_step(self.state, sb["image"], sb["tokens"])
            pending.append((step0 + i + 1, metrics))
            if (i + 1) % sync != 0 and (i + 1) % log_every != 0:
                continue
            loss, acc = self._drain_metrics(
                pending, metrics_writer, f"step {i}"
            )
            if (i + 1) % log_every == 0:
                print(f"finetune step {i + 1}: loss {loss:.4f} "
                      f"acc {acc:.3f}")
        if pending:
            self._drain_metrics(pending, metrics_writer, "final step")
        return self.state

    def fit_pairs(
        self,
        pair_batcher,
        epochs: int = 1,
        output_dir: Optional[str] = None,
        name: str = "clip_finetune",
        resume: bool = True,
        seed: int = 0,
        log_every: int = 10,
        prefetch: int = 0,
        sync_every: int = 0,
    ):
        """Full (image, caption) pipeline: per-epoch shuffled PairBatcher
        batches → device-side augmentation fused into the train step →
        JSONL metrics → per-epoch checkpoints, with resume.

        Multi-host: construct the PairBatcher with
        ``shard_index=jax.process_index(), num_shards=jax.process_count()``
        so each process loads a distinct shard — shard_batch assembles the
        global array, and the contrastive arange-diagonal stays correct
        (duplicated per-process data would give every caption P-1 identical
        "negatives")."""
        from ..parallel.multihost import is_primary

        step_fn = self._build_raw_step()
        writer = None
        start_epoch = 0
        primary = is_primary()  # rank-0 persistence gate (see trainer.train)
        if output_dir:
            from .metrics import MetricsWriter

            if primary:
                writer = MetricsWriter(output_dir)
            if resume:
                start_epoch = self.resume(output_dir, name)
                if start_epoch and primary:
                    print(f"resumed {name} at epoch {start_epoch} "
                          f"(step {int(self.state.step)})")
        sync = self._sync_cadence(sync_every, log_every)
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            pending = []
            step0 = int(self.state.step)
            for i, sb in enumerate(prefetch_sharded(
                pair_batcher.epoch(epoch), self.mesh, depth=prefetch
            )):
                step_seed = np.int32((seed * 1_000_003 + epoch * 100_000 + i)
                                     % (2**31 - 1))
                self.state, metrics = step_fn(
                    self.state, step_seed, sb["image_u8"], sb["content"], sb["tokens"]
                )
                pending.append((step0 + i + 1, metrics))
                if (i + 1) % sync != 0 and (i + 1) % log_every != 0:
                    continue
                loss, _ = self._drain_metrics(
                    pending, writer, f"epoch {epoch} step {i}"
                )
                if (i + 1) % log_every == 0 and primary:
                    print(f"epoch {epoch} step {i + 1}: loss {loss:.4f}")
            if pending:
                self._drain_metrics(pending, writer,
                                    f"epoch {epoch} final step")
            if output_dir and primary:
                self.save(output_dir, name, epoch)
                writer.flush()
            if primary:
                print(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        if writer is not None:
            writer.close()
        return self.state
