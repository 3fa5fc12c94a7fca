"""Training state + optimizer/schedule construction.

Optimizer semantics matches the reference stack (ref: Dassl dassl/optim/
optimizer.py:13-137, lr_scheduler.py:83-154, update cadence
dassl/engine/trainer.py + Caption_distill_double.py:894-895): SGD with
momentum 0.9 and coupled weight decay 5e-4 over the prompt-learner params
only, cosine annealing stepped ONCE PER EPOCH, optional constant/linear
warmup epochs. adam/adamw/rmsprop/radam are available for config parity.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.prompt import ema_init
from .config import OptimConfig


class TrainState(NamedTuple):
    step: jnp.ndarray            # global step counter
    params: Dict[str, Any]       # trainable prompt-learner pytree
    ema_params: Dict[str, Any]   # momentum twin (same structure)
    opt_state: Any


def epoch_lr_schedule(optim: OptimConfig, steps_per_epoch: int) -> Callable:
    """LR as a function of the global step, constant within an epoch (the
    reference steps its scheduler at epoch end). Supports cosine (default),
    single_step, and multi_step annealing plus constant/linear warmup —
    the reference's scheduler menu (dassl/optim/lr_scheduler.py:83-154)."""
    base = optim.LR
    max_epoch = optim.MAX_EPOCH
    warmup = optim.WARMUP_EPOCH
    sched = optim.SCHED.lower()

    def anneal(epoch):
        if sched == "cosine":
            return base * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max_epoch))
        if sched == "single_step":
            step_at = optim.STEPSIZE[0] if optim.STEPSIZE else max_epoch
            return base * jnp.where(epoch < step_at, 1.0, optim.GAMMA)
        if sched == "multi_step":
            drops = sum(jnp.where(epoch >= m, 1, 0) for m in optim.STEPSIZE)
            return base * optim.GAMMA**drops
        if sched == "constant":
            return jnp.asarray(base)
        raise ValueError(f"unknown scheduler {optim.SCHED!r}")

    def lr(step):
        epoch = step // steps_per_epoch
        main = anneal(epoch)
        if warmup and warmup > 0:
            if optim.WARMUP_TYPE == "linear":
                w = optim.WARMUP_MIN_LR + (base - optim.WARMUP_MIN_LR) * (
                    epoch / jnp.maximum(warmup, 1)
                )
            else:
                w = jnp.asarray(optim.WARMUP_CONS_LR)
            return jnp.where(epoch < warmup, w, main)
        return main

    return lr


def build_optimizer(optim: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = epoch_lr_schedule(optim, steps_per_epoch)
    name = optim.NAME.lower()
    if name == "sgd":
        # torch-SGD order: grad += wd*param, then momentum trace, then -lr
        return optax.chain(
            optax.add_decayed_weights(optim.WEIGHT_DECAY),
            optax.trace(decay=optim.MOMENTUM, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        )
    if name in ("adam", "amsgrad"):
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(optim.WEIGHT_DECAY),
            optax.scale_by_learning_rate(schedule),
        )
    if name == "adamw":
        return optax.adamw(schedule, weight_decay=optim.WEIGHT_DECAY)
    if name == "rmsprop":
        return optax.chain(
            optax.scale_by_rms(),
            optax.add_decayed_weights(optim.WEIGHT_DECAY),
            optax.scale_by_learning_rate(schedule),
        )
    if name == "radam":
        return optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(optim.WEIGHT_DECAY),
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError(f"unknown optimizer {optim.NAME!r}")


def create_train_state(
    trainable: Dict[str, Any], optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable,
        ema_params=ema_init(trainable),
        opt_state=optimizer.init(trainable),
    )
