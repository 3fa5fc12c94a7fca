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
    single_step (periodic StepLR), and multi_step annealing plus
    constant/linear warmup with WARMUP_RECOUNT — the reference's scheduler
    menu with torch-exact per-epoch values (dassl/optim/lr_scheduler.py
    :83-154; golden-tested against the executed dassl schedulers in
    tests/test_reference_golden.py).

    dassl/torch subtleties reproduced exactly:
    * with warmup and ``WARMUP_RECOUNT=False`` the annealer's ``last_epoch``
      is ASSIGNED to WARMUP_EPOCH without recomputing the lr, so the first
      post-warmup epoch runs at full base lr and the cosine then continues
      via torch's chained form — a phase-jumped curve
      ``base·(1+cos(πe/T))/(1+cos(πW/T))``, not the closed form;
    * ``single_step`` is torch StepLR: a ×GAMMA drop every STEPSIZE epochs
      (periodic), not a single drop;
    * linear warmup is ``min_lr`` at epoch 0 then ``base·e/W`` (no min-lr
      offset in the interpolation);
    * milestones/step-multiples that fall inside the warmup window are
      skipped when WARMUP_RECOUNT=False (the annealer never sees them).
    """
    base = optim.LR
    max_epoch = optim.MAX_EPOCH
    warmup = optim.WARMUP_EPOCH
    recount = getattr(optim, "WARMUP_RECOUNT", True)
    sched = optim.SCHED.lower()
    warm_on = bool(warmup and warmup > 0)

    def anneal(epoch):
        if sched == "cosine":
            if warm_on and recount:
                return base * 0.5 * (1.0 + jnp.cos(jnp.pi * (epoch - warmup) / max_epoch))
            if warm_on:
                return base * (1.0 + jnp.cos(jnp.pi * epoch / max_epoch)) / (
                    1.0 + jnp.cos(jnp.pi * warmup / max_epoch)
                )
            return base * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max_epoch))
        if sched == "single_step":
            ss = optim.STEPSIZE[0] if optim.STEPSIZE else -1
            ss = ss if ss > 0 else max_epoch  # dassl: stepsize<=0 → max_epoch
            if warm_on and recount:
                drops = (epoch - warmup) // ss
            elif warm_on:
                drops = epoch // ss - warmup // ss
            else:
                drops = epoch // ss
            return base * optim.GAMMA ** drops
        if sched == "multi_step":
            ms = optim.STEPSIZE
            if warm_on and recount:
                drops = sum(jnp.where(epoch - warmup >= m, 1, 0) for m in ms)
            elif warm_on:
                drops = sum(jnp.where(epoch >= m, 1, 0) for m in ms if m > warmup)
            else:
                drops = sum(jnp.where(epoch >= m, 1, 0) for m in ms)
            return base * optim.GAMMA ** drops
        if sched == "constant":
            return jnp.asarray(base)
        raise ValueError(f"unknown scheduler {optim.SCHED!r}")

    def lr(step):
        epoch = step // steps_per_epoch
        main = anneal(epoch)
        if warm_on:
            if optim.WARMUP_TYPE == "linear":
                w = jnp.where(
                    epoch == 0, optim.WARMUP_MIN_LR, base * epoch / warmup
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
