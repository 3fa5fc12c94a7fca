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


def _torch_sgd_momentum(decay: float, dampening: float, nesterov: bool):
    """torch.optim.SGD momentum buffer, incl. dampening: the FIRST step's
    buffer is the raw gradient, later steps use m·buf + (1−d)·g (torch
    sgd.py semantics; identical to optax.trace when d == 0)."""

    def init(params):
        return {
            "trace": jax.tree.map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params=None):
        first = state["step"] == 0
        new_trace = jax.tree.map(
            lambda t, g: jnp.where(first, g, decay * t + (1.0 - dampening) * g),
            state["trace"], updates,
        )
        if nesterov:
            out = jax.tree.map(lambda g, t: g + decay * t, updates, new_trace)
        else:
            out = new_trace
        return out, {"trace": new_trace, "step": state["step"] + 1}

    return optax.GradientTransformation(init, update)


def _torch_amsgrad(b1: float, b2: float, eps: float = 1e-8):
    """torch.optim.Adam(amsgrad=True) scaling: the max accumulator tracks the
    RAW second moment and bias correction divides the maxed value
    (denom = √(max_v / bc2) + eps) — optax.scale_by_amsgrad instead maxes the
    bias-corrected moment, which diverges from torch after the first steps."""

    def init(params):
        # three INDEPENDENT zero trees — sharing one aliases the buffers and
        # breaks donation in jitted steps ("donate the same buffer twice")
        return {"count": jnp.zeros((), jnp.int32),
                "mu": jax.tree.map(jnp.zeros_like, params),
                "nu": jax.tree.map(jnp.zeros_like, params),
                "nu_max": jax.tree.map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], updates)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return out, {"count": count, "mu": mu, "nu": nu, "nu_max": nu_max}

    return optax.GradientTransformation(init, update)


def build_optimizer(optim: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Optimizer menu with torch-exact update semantics (the reference builds
    torch optimizers, dassl/optim/optimizer.py:83-137): weight decay is added
    to the GRADIENT before the moment updates for every optimizer except
    AdamW (decoupled). Trajectory-golden-tested against the executed torch
    optimizers (incl. the vendored dassl RAdam) in
    tests/test_reference_golden.py."""
    schedule = epoch_lr_schedule(optim, steps_per_epoch)
    name = optim.NAME.lower()
    wd = optax.add_decayed_weights(optim.WEIGHT_DECAY)
    lr = optax.scale_by_learning_rate(schedule)
    b1 = getattr(optim, "ADAM_BETA1", 0.9)
    b2 = getattr(optim, "ADAM_BETA2", 0.999)
    if name == "sgd":
        dampening = getattr(optim, "SGD_DAMPNING", 0.0)  # dassl's spelling
        nesterov = getattr(optim, "SGD_NESTEROV", False)
        if dampening:
            mom = _torch_sgd_momentum(optim.MOMENTUM, dampening, nesterov)
        else:
            mom = optax.trace(decay=optim.MOMENTUM, nesterov=nesterov)
        return optax.chain(wd, mom, lr)
    if name == "adam":
        return optax.chain(wd, optax.scale_by_adam(b1=b1, b2=b2), lr)
    if name == "amsgrad":
        return optax.chain(wd, _torch_amsgrad(b1, b2), lr)
    if name == "adamw":
        return optax.adamw(schedule, b1=b1, b2=b2,
                           weight_decay=optim.WEIGHT_DECAY)
    if name == "rmsprop":
        # torch RMSprop: sq = α·sq + (1−α)·g², denom = √sq + eps (eps OUTSIDE
        # the sqrt), buf = m·buf + g/denom, p -= lr·buf
        alpha = getattr(optim, "RMSPROP_ALPHA", 0.99)
        return optax.chain(
            wd,
            optax.scale_by_rms(decay=alpha, eps=1e-8, eps_in_sqrt=False),
            optax.trace(decay=optim.MOMENTUM),
            lr,
        )
    if name == "radam":
        # the vendored dassl RAdam decouples weight decay (param·wd·lr added
        # directly, radam.py:113-125) — wd goes AFTER the moment scaling
        return optax.chain(optax.scale_by_radam(b1=b1, b2=b2), wd, lr)
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
