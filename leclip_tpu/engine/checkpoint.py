"""Checkpoint I/O — tiny prompt-learner checkpoints with the reference's
directory layout.

Parity with the reference checkpoint contract (ref: Dassl dassl/utils/
torchtools.py:27-165, save cadence Caption_distill_double.py:576-587, load
:906-938): per-model directories ``{dir}/{name}/model.ckpt-{epoch}``, a
``checkpoint`` pointer file naming the latest, resume restores params +
optimizer + step, and eval-load ignores anything but the trainable prompt
params (the frozen token scaffolding is rebuilt from the current class list,
so checkpoints survive class-list changes — the strict=False analogue).

Format: flax msgpack of the TrainState pytree — a few hundred KB, seconds to
write, exactly the "prompt-params-only" property the reference relies on.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional

import jax
import jax.numpy as jnp
from flax import serialization

from .train_state import TrainState


def save_checkpoint(state: TrainState, directory: str, name: str, epoch: int) -> str:
    model_dir = join(directory, name)
    os.makedirs(model_dir, exist_ok=True)
    path = join(model_dir, f"model.ckpt-{epoch}")
    payload = {
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "ema_params": serialization.to_state_dict(jax.device_get(state.ema_params)),
        "opt_state": serialization.to_state_dict(jax.device_get(state.opt_state)),
        "step": int(state.step),
        "epoch": epoch,
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with open(join(model_dir, "checkpoint"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(directory: str, name: str) -> Optional[str]:
    pointer = join(directory, name, "checkpoint")
    if os.path.exists(pointer):
        with open(pointer) as f:
            fname = f.read().strip()
        path = join(directory, name, fname)
        if os.path.exists(path):
            return path
    # fall back to the highest-numbered file
    model_dir = join(directory, name)
    if not os.path.isdir(model_dir):
        return None
    ckpts = [f for f in os.listdir(model_dir) if f.startswith("model.ckpt")]
    if not ckpts:
        return None
    ckpts.sort(key=lambda f: int(f.rsplit("-", 1)[-1]) if "-" in f else -1)
    return join(model_dir, ckpts[-1])


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_train_state(state: TrainState, payload: dict) -> TrainState:
    """Full resume: params + ema + optimizer + step (template-shaped)."""
    params = serialization.from_state_dict(state.params, payload["params"])
    ema = serialization.from_state_dict(state.ema_params, payload["ema_params"])
    opt = serialization.from_state_dict(state.opt_state, payload["opt_state"])
    return TrainState(
        step=jnp.asarray(payload.get("step", 0), jnp.int32),
        params=params, ema_params=ema, opt_state=opt,
    )


def _latest_legacy_checkpoint(model_dir: str) -> Optional[str]:
    """Newest reference-format checkpoint in a model dir: ``model.pth.tar``
    if present, else the highest-numbered ``model.pth.tar-{e}`` (the
    reference's save suffixing, dassl/utils/torchtools.py:61-71)."""
    if not os.path.isdir(model_dir):
        return None
    tars = [f for f in os.listdir(model_dir) if f.startswith("model.pth.tar")]
    if not tars:
        return None
    def rank(f: str) -> int:
        suffix = f[len("model.pth.tar"):]
        if not suffix:
            return 10**9  # unsuffixed = "the best model" (ref load_model default)
        try:
            return int(suffix.lstrip("-"))
        except ValueError:
            return -1
    tars.sort(key=rank)
    return join(model_dir, tars[-1])


def load_prompt_params(
    directory: str, name: str, epoch: Optional[int] = None, use_ema: bool = False
) -> dict:
    """Eval-load: just the trainable prompt pytree for model ``name``.

    Accepts ``model.ckpt`` (pointer/best copies), ``model.ckpt-{e}``, and —
    for users migrating trained models from the reference — the reference's
    own ``model.pth.tar[-e]`` torch checkpoints (ref layout
    ``best_model/{name}/model.pth.tar``, Caption_distill_double.py:906-938),
    converted on the fly by ``models.convert.load_prompt_checkpoint``.
    Reference checkpoints carry no EMA twin; ``use_ema`` on one falls back
    to the saved (student) params — the reference exports its EMA variant as
    a separate model directory ('ema'), not as a twin inside the file."""
    if epoch is not None:
        path = join(directory, name, f"model.ckpt-{epoch}")
        if not os.path.exists(path):
            legacy = join(directory, name, f"model.pth.tar-{epoch}")
            path = legacy if os.path.exists(legacy) else path
    else:
        direct = join(directory, name, "model.ckpt")
        path = direct if os.path.exists(direct) else latest_checkpoint(directory, name)
        if path is None:
            path = _latest_legacy_checkpoint(join(directory, name))
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(f"no checkpoint for {name!r} under {directory!r}")
    if "model.pth.tar" in os.path.basename(path):
        from ..models.convert import load_prompt_checkpoint

        trainable, _ = load_prompt_checkpoint(path)
        return jax.tree.map(jnp.asarray, trainable)
    payload = load_checkpoint(path)
    key = "ema_params" if use_ema else "params"
    return jax.tree.map(jnp.asarray, payload[key])


def resume_if_exists(state: TrainState, directory: str, name: str):
    """RESUME semantics: restore the newest checkpoint if one exists; returns
    (state, start_epoch)."""
    path = latest_checkpoint(directory, name)
    if path is None:
        return state, 0
    payload = load_checkpoint(path)
    return restore_train_state(state, payload), int(payload.get("epoch", -1)) + 1


# ----------------------------- orbax backend --------------------------------
# Production-grade alternative to the msgpack files above: Orbax handles
# atomic writes, async saving, and sharded/multi-host arrays (the TPU-native
# checkpointing SURVEY §5 recommends). Same per-model directory layout.


def save_checkpoint_orbax(state: TrainState, directory: str, name: str, epoch: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(join(directory, name, f"orbax-{epoch}"))
    payload = {
        "params": jax.device_get(state.params),
        "ema_params": jax.device_get(state.ema_params),
        "step": int(state.step),
        "epoch": epoch,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    with open(join(directory, name, "checkpoint_orbax"), "w") as f:
        f.write(os.path.basename(path))
    return path


def load_checkpoint_orbax(directory: str, name: str, epoch: Optional[int] = None) -> dict:
    import orbax.checkpoint as ocp

    if epoch is None:
        pointer = join(directory, name, "checkpoint_orbax")
        with open(pointer) as f:
            fname = f.read().strip()
        path = os.path.abspath(join(directory, name, fname))
    else:
        path = os.path.abspath(join(directory, name, f"orbax-{epoch}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)
