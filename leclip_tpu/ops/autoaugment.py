"""AutoAugment — device-side learned augmentation policies.

The reference ships four AutoAugment policy classes (ref: Dassl
dassl/data/transforms/autoaugment.py:10-307 — MLC_Policy for VOC/COCO
multi-label, ImageNetPolicy, CIFAR10Policy, SVHNPolicy), each a list of
SubPolicy(p1, op1, mag1, p2, op2, mag2) applied by PIL per image on the host.
This is the TPU-native equivalent: the sub-policy tables are compiled once
into flat index/level/probability arrays (`_aa_policies.py`, contract data)
and `autoaugment(key, img, policy)` is a single jittable program — sample a
sub-policy with the PRNG, then run two `lax.switch`-dispatched ops from the
shared RandAugment kernel library (`ops/randaugment.py`), each gated by its
Bernoulli probability. Augmentation runs on device; no PIL round trips.

Magnitude-index → op-level mapping reproduces the reference's `ranges`
tables (SubPolicy.__init__:321-337): 10 linspace steps per op, random sign
for shear/translate/enhance ops (rotate is unsigned there, matching the
reference's `rotate_with_fill(+magnitude)`), posterize down to 4 bits,
solarize thresholds 256→0. Geometric ops warp about the image center
(the reference shears about the PIL origin — documented deviation; center
warps keep content in frame, fill value 0.5 == the reference's (128,)*3).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ._aa_policies import POLICIES
from .randaugment import (
    autocontrast,
    brightness,
    color,
    contrast,
    equalize,
    invert,
    posterize,
    rotate,
    sharpness,
    shear_x,
    shear_y,
    solarize,
    translate_x,
    translate_y,
)

# dispatch table: policy op name → (kernel, index); order is frozen because
# compiled tables store indices into it
AA_OPS = [
    ("shearx", shear_x), ("sheary", shear_y), ("translatex", translate_x),
    ("translatey", translate_y), ("rotate", rotate), ("color", color),
    ("posterize", posterize), ("solarize", solarize), ("contrast", contrast),
    ("sharpness", sharpness), ("brightness", brightness),
    ("autocontrast", autocontrast), ("equalize", equalize), ("invert", invert),
]
_OP_INDEX = {name: i for i, (name, _) in enumerate(AA_OPS)}

# ops the reference applies with a random ± sign (SubPolicy func table
# :347-409); rotate/posterize/solarize are unsigned there
_SIGNED = {"shearx", "sheary", "translatex", "translatey", "color",
           "contrast", "sharpness", "brightness"}

# the reference's 10-step magnitude ranges (SubPolicy.__init__:321-337)
_RANGES = {
    "shearx": np.linspace(0, 0.3, 10),
    "sheary": np.linspace(0, 0.3, 10),
    "translatex": np.linspace(0, 150 / 331, 10),
    "translatey": np.linspace(0, 150 / 331, 10),
    "rotate": np.linspace(0, 30, 10),
    "color": np.linspace(0.0, 0.9, 10),
    "posterize": np.round(np.linspace(8, 4, 10), 0).astype(np.int32),
    "solarize": np.linspace(256, 0, 10),
    "contrast": np.linspace(0.0, 0.9, 10),
    "sharpness": np.linspace(0.0, 0.9, 10),
    "brightness": np.linspace(0.0, 0.9, 10),
    "autocontrast": np.zeros(10),
    "equalize": np.zeros(10),
    "invert": np.zeros(10),
}


def _op_level(name: str, mag_idx: int) -> float:
    """Map a reference magnitude index to the RandAugment kernel's level
    convention (each kernel takes a normalised signed level)."""
    mag = float(_RANGES[name][mag_idx])
    if name in ("shearx", "sheary"):
        return mag                      # shear coefficient, used directly
    if name in ("translatex", "translatey"):
        return 3.0 * mag                # kernel shifts level*size/3 → mag*size
    if name == "rotate":
        return mag / 30.0               # kernel rotates level*30°
    if name == "posterize":
        # kernel keeps 8 - floor(|level|*6) bits; +0.5 centres the bucket
        return (8.0 - mag + 0.5) / 6.0
    if name == "solarize":
        return 1.0 - mag / 256.0        # kernel threshold = 1 - |level|
    return mag                          # enhance ops: blend factor 1 + level


@functools.lru_cache(maxsize=None)
def compile_policy(policy: str):
    """Sub-policy tuple table → flat device-ready arrays (cached per policy)."""
    rows: Sequence[Tuple] = POLICIES[policy]
    cols = {k: [] for k in ("op", "lvl", "p", "sg")}
    for p1, op1, m1, p2, op2, m2 in rows:
        for p, op, m in ((p1, op1, m1), (p2, op2, m2)):
            cols["op"].append(_OP_INDEX[op])
            cols["lvl"].append(_op_level(op, m))
            cols["p"].append(p)
            cols["sg"].append(op in _SIGNED)
    n = len(rows)
    return dict(
        n=n,
        op=jnp.asarray(cols["op"], jnp.int32).reshape(n, 2),
        lvl=jnp.asarray(cols["lvl"], jnp.float32).reshape(n, 2),
        p=jnp.asarray(cols["p"], jnp.float32).reshape(n, 2),
        sg=jnp.asarray(cols["sg"], jnp.bool_).reshape(n, 2),
    )


def _apply_stage(img, key, op_idx, lvl, p, signed):
    k_p, k_s, k_arg = jax.random.split(key, 3)
    sign = jnp.where(signed & jax.random.bernoulli(k_s), -1.0, 1.0)
    lvl = lvl * sign
    branches: List = [
        (lambda im, op=op: op(im, lvl, k_arg)) for _, op in AA_OPS
    ]
    out = jax.lax.switch(op_idx, branches, img)
    return jnp.where(jax.random.bernoulli(k_p, p), out, img)


def autoaugment(key, img: jnp.ndarray, policy: str = "mlc") -> jnp.ndarray:
    """Apply one randomly-chosen sub-policy (two probability-gated ops) from
    `policy` ∈ {mlc, imagenet, cifar10, svhn}. Image float in [0,1], any HxW;
    fully jittable (policy is a static table baked into the program)."""
    tbl = compile_policy(policy)
    k_idx, k1, k2 = jax.random.split(key, 3)
    i = jax.random.randint(k_idx, (), 0, tbl["n"])
    for s, k in ((0, k1), (1, k2)):
        img = _apply_stage(
            img, k, tbl["op"][i, s], tbl["lvl"][i, s], tbl["p"][i, s],
            tbl["sg"][i, s],
        )
    return img
