"""AutoAugment policy library tests: table parity with the reference's
sub-policy counts, magnitude-range semantics (posterize bits / solarize
threshold roundtrips), and the jitted policy program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leclip_tpu.ops._aa_policies import POLICIES
from leclip_tpu.ops.autoaugment import (
    _OP_INDEX,
    _RANGES,
    _op_level,
    autoaugment,
    compile_policy,
)
from leclip_tpu.ops.randaugment import posterize, solarize


def test_policy_tables_match_reference_counts():
    # ref autoaugment.py: MLC 117 active sub-policies (3 Cutout lines
    # commented out), 25 each for ImageNet/CIFAR10/SVHN
    assert {k: len(v) for k, v in POLICIES.items()} == {
        "mlc": 117, "imagenet": 25, "cifar10": 25, "svhn": 25,
    }
    for rows in POLICIES.values():
        for p1, op1, m1, p2, op2, m2 in rows:
            assert 0.0 <= p1 <= 1.0 and 0.0 <= p2 <= 1.0
            assert op1 in _OP_INDEX and op2 in _OP_INDEX
            assert 0 <= m1 < 10 and 0 <= m2 < 10


def test_posterize_level_mapping_hits_exact_bits():
    # ranges map magnitude idx → bits 8..4; the kernel keeps
    # 8 - floor(level*6) bits, so the mapped level must round-trip
    img = jnp.linspace(0, 1, 256).reshape(16, 16, 1)
    for idx in range(10):
        bits = int(_RANGES["posterize"][idx])
        lvl = _op_level("posterize", idx)
        out = np.asarray(posterize(img, lvl, None))
        # b-bit posterize quantises to 2^b - 1 steps
        scale = 2.0**bits - 1
        assert np.allclose(out, np.round(np.asarray(img) * scale) / scale, atol=1e-6)


def test_solarize_level_mapping_matches_threshold():
    img = jnp.linspace(0, 1, 100).reshape(10, 10, 1)
    for idx in (0, 5, 9):
        thr = float(_RANGES["solarize"][idx]) / 256.0
        out = np.asarray(solarize(img, _op_level("solarize", idx), None))
        ref = np.where(np.asarray(img) >= thr, 1.0 - np.asarray(img), np.asarray(img))
        assert np.allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("policy", ["mlc", "imagenet", "cifar10", "svhn"])
def test_autoaugment_jit_shape_range_determinism(policy):
    tbl = compile_policy(policy)
    assert tbl["op"].shape == (tbl["n"], 2)
    img = jax.random.uniform(jax.random.PRNGKey(0), (24, 32, 3))
    fn = jax.jit(lambda k, im: autoaugment(k, im, policy))
    a = np.asarray(fn(jax.random.PRNGKey(1), img))
    b = np.asarray(fn(jax.random.PRNGKey(1), img))
    c = np.asarray(fn(jax.random.PRNGKey(2), img))
    assert a.shape == img.shape
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)  # same key → same augmentation
    assert not np.array_equal(a, c) or True  # different key may differ


def test_autoaugment_distribution_changes_images():
    # over many keys, most draws must modify the image (p-gated ops fire)
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    fn = jax.jit(lambda k: autoaugment(k, img, "mlc"))
    changed = sum(
        not np.array_equal(np.asarray(fn(jax.random.PRNGKey(i))), np.asarray(img))
        for i in range(20)
    )
    assert changed >= 10
