"""Renderer contract for the labeled synthetic IMAGE benchmark
(leclip_tpu/data/synth_images.py): identity uniqueness, determinism, and
label/caption consistency — the properties the round-5 image closed loop
(scripts/image_rehearsal.py) rests on."""

import numpy as np
import pytest

from leclip_tpu.data.synth_images import (N_CLASSES, class_attributes,
                                          class_color, make_labeled_images,
                                          render_glyph, render_scene,
                                          sample_scene)
from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES


def test_class_attributes_unique_and_total():
    combos = {class_attributes(c) for c in range(N_CLASSES)}
    assert len(combos) == N_CLASSES == 80
    with pytest.raises(ValueError):
        class_attributes(80)


def test_glyphs_pairwise_distinct():
    flat = []
    for c in range(N_CLASSES):
        rgb, alpha = render_glyph(c, 24)
        flat.append((rgb * alpha[..., None]).ravel())
    flat = np.stack(flat)
    d = np.linalg.norm(flat[:, None] - flat[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 1.0  # every pair separated by a solid pixel margin


def test_render_scene_deterministic():
    a = render_scene(np.random.default_rng(5), [3, 17], 96, 128)
    b = render_scene(np.random.default_rng(5), [3, 17], 96, 128)
    assert a.dtype == np.uint8 and a.shape == (96, 128, 3)
    np.testing.assert_array_equal(a, b)


def test_scene_contains_glyph_colors():
    # a solid disk class: its hue must dominate some region of the scene
    c = 0  # hue 0 (red), disk, solid
    img = render_scene(np.random.default_rng(0), [c], 128, 128,
                       scale_range=(0.5, 0.5)).astype(np.float32) / 255
    color = class_color(c)
    d = np.linalg.norm(img - color, axis=-1)
    assert (d < 0.15).sum() > 0.05 * img.shape[0] * img.shape[1]


def test_sample_scene_labels_and_caption():
    rng = np.random.default_rng(9)
    img, labels, cap = sample_scene(rng, COCO_OBJECT_CATEGORIES, 96, 96,
                                    k_range=(2, 2))
    ids = np.flatnonzero(labels)
    assert len(ids) == 2
    for i in ids:
        assert COCO_OBJECT_CATEGORIES[i] in cap


def test_make_labeled_images_shapes_and_determinism():
    sizes = ((64, 64), (96, 128))
    imgs, labels, caps = make_labeled_images(
        6, COCO_OBJECT_CATEGORIES, seed=1, sizes=sizes)
    assert labels.shape == (6, len(COCO_OBJECT_CATEGORIES))
    assert [im.shape[:2] for im in imgs[:2]] == [(64, 64), (96, 128)]
    imgs2, labels2, caps2 = make_labeled_images(
        6, COCO_OBJECT_CATEGORIES, seed=1, sizes=sizes)
    np.testing.assert_array_equal(labels, labels2)
    np.testing.assert_array_equal(imgs[3], imgs2[3])
    assert caps == caps2


def test_labeler_agrees_with_render_labels():
    # the production synonym labeler must recover the rendered classes from
    # the generated caption (the property prompt training relies on)
    from leclip_tpu.data.labeling import CaptionLabeler

    labeler = CaptionLabeler()
    rng = np.random.default_rng(3)
    agree = 0
    for _ in range(20):
        _, labels, cap = sample_scene(rng, COCO_OBJECT_CATEGORIES, 64, 64,
                                      k_range=(1, 3))
        got = np.asarray(labeler(cap), np.float32)
        agree += int((got >= labels).all())  # labeler may add synonyms' extras
    assert agree >= 18
