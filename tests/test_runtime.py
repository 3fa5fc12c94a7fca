"""Native JPEG runtime + freq-stats builder."""

import os

import numpy as np
import pytest
from PIL import Image

from leclip_tpu.data.freq_stats import build_freq_stats, load_freq_stats, save_freq_stats
from leclip_tpu.data.loader import ImageBatcher
from leclip_tpu.runtime.jpeg import decode_batch, native_available
from tests.conftest import REFERENCE_ROOT, has_reference


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (90, 90), (200, 150)]):
        p = str(d / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(p, quality=92)
        paths.append(p)
    # one PNG to exercise the non-JPEG fallback
    png = str(d / "x.png")
    Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(png)
    return paths, png


def test_native_decode_matches_pil(jpegs):
    paths, _ = jpegs
    out = decode_batch(paths, threads=4)
    for p, arr in zip(paths, out):
        pil = np.asarray(Image.open(p).convert("RGB"))
        assert arr.shape == pil.shape
        np.testing.assert_array_equal(arr, pil)


def test_non_jpeg_fallback(jpegs):
    paths, png = jpegs
    out = decode_batch(paths + [png])
    assert out[-1].shape == (64, 64, 3)


def test_image_batcher_native(jpegs):
    paths, _ = jpegs
    batcher = ImageBatcher(paths, batch_size=2)
    batches = list(batcher)
    assert len(batches) == 2
    imgs, names = batches[0]
    assert len(imgs) == 2 and imgs[0].dtype == np.uint8
    # native/pil must agree
    pil_batcher = ImageBatcher(paths, batch_size=2, native=False)
    pil_imgs, _ = next(iter(pil_batcher))
    np.testing.assert_array_equal(imgs[0], pil_imgs[0])


def test_image_batcher_bucket_sorted(tmp_path):
    """sort_by_bucket groups batches by shape bucket (one huge image no
    longer drags a batch to the 1280² program) and inverse_order restores
    the original input order."""
    rng = np.random.default_rng(1)
    sizes = [(100, 100), (1400, 900), (120, 90), (80, 200), (1300, 1300),
             (130, 110)]
    paths = []
    for i, (h, w) in enumerate(sizes):
        p = str(tmp_path / f"s{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(p)
        paths.append(p)
    batcher = ImageBatcher(paths, batch_size=2, sort_by_bucket=True)
    # small images first, the two 1280²-bucket giants together at the end
    assert [batcher.paths[i] for i in np.argsort(batcher.order)] == paths
    big = {paths[1], paths[4]}
    assert set(batcher.paths[-2:]) == big
    # per-batch max bucket: only the last batch needs the largest program
    from leclip_tpu.inference.tta import pick_bucket

    batch_buckets = []
    for imgs, _ in batcher:
        batch_buckets.append(max(pick_bucket(*im.shape[:2]) for im in imgs))
    assert batch_buckets[-1] == (1280, 1280)
    assert all(b != (1280, 1280) for b in batch_buckets[:-1])
    # inverse_order restores input order on per-image outputs
    outs = np.concatenate([
        np.asarray([im.shape[0] * 10000 + im.shape[1] for im in imgs])
        for imgs, _ in batcher
    ])
    restored = outs[batcher.inverse_order]
    np.testing.assert_array_equal(
        restored, [h * 10000 + w for h, w in sizes]
    )


def test_freq_stats_builder(tmp_path):
    labels = np.array([
        [1, 1, 0],
        [1, 0, 1],
        [1, 0, 0],
    ])
    stats = build_freq_stats(labels)
    np.testing.assert_array_equal(stats["nums"], [3, 1, 1])
    assert stats["adj"][0, 1] == 1 and stats["adj"][0, 2] == 1
    assert stats["adj"][1, 2] == 0
    assert (np.diag(stats["adj"]) == 0).all()
    path = str(tmp_path / "freq.pkl")
    save_freq_stats(stats, path)
    loaded = load_freq_stats(path)
    np.testing.assert_array_equal(loaded["adj"], stats["adj"])


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_reference_freq_stats_format_compatible():
    """Our loader consumes the reference's shipped artifact directly."""
    stats = load_freq_stats(f"{REFERENCE_ROOT}/project/my_code/freq_stats.pkl")
    assert stats["adj"].shape == (80, 80)
    assert stats["nums"].shape == (80,)
    assert (np.diag(stats["adj"]) == 0).all()
    from leclip_tpu.ops.ensemble import normalized_cooccurrence

    p = normalized_cooccurrence(stats["adj"], stats["nums"])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
