"""Randomized parity fuzz against the reference's EXECUTED code.

Extends the fixed-case direct goldens (tests/test_reference_golden.py) with
generated inputs: the TTA crop factory over many random image sizes
(including extreme aspect ratios and the negative-padding oversized regime,
ref dassl/data/data_manager.py:311-492) and the byte-BPE tokenizer over
generated strings mixing case, digits, punctuation runs, contractions,
double-escaped HTML entities, NFC-stable unicode and emoji (ref
project/my_code/clip/simple_tokenizer.py). Fixed seeds — deterministic."""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

from tests.conftest import REFERENCE_ROOT, requires_reference

DATA_MANAGER = os.path.join(
    REFERENCE_ROOT,
    "project/my_code/Dassl.pytorch-master/dassl/data/data_manager.py",
)


def _reference_crops(img_np: np.ndarray, scales) -> list:
    """Run the reference's DatasetWrapperWithBlock._transform_image and
    collect every produced crop's pixel content (whole-image entry dropped)."""
    from PIL import Image

    from tests import _refshim

    _refshim.install_shims()
    import torchvision.transforms.functional as F  # the shim

    class _Base:
        pass

    ns = _refshim.extract_functions(
        DATA_MANAGER, ["DatasetWrapperWithBlock"],
        extra_globals={"DatasetWrapper": _Base, "F": F},
    )
    wrapper = object.__new__(ns["DatasetWrapperWithBlock"])
    wrapper.multi_scale = list(scales)
    wrapper.k_tfm = 1

    crops = []

    def tfm(pil):
        crops.append(np.asarray(pil).copy())
        return torch.zeros(1)

    wrapper._transform_image(tfm, Image.fromarray(img_np))
    return crops[1:]


@requires_reference
@pytest.mark.parametrize("seed", range(10))
def test_crop_factory_fuzz_random_sizes(seed):
    """Crop-content parity on random image geometries: every crop the
    reference's code produces equals the window selected by our box geometry
    (ops/crops.sliding_window_boxes), in order, reflect padding and edge
    clamping included."""
    from leclip_tpu.ops.crops import sliding_window_boxes

    rng = np.random.default_rng(1000 + seed)
    if seed < 6:
        h = int(rng.integers(32, 420))
        w = int(rng.integers(32, 420))
    elif seed < 8:
        # extreme aspect ratios (panoramas / scans)
        h, w = (int(rng.integers(32, 64)), int(rng.integers(300, 700)))
        if seed == 7:
            h, w = w, h
    else:
        # oversized images — the negative-padding (crop) regime of the
        # reference's square-window formula (data_manager.py:388)
        h = int(rng.integers(450, 700))
        w = int(rng.integers(450, 700))
    scales = (2, 3, 4) if seed in (0, 5, 9) else (2, 3)

    img_np = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ref_crops = _reference_crops(img_np, scales)

    boxes, counts = sliding_window_boxes(h, w, scales)
    assert len(ref_crops) == len(boxes) == sum(counts), (h, w, scales)
    pad_b = int(max(0.0, float(boxes[:, 2].max()) - h))
    pad_r = int(max(0.0, float(boxes[:, 3].max()) - w))
    padded = np.pad(img_np, ((0, pad_b), (0, pad_r), (0, 0)), mode="reflect")
    for k, box in enumerate(boxes.astype(int)):
        y0, x0, y1, x1 = box
        np.testing.assert_array_equal(
            ref_crops[k], padded[y0:y1, x0:x1],
            err_msg=f"size=({h},{w}) scales={scales} crop {k} box {box.tolist()}",
        )


# ---------------------------------------------------------------------------
# tokenizer fuzz


_FRAGMENTS = [
    "a", "photo", "of", "the", "cat", "skateboard", "refrigerator",
    "teddy bear", "fire hydrant", "Zxqvutl", "pneumonoultramicroscopic",
    "PhOtO", "HELLO", "iPhone", "İstanbul",
    "1", "42", "1234567890", "3.14159", "80-class", "2x3",
    "!!?", "...", ",;:", "-()[]{}", "\"quoted\"", "'single'", "***",
    "don't", "we're", "it's", "I'll", "you've", "he'd", "I'm",
    "&amp;", "&lt;tag&gt;", "&amp;amp;", "&quot;hi&quot;", "&#65;",
    "café", "naïve", "über", "señor", "œuvre", "Ångström",
    "🙂", "🐈", "猫", "犬と猫", "привет", "γάτα",
    "<|startoftext|>", "<|endoftext|>",
    "a" * 40, "ha" * 30,
]
_WHITESPACE = [" ", "  ", "\t", "\n", " \t ", "\r\n", "   \n\t"]


def _gen_string(rng) -> str:
    n = int(rng.integers(1, 20))
    parts = [_FRAGMENTS[int(rng.integers(len(_FRAGMENTS)))] for _ in range(n)]
    seps = [_WHITESPACE[int(rng.integers(len(_WHITESPACE)))] for _ in range(n)]
    out = "".join(p + s for p, s in zip(parts, seps))
    if rng.random() < 0.2:
        out = _WHITESPACE[int(rng.integers(len(_WHITESPACE)))] + out
    return out


@requires_reference
def test_tokenizer_fuzz_parity_with_reference():
    """Token-id parity with the reference SimpleTokenizer on 300 generated
    strings (byte-level BPE, merge order, contraction/digit/punctuation
    pre-tokenisation, double HTML-unescape, whitespace collapse, casefolding).

    The ftfy shim is identity on both sides; every unicode fragment above is
    NFC-stable so our NFC normalisation is identity too — ids must match
    exactly."""
    from leclip_tpu.data.tokenizer import get_tokenizer

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    sys.modules.setdefault("ftfy", ftfy)
    spec = importlib.util.spec_from_file_location(
        "ref_tok_fuzz",
        f"{REFERENCE_ROOT}/project/my_code/clip/simple_tokenizer.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.SimpleTokenizer()
    tok = get_tokenizer()

    rng = np.random.default_rng(7)
    for i in range(300):
        s = _gen_string(rng)
        assert tok.encode(s) == ref.encode(s), f"case {i}: {s!r}"
