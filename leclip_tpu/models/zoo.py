"""OpenAI CLIP checkpoint zoo: URL table, sha256-verified download, cached
load — the reference loader's public surface (ref: project/my_code/clip/
clip.py:29-123 _MODELS/_download). Zero-egress environments pass a local
path instead; `load(name_or_path)` handles both."""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from typing import Tuple

from .clip import CLIPConfig
from .convert import load_clip_weights

# name → (url, sha256 prefix embedded in the URL path)
MODEL_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}

available_models = sorted(MODEL_URLS)


def _expected_sha256(url: str) -> str:
    return url.split("/")[-2]


def download(name: str, root: str = "~/.cache/leclip") -> str:
    """Download + sha256-verify a checkpoint; returns the local path. Raises
    a clear error in zero-egress environments."""
    url = MODEL_URLS[name]
    root = os.path.expanduser(root)
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    expected = _expected_sha256(url)
    if os.path.exists(target):
        digest = hashlib.sha256(open(target, "rb").read()).hexdigest()
        if digest == expected:
            return target
        warnings.warn(f"{target} exists with wrong sha256 — re-downloading")
    try:
        urllib.request.urlretrieve(url, target)
    except OSError as e:
        raise RuntimeError(
            f"cannot download {name} (no network egress?) — place the "
            f"checkpoint at {target} or pass a local path"
        ) from e
    digest = hashlib.sha256(open(target, "rb").read()).hexdigest()
    if digest != expected:
        raise RuntimeError(f"sha256 mismatch for {target}")
    return target


def load(name_or_path: str, cache_root: str = "~/.cache/leclip") -> Tuple[CLIPConfig, dict]:
    """Load a CLIP checkpoint by zoo name or local path → (config, params)."""
    path = name_or_path
    if not os.path.exists(path):
        if name_or_path not in MODEL_URLS:
            raise FileNotFoundError(
                f"{name_or_path!r} is neither a file nor one of {available_models}"
            )
        path = download(name_or_path, cache_root)
    return load_clip_weights(path)
