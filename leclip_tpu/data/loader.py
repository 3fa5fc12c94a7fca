"""Host-side data loading: epoch shuffling, static-shape batching, per-host /
per-device sharding, and threaded image decode for eval.

Replaces the reference's DataLoader + DistributedSampler machinery (ref:
Dassl dassl/data/data_manager.py, dassl/data/samplers.py:181-221) with the
JAX-native pattern: the host streams numpy batches; sharding over the device
mesh happens via jax.device_put with a NamedSharding — gradients all-reduce
through XLA collectives, not a sampler wrapper.
"""

from __future__ import annotations

import concurrent.futures
from typing import Iterator, List, Sequence, Tuple

import numpy as np


class CaptionBatcher:
    """Shuffled, drop-remainder-free batches of (tokens, labels) with
    deterministic per-epoch permutations (set_epoch analogue). Batches are
    padded up to the full batch size by wrapping around, so every step has a
    static shape — XLA never recompiles."""

    def __init__(
        self,
        tokens: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        assert len(tokens) == len(labels)
        self.tokens = tokens
        self.labels = labels
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.shard_index = shard_index
        self.num_shards = num_shards

    def steps_per_epoch(self) -> int:
        per_shard = len(self.tokens) // self.num_shards
        return max(1, per_shard // self.batch_size)

    def epoch(self, epoch: int) -> Iterator[dict]:
        n = len(self.tokens)
        if self.shuffle:
            order = np.random.default_rng(self.seed + epoch).permutation(n)
        else:
            order = np.arange(n)
        # contiguous shard of the permuted order (reference
        # CustomDistributedSamplerWrapper semantics, samplers.py:181-195)
        per_shard = n // self.num_shards
        order = order[self.shard_index * per_shard : (self.shard_index + 1) * per_shard]
        steps = self.steps_per_epoch()
        bs = self.batch_size
        for s in range(steps):
            idx = order[s * bs : (s + 1) * bs]
            if len(idx) < bs:
                idx = np.concatenate([idx, order[: bs - len(idx)]])
            yield {
                "img": self.tokens[idx].astype(np.int32),
                "label": self.labels[idx].astype(np.float32),
            }


def load_image(path: str) -> np.ndarray:
    """Decode one image to uint8 RGB [H, W, 3] (PIL; retry once on IO errors,
    mirroring the reference's read_image retry, dassl/utils/tools.py:111-133)."""
    from PIL import Image

    for attempt in range(2):
        try:
            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"), np.uint8)
        except OSError:
            if attempt:
                raise
    raise OSError(f"unreadable image {path}")


class PairBatcher:
    """(image, caption) pair loader for dual-encoder fine-tuning (BASELINE
    config 4) — the reference equivalent is DatasetWrapper + DataManager
    (ref dassl/data/data_manager.py:215-285), rebuilt TPU-first: the host
    decodes JPEGs (native libjpeg runtime via ImageBatcher machinery) and
    bucket-pads them; augmentation (content-aware RandomResizedCrop / cutout
    / flip / CLIP-normalize) runs on device inside the train step
    (ops.preprocess.preprocess_train_batch).

    Yields {'image_u8': [B, bh, bw, 3] uint8, 'content': [B, 2] int32,
    'tokens': [B, 77] int32} with deterministic per-epoch shuffling and
    wrap-around padding so every step has a static shape per bucket."""

    def __init__(
        self,
        image_paths: Sequence[str],
        captions: Sequence[str] = None,
        tokens: np.ndarray = None,
        batch_size: int = 64,
        seed: int = 0,
        workers: int = 8,
        bucket: Tuple[int, int] = (512, 512),
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        assert (captions is None) != (tokens is None), "pass captions OR tokens"
        self.paths = list(image_paths)
        self.shard_index = shard_index
        self.num_shards = num_shards
        if tokens is None:
            from .tokenizer import tokenize

            tokens = np.asarray(tokenize(list(captions), truncate=True))
        assert len(tokens) == len(self.paths)
        self.tokens = np.asarray(tokens, np.int32)
        self.batch_size = batch_size
        self.seed = seed
        self.workers = workers
        self.bucket = bucket
        self._decode = None
        try:
            from ..runtime.jpeg import decode_batch, native_available

            if native_available():
                self._decode = decode_batch
        except Exception:
            pass

    def steps_per_epoch(self) -> int:
        return max(1, len(self.paths) // self.num_shards // self.batch_size)

    def _decode_chunk(self, paths: List[str]) -> List[np.ndarray]:
        if self._decode is not None:
            return self._decode(paths, threads=self.workers)
        with concurrent.futures.ThreadPoolExecutor(self.workers) as pool:
            return list(pool.map(load_image, paths))

    def epoch(self, epoch: int) -> Iterator[dict]:
        from ..inference.tta import pad_to_bucket

        n = len(self.paths)
        # identical permutation on every process, then a contiguous per-shard
        # slice (CustomDistributedSamplerWrapper semantics, ref
        # dassl/data/samplers.py:181-195) — each process loads only its shard
        order = np.random.default_rng(self.seed + epoch).permutation(n)
        if self.num_shards > 1:
            per = n // self.num_shards
            order = order[self.shard_index * per : (self.shard_index + 1) * per]
        bs = self.batch_size
        for s in range(self.steps_per_epoch()):
            # modular indexing wraps the tail AND datasets smaller than one
            # batch, so every step has the full static batch shape
            idx = order[np.arange(s * bs, (s + 1) * bs) % len(order)]
            imgs = self._decode_chunk([self.paths[i] for i in idx])
            padded, content = [], []
            for im in imgs:
                p, hw = pad_to_bucket(im, self.bucket)
                padded.append(p)
                content.append(hw)
            yield {
                "image_u8": np.stack(padded),
                "content": np.asarray(content, np.int32),
                "tokens": self.tokens[idx],
            }


def image_size(path: str) -> Tuple[int, int]:
    """(h, w) from the image header only — no pixel decode."""
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    return h, w


class ImageBatcher:
    """JPEG decode → fixed-size batches of raw uint8 images plus their paths
    (the TTA engine computes crop boxes from the decoded sizes).

    Uses the native multithreaded libjpeg runtime when available
    (leclip_tpu/runtime/decode.cpp — PIL-exact output), falling back to a
    PIL thread pool.

    ``sort_by_bucket``: pre-read image headers and order batches by the shape
    bucket ``bucket_fn(h, w)`` maps them to. One oversized image then no
    longer drags its whole batch to the largest bucket's (4×+ slower, freshly
    compiled) program, and the compile-variant count is bounded by the number
    of occupied buckets. The original input order is recorded in ``order``
    (``paths[i] == original[order[i]]``) so callers can restore it with
    ``inverse_order``."""

    def __init__(self, paths: Sequence[str], batch_size: int, workers: int = 8,
                 native: bool = True, sort_by_bucket: bool = False,
                 bucket_fn=None):
        paths = list(paths)
        self.order = np.arange(len(paths))
        if sort_by_bucket and paths:
            if bucket_fn is None:
                from ..inference.tta import pick_bucket as bucket_fn
            with concurrent.futures.ThreadPoolExecutor(workers) as pool:
                sizes = list(pool.map(image_size, paths))
            keys = []
            for h, w in sizes:
                bh, bw = bucket_fn(h, w)
                # secondary sort by exact content size: common sizes (real
                # corpora repeat a handful of camera geometries) then land in
                # uniform batches, keeping the shared-geometry crop-matrix
                # fast path (tta._is_shared) alive in mixed corpora
                keys.append((bh * bw, bh, bw, h, w))
            self.order = np.asarray(
                sorted(range(len(paths)), key=lambda i: keys[i]), np.int64
            )
            paths = [paths[i] for i in self.order]
        self.paths = paths
        self.batch_size = batch_size
        self.workers = workers
        self._native = False
        if native:
            try:
                from ..runtime.jpeg import decode_batch, native_available

                if native_available():
                    self._decode_batch = decode_batch
                    self._native = True
            except Exception:
                pass

    @property
    def inverse_order(self) -> np.ndarray:
        """Permutation restoring original input order: out[inverse_order] has
        row i corresponding to the i-th input path."""
        inv = np.empty_like(self.order)
        inv[self.order] = np.arange(len(self.order))
        return inv

    def __len__(self) -> int:
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[List[np.ndarray], List[str]]]:
        if self._native:
            for start in range(0, len(self.paths), self.batch_size):
                chunk = self.paths[start : start + self.batch_size]
                yield self._decode_batch(chunk, threads=self.workers), chunk
            return
        with concurrent.futures.ThreadPoolExecutor(self.workers) as pool:
            for start in range(0, len(self.paths), self.batch_size):
                chunk = self.paths[start : start + self.batch_size]
                yield list(pool.map(load_image, chunk)), chunk
