"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL layer (ref: train_caption.py:176-179, DDP wrap
Caption_distill_double.py:786-787, CustomDistributedSamplerWrapper
dassl/data/samplers.py:181-195).

Pattern: 1-D ``data`` mesh over all chips; batches sharded along it, the tiny
prompt-learner params replicated. Gradients all-reduce through the psum XLA
inserts when a jitted function reduces a sharded batch into replicated
params — no hand-written collectives."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None, name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (name,))


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "shape")


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch onto the mesh, sharded along the batch dimension.

    Single-process (the common case, incl. the 8-device virtual CPU mesh):
    a plain ``device_put`` with a NamedSharding. Multi-host (a multi-slice /
    multi-process mesh where each process sees only its local devices): each
    process passes its PROCESS-LOCAL slice of the global batch and
    ``jax.make_array_from_process_local_data`` assembles the global sharded
    array — the JAX-native replacement for the reference's per-rank
    DistributedSampler shard (ref dassl/data/samplers.py:181-195). Contract:
    every process must call with the same global shapes, local batch size =
    global // process_count, and data order consistent with
    ``CaptionBatcher(shard_index=process_index, num_shards=process_count)``."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x))
            if _is_array(x) else x,
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding) if _is_array(x) else x, batch)


def prefetch_sharded(batches, mesh: Mesh, depth: int = 2, axis: str = "data"):
    """Iterate host batches, uploading each via ``shard_batch`` from a
    background thread so batch N+1's host→device transfer overlaps batch N's
    on-device compute.

    On a networked TPU every ``device_put`` is a synchronous ~32 ms host RPC
    (STATUS.md environment lessons); paying it inline in the train loop adds
    one full round trip per step — measured 31.6 ms/step on the RN50
    prompt-tuning rehearsal, ~22% of the 144 ms step. The producer thread
    spends that time in network I/O (GIL released), so overlap is real even
    on this 1-CPU host. ``depth <= 0`` falls back to inline upload —
    byte-identical methodology to the plain loop.

    The reference's analogue is torch DataLoader pin_memory+workers feeding
    cudaMemcpyAsync (dassl/data/data_manager.py:95-112); here the decoded
    batch is tiny (tokens + labels) and the TRANSFER is the cost, so one
    upload thread replaces the worker pool."""
    if depth <= 0:
        for b in batches:
            yield shard_batch(b, mesh, axis)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    done = object()
    failure = []

    def producer():
        try:
            for b in batches:
                sb = shard_batch(b, mesh, axis)  # the expensive RPC, off-loop
                while not stop.is_set():
                    try:
                        q.put(sb, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            failure.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(done, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True, name="batch-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                break
            yield item
    finally:
        # Reap the producer whether the epoch completed, the consumer raised
        # (NaN guard), or the generator was abandoned: unblock any pending
        # q.put, then join.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=30.0)
    if failure:
        raise failure[0]


def put_global(x, mesh: Mesh, spec: P):
    """Place one host array onto the mesh under ``spec``.

    Single-process: plain ``device_put``. Multi-process (the mesh spans
    processes): ``device_put`` cannot target non-addressable devices, so the
    global array is assembled via ``jax.make_array_from_callback`` — each
    process feeds its addressable shards from the SAME full host value
    (contract: every process holds the identical array; this is the
    inference-side complement of ``shard_batch``'s local-slice contract)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        xs = np.asarray(x)
        return jax.make_array_from_callback(xs.shape, sharding,
                                            lambda idx: xs[idx])
    return jax.device_put(x, sharding)


def fetch_global(x) -> np.ndarray:
    """Device array → full host numpy, multi-process aware: under one process
    a plain ``np.asarray``; across processes each host can only read its
    addressable shards, so the value is allgathered first."""
    if jax.process_count() > 1 and isinstance(x, jax.Array):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (params, constants, banks).
    Non-array leaves (static metadata like name_lens) pass through."""
    return jax.tree.map(
        lambda x: put_global(x, mesh, P()) if _is_array(x) else x, tree)


def shard_along(tree, mesh: Mesh, axis: str = "data", dim: int = 0):
    """Shard every leaf of a pytree along `dim` (e.g. a caption feature bank
    row-sharded across chips)."""
    def put(x):
        spec = [None] * x.ndim
        spec[dim] = axis
        return put_global(x, mesh, P(*spec))
    return jax.tree.map(put, tree)


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0,
                    mode: str = "wrap"):
    """Pad so an axis divides the mesh size; returns (padded, original_length).

    mode='wrap' repeats leading rows — right for batches, where padded rows'
    outputs are discarded by original_length. mode='zero' appends zero rows —
    right for a retrieval BANK, where a wrapped duplicate could occupy two
    top-k slots (the sharded search masks zero-norm rows instead)."""
    n = array.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return array, n
    if mode == "zero":
        shape = list(array.shape)
        shape[axis] = pad
        take = np.zeros(shape, dtype=array.dtype)
    elif mode == "wrap":
        take = np.take(array, np.arange(pad) % n, axis=axis)
    else:
        raise ValueError(f"mode must be wrap | zero, got {mode!r}")
    return np.concatenate([array, take], axis=axis), n
