"""Multi-host (multi-process) runtime helpers.

The reference's multi-GPU story is one process per GPU with NCCL
(`train_caption.py:176-179` init_process_group + rank-gated checkpointing
`Caption_distill_double.py:576-587` and printing `dassl/engine/trainer.py:656`).
The TPU-native analogue is one process per HOST, each owning its local chips,
joined into one global runtime by ``jax.distributed.initialize``; jit'd
programs then run SPMD over the global mesh and XLA routes collectives over
ICI/DCN.

This module is the thin seam the rest of the framework uses:

* :func:`initialize` — join the global runtime (no-op when single-process).
* :func:`is_primary` — the rank-0 gate for checkpoint writes, metric files
  and console logging (every process computes identical replicated state, so
  exactly one should persist it — on a shared filesystem concurrent writers
  would race on the same paths).
* :func:`barrier` — a named sync point (e.g. "checkpoint written" before
  readers proceed).

Data loading composes with :func:`leclip_tpu.parallel.mesh.shard_batch`:
each process feeds its contiguous ``CaptionBatcher`` shard
(``shard_index=process_index``) and ``make_array_from_process_local_data``
assembles the globally-sharded array.

Tested for real (two OS processes, gloo collectives, 2 CPU devices each) in
``tests/test_multihost.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-process JAX runtime.

    On Cloud TPU pods all arguments are auto-detected from the environment
    (call with no arguments, once per process, before any jax computation).
    Elsewhere pass ``coordinator_address='host:port'``, ``num_processes`` and
    ``process_id`` explicitly. Calling with ``num_processes in (None, 1)``
    outside a pod environment is a no-op so single-host entry points can call
    it unconditionally.
    """
    if num_processes == 1:
        return
    if coordinator_address is None and num_processes is None and process_id is None:
        # Auto-detect (TPU pod metadata / SLURM / Open MPI). Outside any such
        # environment this raises — that absence is normal and means
        # single-process. But when cluster markers ARE present, a failure is
        # a real pod-join error (coordinator unreachable, bad metadata) and
        # MUST propagate: falling back silently would leave every host with
        # process_count()==1 — all of them "primary", all training on the
        # full dataset, concurrently clobbering the same checkpoint paths.
        try:
            jax.distributed.initialize()
        except Exception:
            if _cluster_env_detected():
                raise
            return
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def _cluster_env_detected() -> bool:
    """True only on evidence of a MULTI-process environment. Presence alone
    is not enough: single-chip tunnels set TPU_WORKER_HOSTNAMES=localhost,
    and a 1-task SLURM allocation is still single-process."""
    import os

    env = os.environ
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS") or env.get("JAX_COORDINATOR_ADDRESS"):
        return True
    for var in ("OMPI_COMM_WORLD_SIZE", "SLURM_NTASKS"):
        try:
            if int(env.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def is_primary() -> bool:
    """True on the process that should write checkpoints/metrics/logs
    (the reference's ``rank == 0`` gate)."""
    return jax.process_index() == 0


def barrier(name: str = "leclip_barrier") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
