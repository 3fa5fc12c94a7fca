"""Row-sharded caption-bank retrieval — ring-allgather top-k over the mesh.

The replicated retrieval path (models/dense_clip.py retrieval_augment) keeps
a full copy of the [N, E] caption feature bank on every chip (~450 MB at
fp32/1024-d for the 220k-caption competition bank, and growing linearly for
larger corpora). This module shards the bank's ROWS across the mesh's data
axis and runs the classic ring-kNN instead: each device scores its local
query rows against one bank shard at a time while the shards rotate around
the ring (``ppermute``), keeping a running top-k of (score, feature). After
``n_devices`` steps every query has seen every bank row; the selected k
features are rescored exactly in fp32 and sorted, matching the replicated
path's contract bit-for-bit when the per-shard search is exact.

Communication per step is one bank shard (N/d × E) over ICI — the queries
never move, and no [B, N] similarity matrix is ever materialised globally.
Per-chip bank memory drops d×.

Ref anchor: generate_caption_text_features.py:77-97 (the bank artifact) and
Caption_distill_double.py:444-448 (top-10 retrieval merge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def retrieval_augment_sharded(
    global_feat: jnp.ndarray,   # [B, E] L2-normalised queries (row-sharded ok)
    bank_shards: jnp.ndarray,   # [N, E] bank, rows sharded along `axis`
    topk: int,
    mesh: Mesh,
    axis: str = "data",
    n_valid: int = None,
):
    """Sharded-bank version of dense_clip.retrieval_augment: returns
    (augmented_feat [B, E], topk_scores [B, topk] fp32 descending).

    Queries are consumed under their existing sharding (batch rows on the
    same axis); each device's ring pass covers the full bank. The bf16
    search / exact-fp32-rescore split matches the replicated big-bank path.

    ``n_valid``: number of REAL bank rows when the bank was padded to divide
    the mesh (mesh.pad_to_multiple). Pad rows are excluded by GLOBAL ROW
    INDEX (each chunk's origin shard is tracked around the ring), which is
    exact for any bank content — including unnormalised user banks, where a
    norm-based heuristic would silently drop small-magnitude real rows.
    """
    from jax import shard_map

    n_dev = int(mesh.shape[axis])
    shard_rows = bank_shards.shape[0] // n_dev
    if bank_shards.shape[0] % n_dev:
        raise ValueError(
            f"bank rows ({bank_shards.shape[0]}) must divide the mesh axis "
            f"({n_dev}); pad with parallel.mesh.pad_to_multiple first"
        )
    if shard_rows < topk:
        raise ValueError(
            f"bank shard ({shard_rows} rows) smaller than topk ({topk})"
        )
    if n_valid is None:
        n_valid = bank_shards.shape[0]
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def local(gf, bank):  # gf [B/d, E], bank [N/d, E]
        def search(chunk, owner):
            sims = jnp.einsum(
                "be,ne->bn", gf, chunk,
                preferred_element_type=jnp.bfloat16 if shard_rows > 4096 else jnp.float32,
            )
            # pad rows (global index >= n_valid) never retrieve; only the
            # last shard can contain them
            row0 = owner * shard_rows
            valid = row0 + jnp.arange(shard_rows, dtype=jnp.int32) < n_valid
            sims = jnp.where(valid[None, :], sims, jnp.asarray(-1e9, sims.dtype))
            if shard_rows > 4096:
                s, i = jax.lax.approx_max_k(sims, topk, recall_target=0.95)
            else:
                s, i = jax.lax.top_k(sims, topk)
            return s.astype(jnp.float32), chunk[i]

        me = jax.lax.axis_index(axis).astype(jnp.int32)
        best_s, best_f = search(bank, me)

        def step(j, carry):
            bs, bf, chunk = carry
            chunk = jax.lax.ppermute(chunk, axis, perm=perm)
            # after j+1 rotations this device holds the shard owned by
            # (me - (j+1)) mod n_dev
            owner = jnp.mod(me - (j + 1), n_dev)
            s, f = search(chunk, owner)
            cat_s = jnp.concatenate([bs, s], axis=-1)
            cat_f = jnp.concatenate([bf, f], axis=1)
            s2, i2 = jax.lax.top_k(cat_s, topk)
            f2 = jnp.take_along_axis(cat_f, i2[..., None], axis=1)
            return s2, f2, chunk

        best_s, best_f, _ = jax.lax.fori_loop(
            0, n_dev - 1, step, (best_s, best_f, bank)
        )
        # exact fp32 rescore of the selected k, sorted descending (the
        # replicated path's contract)
        scores = jnp.einsum(
            "be,bke->bk", gf.astype(jnp.float32), best_f.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        scores = -jnp.sort(-scores, axis=-1)
        merged = (gf + best_f.mean(axis=1).astype(gf.dtype)) / 2.0
        return merged, scores

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )(global_feat, bank_shards)


def make_sharded_retriever(topk: int, mesh: Mesh, axis: str = "data",
                           n_valid: int = None):
    """(global_feat, bank) → (aug, scores) closure with the replicated-path
    call signature, for drop-in use inside the TTA engine's jitted programs.
    ``n_valid``: real (pre-padding) bank row count."""
    return functools.partial(
        retrieval_augment_sharded, topk=topk, mesh=mesh, axis=axis,
        n_valid=n_valid,
    )
