"""Device-mesh helpers on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from leclip_tpu.parallel.mesh import (
    data_mesh,
    pad_to_multiple,
    prefetch_sharded,
    replicate,
    shard_along,
    shard_batch,
)


def test_mesh_shape():
    mesh = data_mesh()
    assert mesh.shape["data"] == 8


def test_shard_batch_layout():
    mesh = data_mesh()
    batch = {"img": np.zeros((16, 77), np.int32), "label": np.zeros((16, 4), np.float32)}
    sb = shard_batch(batch, mesh)
    assert len(sb["img"].sharding.device_set) == 8
    # each device holds 2 rows
    shard = sb["img"].addressable_shards[0]
    assert shard.data.shape == (2, 77)


def test_replicate_passes_static_leaves():
    mesh = data_mesh()
    tree = {"w": np.ones((4, 4), np.float32), "meta": "end", "n": 3}
    out = replicate(tree, mesh)
    assert out["meta"] == "end" and out["n"] == 3
    assert len(out["w"].sharding.device_set) == 8
    assert out["w"].addressable_shards[0].data.shape == (4, 4)  # full copy


def test_shard_along_rows():
    mesh = data_mesh()
    bank = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    out = shard_along({"bank": bank}, mesh)["bank"]
    assert out.addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(out), bank)


def test_pad_to_multiple_wraps():
    arr = np.arange(10)
    padded, n = pad_to_multiple(arr, 8)
    assert n == 10 and len(padded) == 16
    np.testing.assert_array_equal(padded[10:], arr[:6])


def test_sharded_computation_reduces_correctly():
    """A jitted mean over a sharded batch equals the host mean (psum path)."""
    mesh = data_mesh()
    x = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    sx = shard_batch({"x": x}, mesh)["x"]
    got = float(jax.jit(lambda a: a.mean())(sx))
    np.testing.assert_allclose(got, x.mean(), rtol=1e-6)


def test_prefetch_sharded_matches_inline():
    """The prefetch thread must yield the same device batches, in order,
    with the same sharding as the inline shard_batch loop — for every depth
    including the depth<=0 inline fallback."""
    mesh = data_mesh()
    rng = np.random.default_rng(1)
    batches = [
        {"img": rng.integers(0, 100, (16, 7), dtype=np.int32),
         "label": rng.normal(size=(16, 4)).astype(np.float32)}
        for _ in range(5)
    ]
    want = [shard_batch(b, mesh) for b in batches]
    for depth in (0, 1, 3):
        got = list(prefetch_sharded(iter(batches), mesh, depth=depth))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g["img"].sharding == w["img"].sharding
            np.testing.assert_array_equal(np.asarray(g["img"]), np.asarray(w["img"]))
            np.testing.assert_array_equal(np.asarray(g["label"]), np.asarray(w["label"]))


def test_prefetch_sharded_propagates_producer_error():
    """An exception inside the batch iterator must surface in the consumer,
    not die silently in the thread."""
    mesh = data_mesh()

    def bad_batches():
        yield {"x": np.zeros((8, 2), np.float32)}
        raise RuntimeError("boom in producer")

    import pytest

    with pytest.raises(RuntimeError, match="boom in producer"):
        list(prefetch_sharded(bad_batches(), mesh, depth=2))


def test_prefetch_sharded_reaps_thread_on_abandonment():
    """Breaking out of the consumer (NaN guard path) must not leave the
    producer thread blocked on a full queue."""
    import threading

    mesh = data_mesh()
    n_before = threading.active_count()

    def many_batches():
        for _ in range(100):
            yield {"x": np.zeros((8, 2), np.float32)}

    it = prefetch_sharded(many_batches(), mesh, depth=1)
    next(it)
    it.close()  # abandon mid-epoch — the generator's finally reaps the thread
    # the producer must exit promptly (no lingering batch-prefetch thread)
    deadline = 50
    while threading.active_count() > n_before and deadline:
        import time

        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= n_before


def test_process_local_data_path_equivalent():
    """The multi-host branch of shard_batch (make_array_from_process_local_data)
    builds the identical global sharded array as device_put on one process —
    the single-process equivalence contract for the multi-host data path
    (VERDICT r1 next-round item 7 / STATUS r1 gap 6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = data_mesh()
    x = np.random.default_rng(1).normal(size=(16, 8)).astype(np.float32)
    sharding = NamedSharding(mesh, P("data"))
    via_put = jax.device_put(x, sharding)
    via_local = jax.make_array_from_process_local_data(sharding, x)
    assert via_local.sharding == via_put.sharding
    np.testing.assert_array_equal(np.asarray(via_local), np.asarray(via_put))
    assert via_local.addressable_shards[0].data.shape == (2, 8)


def test_retrieval_augment_sharded_matches_replicated():
    """Ring-kNN over a row-sharded bank must reproduce the replicated
    retrieval exactly on CPU (per-shard search is exact there): same merged
    features, same descending fp32 top-k scores. VERDICT r2 item 6."""
    from leclip_tpu.models.dense_clip import retrieval_augment
    from leclip_tpu.parallel.retrieval import retrieval_augment_sharded

    rng = np.random.default_rng(0)
    E, N, B, K = 32, 160, 16, 5
    gf = rng.normal(size=(B, E)).astype(np.float32)
    gf /= np.linalg.norm(gf, axis=-1, keepdims=True)
    bank = rng.normal(size=(N, E)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)

    mesh = data_mesh()
    gf_d = shard_batch({"x": gf}, mesh)["x"]
    bank_d = shard_along(jnp.asarray(bank), mesh)
    aug_s, scores_s = retrieval_augment_sharded(gf_d, bank_d, K, mesh)
    aug_r, scores_r = retrieval_augment(jnp.asarray(gf), jnp.asarray(bank), K,
                                        exact=True)
    np.testing.assert_allclose(np.asarray(aug_s), np.asarray(aug_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_r),
                               rtol=1e-5, atol=1e-6)
    sa = np.asarray(scores_s)
    assert (np.diff(sa, axis=-1) <= 1e-7).all()

    # non-divisible bank: zero-padded rows must be masked out of the search
    # BY INDEX, so the padded sharded run still equals the replicated run on
    # the ORIGINAL rows (wrap-padding would let a duplicate occupy two k
    # slots). Rows are deliberately UNNORMALISED (some scaled to norm 0.3):
    # a norm-based pad heuristic would silently drop them.
    from leclip_tpu.parallel.mesh import pad_to_multiple

    odd = bank[:67].copy()
    odd[10:20] *= 0.3
    padded, n0 = pad_to_multiple(odd, mesh.shape["data"], mode="zero")
    assert n0 == 67 and padded.shape[0] == 72
    aug_s2, scores_s2 = retrieval_augment_sharded(
        gf_d, shard_along(jnp.asarray(padded), mesh), K, mesh, n_valid=n0
    )
    aug_r2, scores_r2 = retrieval_augment(jnp.asarray(gf), jnp.asarray(odd), K,
                                          exact=True)
    np.testing.assert_allclose(np.asarray(aug_s2), np.asarray(aug_r2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scores_s2), np.asarray(scores_r2),
                               rtol=1e-5, atol=1e-6)


def test_tta_engine_sharded_bank_matches_replicated():
    """TTAEngine(shard_bank=True): bank rows live once across the mesh (1/8
    per chip) and the fused competition scores match the single-device
    replicated-bank engine."""
    from leclip_tpu.inference.tta import TTAEngine, build_model_spec
    from leclip_tpu.models.clip import CLIPConfig, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, transformer_width=64,
        transformer_heads=2, transformer_layers=2,
    )
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    trainable, constants = build_prompt_learner(
        jax.random.PRNGKey(1), clip_params, ["dog", "cat", "person", "pizza"],
        n_ctx=4,
    )
    spec = build_model_spec(clip_params, tiny, trainable, constants, DenseFlags())
    rng = np.random.default_rng(2)
    # 83 rows: NOT divisible by the 8-device mesh — the engine zero-pads to
    # 88 and the sharded search masks the pad rows
    bank = jnp.asarray(rng.normal(size=(83, 32)).astype(np.float32))
    images = [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
              for _ in range(3)]
    mesh = data_mesh()

    plain = TTAEngine(clip_params, tiny, {"best": spec}, scales=(2,),
                      crop_size=64, caption_bank=bank, topk=5)
    sharded = TTAEngine(clip_params, tiny, {"best": spec}, scales=(2,),
                        crop_size=64, caption_bank=bank, topk=5,
                        mesh=mesh, shard_bank=True)
    # the bank really is row-sharded: each device holds 11 of the 88 padded
    shard0 = sharded.caption_bank.addressable_shards[0]
    assert shard0.data.shape == (11, 32)

    f_plain = plain.run_batch_fused(images)
    f_shard = sharded.run_batch_fused(images)
    np.testing.assert_allclose(f_shard, f_plain, rtol=2e-4, atol=2e-4)
