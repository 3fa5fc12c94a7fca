"""One-off: per-stage timing of the fused TTA program at the bench geometry.

Builds the bench.py engine (ViT-B/16, 6 members, 220k bank, int8 default)
and chains four nested programs — crop stage alone, + encoder, + retrieval,
and the engine's real fused program — so stage costs fall out by
differencing. Chained-timing methodology per scripts/_bench.py (this
tunnel's block_until_ready does not wait; only fetches do).

PROBE_PREC=bf16 and PROBE_BATCH=N override the bench defaults.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench import measure


def main():
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.inference.tta import TTAEngine, _make_batch_crop_fn
    from leclip_tpu.models.dense_clip import (
        encode_image_features,
        retrieval_augment,
    )

    precision = os.environ.get("PROBE_PREC", "int8")
    batch = int(os.environ.get("PROBE_BATCH", "16"))
    preset = os.environ.get("PROBE_PRESET", "ViT-B/16")
    from _synth import synth_engine_inputs

    clip_cfg, clip_params, specs, bank = synth_engine_inputs(preset)
    engine = TTAEngine(
        clip_params, clip_cfg, specs, scales=(2, 3, 4), caption_bank=bank,
        compute_dtype=jnp.bfloat16, precision=precision,
    )
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
              for _ in range(batch)]
    staged = engine.stage_batch_fused(images)
    bucket, n, b, shared, im_d, bx_d, ct_d, _ = staged
    print(f"bucket={bucket} n_boxes={n} batch={b} shared={shared} "
          f"precision={precision}", flush=True)
    imgs_f = jax.jit(lambda u: u.astype(jnp.bfloat16) / 255.0)(im_d)
    q8 = engine._q8
    crop_fn = _make_batch_crop_fn(
        engine.resize_impl, engine.antialias, engine.crop_size, shared
    )
    flags0 = next(iter(engine.models.values())).flags
    use_fused = engine._fused

    measure("crop stage (pyramid extract+resize)",
            lambda im, bx, c: crop_fn(im, bx, c), (imgs_f, bx_d, ct_d), n=2)

    def enc(im, bx, c, params, q):
        crops = crop_fn(im, bx, c)
        flat = crops.reshape((-1,) + crops.shape[2:])
        f = encode_image_features(params, clip_cfg, flat, flags0, q8=q,
                                  fused=use_fused)
        return f.global_feat.astype(jnp.float32).mean() + jnp.asarray(
            f.spatial_feats, jnp.float32).mean()

    measure("crop + encoder", enc, (imgs_f, bx_d, ct_d, clip_params, q8), n=2)

    def enc_ret(im, bx, c, params, q, bk):
        crops = crop_fn(im, bx, c)
        flat = crops.reshape((-1,) + crops.shape[2:])
        f = encode_image_features(params, clip_cfg, flat, flags0, q8=q,
                                  fused=use_fused)
        aug, scores = retrieval_augment(f.global_feat, bk, topk=engine.topk)
        return (aug.astype(jnp.float32).mean() + scores.mean()
                + jnp.asarray(f.spatial_feats, jnp.float32).mean())

    measure("crop + encoder + retrieval", enc_ret,
            (imgs_f, bx_d, ct_d, clip_params, q8, bank), n=2)

    fused_prog = engine._fused_fn(bucket, n, b, shared=shared)
    groups = engine._model_groups()
    trs = tuple(g[3] for g in groups)
    tfs = tuple(g[4] for g in groups)
    n_cls = len(COCO_OBJECT_CATEGORIES)
    cooc = jnp.zeros((n_cls, n_cls), jnp.float32)

    def full(im_u8, params, bk, bx, c, t1, t2, r):
        return fused_prog(params, bk, im_u8, bx, c, t1, t2, r, cooc, q8=q8)

    measure("FULL fused program (real bench path)", full,
            (im_d, clip_params, bank, bx_d, ct_d, trs, tfs,
             engine._fused_routing), n=2)


if __name__ == "__main__":
    main()
