"""Serving-path throughput on the real chip: N concurrent clients firing
single-image requests through ScoringService's micro-batcher vs the staged
chip bench (bench.py). Quantifies what the micro-batching recovers and what
the synchronous (non-pipelined) dispatch costs.

Usage: [PROBE_PREC=int8] [PROBE_BATCH=16] [PROBE_CLIENTS=64] python scripts/probe_serve.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/leclip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import jax.numpy as jnp

    from _synth import synth_engine_inputs
    from leclip_tpu.cli.serve import ScoringService
    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.inference.tta import TTAEngine

    precision = os.environ.get("PROBE_PREC", "int8")
    batch = int(os.environ.get("PROBE_BATCH", "16"))
    n_clients = int(os.environ.get("PROBE_CLIENTS", "64"))
    per_client = int(os.environ.get("PROBE_REQS", "4"))

    clip_cfg, clip_params, specs, bank = synth_engine_inputs(
        log=lambda m: print(m, file=sys.stderr, flush=True))
    engine = TTAEngine(
        clip_params, clip_cfg, specs, scales=(2, 3, 4), caption_bank=bank,
        compute_dtype=jnp.bfloat16, precision=precision,
    )
    crops_per_image = 1 + engine.n_blocks
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    svc = ScoringService(engine, COCO_OBJECT_CATEGORIES,
                         batch_size=batch, max_wait_ms=20.0)
    # warmup compile
    svc.score([img])

    def client():
        for _ in range(per_client):
            svc.score([img], timeout=600)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total = n_clients * per_client
    print(f"{total} single-image requests, {n_clients} concurrent clients, "
          f"batch {batch}, {precision}:")
    print(f"  {total / dt:8.2f} images/s sustained "
          f"= {total * crops_per_image / dt:8.1f} crop-forwards/s")
    svc.close()


if __name__ == "__main__":
    main()
