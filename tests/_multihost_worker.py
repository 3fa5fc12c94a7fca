"""Subprocess worker for tests/test_multihost.py — one REAL OS process of a
two-process JAX runtime (gloo collectives, 2 virtual CPU devices each).

Runs the actual CaptionDistillTrainer over the 4-device global mesh:
process-sharded batch loading (CaptionBatcher shard → shard_batch →
make_array_from_process_local_data), SPMD train_step with XLA-inserted
gradient all-reduce, rank-0-gated checkpointing. Dumps per-process artifacts
for the parent test to compare.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: no jax.config side effects at import time — the parent test imports
# this module for synth() with its own (already-initialised) backend; the
# worker configuration happens inside main() in the fresh subprocess.

import numpy as np  # noqa: E402


def synth(n, seed, classnames):
    rng = np.random.default_rng(seed)
    from leclip_tpu.data.tokenizer import tokenize

    texts, labels = [], []
    for _ in range(n):
        present = rng.random(len(classnames)) < 0.4
        present[rng.integers(len(classnames))] = True
        names = [c for c, p in zip(classnames, present) if p]
        texts.append("a photo of a " + " and a ".join(names) + ".")
        labels.append(present.astype(np.int8))
    return np.asarray(tokenize(texts)), np.stack(labels)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_default_matmul_precision", "float32")

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    outdir = sys.argv[4]

    from leclip_tpu.parallel.multihost import barrier, initialize, is_primary

    initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid
    assert jax.local_device_count() == 2 and jax.device_count() == 2 * nproc
    assert is_primary() == (pid == 0)

    from leclip_tpu.data.datasets import CaptionDataset
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.trainer import CaptionDistillTrainer
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.parallel.mesh import shard_batch

    classnames = ["dog", "cat", "pizza", "bicycle"]
    tiny = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    tokens, labels = synth(64, seed=0, classnames=classnames)  # identical on every process
    ds = CaptionDataset(tokens, labels, [], classnames)
    cfg = setup_config(
        opts=[
            "OPTIM.MAX_EPOCH", "2", "OPTIM.LR", "0.05", "OPTIM.WARMUP_EPOCH", "-1",
            "DATALOADER.BATCH_SIZE_TRAIN", "16",  # per-process → global 32
            "TRAINER.N_CTX", "4", "TRAIN.PRINT_FREQ", "1000",
            "TRAIN.CHECKPOINT_FREQ", "1",
        ],
        OUTPUT_DIR=os.path.join(outdir, f"proc{pid}"),
        SEED=3,
    )
    tr = CaptionDistillTrainer(cfg, clip_params, tiny, dataset=ds)
    assert tr.batcher.num_shards == nproc

    # one explicit step first, dumping the local batch so the parent can run
    # a bit-comparable single-process control on the assembled global batch
    first = next(iter(tr.batcher.epoch(0)))
    sb = shard_batch(first, tr.mesh)
    # train_step donates its state argument — probe from a copy so tr.train()
    # below still owns live buffers
    state_copy = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, tr.state)
    state1, _ = tr.train_step(state_copy, sb["img"], sb["label"])
    params_step1 = jax.tree.map(np.asarray, state1.params)

    # then the real loop (checkpoints gated on rank 0)
    final_state = tr.train(resume=False)
    params_final = jax.tree.map(np.asarray, final_state.params)

    with open(os.path.join(outdir, f"result_{pid}.pkl"), "wb") as f:
        pickle.dump(
            {
                "local_batch": {k: np.asarray(v) for k, v in first.items()},
                "params_step1": params_step1,
                "params_final": params_final,
            },
            f,
        )
    barrier("done")
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
