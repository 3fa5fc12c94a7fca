"""Subprocess worker for the multi-process INFERENCE and RESUME tests
(tests/test_multihost.py) — one real OS process of a two-process JAX runtime
(gloo collectives, 2 virtual CPU devices each, one 4-device global mesh).

Modes:
  infer  — drive the fused TTAEngine (incl. shard_bank ring-kNN retrieval)
           over the process-spanning mesh: every process feeds the SAME
           image list, put_global assembles the sharded batch, fetch_global
           allgathers the scores, so both processes return the full result.
  resume — train with rank-0 checkpointing into a SHARED output dir, then
           build a FRESH trainer that resumes from the checkpoint on both
           processes and finishes the run (the reference's resume contract,
           dassl/engine/trainer.py resume_model_if_exist, under DDP).

Usage: python _multihost_infer_worker.py <mode> <pid> <nproc> <port> <outdir>
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CLASSNAMES = ["dog", "cat", "pizza", "bicycle"]


def make_images(seed=0, uniform=True):
    rng = np.random.default_rng(seed)
    sizes = [(96, 128)] * 8 if uniform else [(96, 128), (80, 100)] * 4
    return [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            for h, w in sizes]


def build_engine(mesh=None, shard_bank=False):
    import jax
    import jax.numpy as jnp

    from leclip_tpu.inference.tta import TTAEngine, build_model_spec
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner

    cfg = PRESETS["ViT-TEST"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    specs = {}
    for i, name in enumerate(["best", "ema"]):
        tr, cs = build_prompt_learner(jax.random.PRNGKey(1 + i), params,
                                     CLASSNAMES, n_ctx=4)
        specs[name] = build_model_spec(params, cfg, tr, cs,
                                       DenseFlags(use_evidence=(i == 0)))
    rng = np.random.default_rng(7)
    bank = rng.normal(size=(37, cfg.embed_dim)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    return TTAEngine(
        params, cfg, specs, scales=(2,), crop_size=cfg.image_resolution,
        caption_bank=jnp.asarray(bank), topk=5, mesh=mesh,
        shard_bank=shard_bank,
    )


def run_infer(outdir, pid):
    import jax

    from leclip_tpu.parallel.mesh import data_mesh

    mesh = data_mesh()  # all 4 global devices
    engine = build_engine(mesh=mesh, shard_bank=True)
    uniform = make_images(uniform=True)
    mixed = make_images(uniform=False)
    out_uniform = engine.run_batch_fused(uniform)
    out_mixed = engine.run_batch_fused(mixed)
    # partial batch: 5 images pad to the 4-device mesh multiple (8) and the
    # sharded result is sliced back to 5 before the cross-process fetch
    partial = make_images(uniform=True)[:5]
    out_partial = engine.run_batch_fused(partial)
    piped = list(engine.run_batches_fused([uniform, mixed], depth=2))
    with open(os.path.join(outdir, f"infer_{pid}.pkl"), "wb") as f:
        pickle.dump({"uniform": out_uniform, "mixed": out_mixed,
                     "partial": out_partial,
                     "piped": [np.asarray(p) for p in piped]}, f)
    print(f"infer worker {pid} ok", flush=True)


def run_resume(outdir, pid):
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _multihost_worker import synth

    from leclip_tpu.data.datasets import CaptionDataset
    from leclip_tpu.engine.checkpoint import latest_checkpoint
    from leclip_tpu.engine.config import setup_config
    from leclip_tpu.engine.trainer import CaptionDistillTrainer
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.parallel.multihost import barrier

    shared = os.path.join(outdir, "shared_out")  # one dir, like a pod's NFS
    tiny = PRESETS["RN-TEST"]
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    tokens, labels = synth(64, seed=0, classnames=CLASSNAMES)
    ds = CaptionDataset(tokens, labels, [], CLASSNAMES)

    def make_cfg(max_epoch):
        return setup_config(
            opts=[
                "OPTIM.MAX_EPOCH", str(max_epoch), "OPTIM.LR", "0.05",
                "OPTIM.WARMUP_EPOCH", "-1",
                "DATALOADER.BATCH_SIZE_TRAIN", "16",
                "TRAINER.N_CTX", "4", "TRAIN.PRINT_FREQ", "1000",
                "TRAIN.CHECKPOINT_FREQ", "1",
            ],
            OUTPUT_DIR=shared, RESUME=shared, SEED=3,
        )

    # phase 1: a 2-epoch run that checkpoints every epoch (rank 0 writes)
    tr1 = CaptionDistillTrainer(make_cfg(2), clip_params, tiny, dataset=ds)
    tr1.train(resume=False)
    barrier("phase1")
    ck = latest_checkpoint(shared, tr1.model_name)
    assert ck and ck.endswith("-1"), ck  # epochs are 0-indexed: 2-epoch run → ckpt-0, ckpt-1

    # phase 2: a FRESH trainer resumes from the shared checkpoint on BOTH
    # processes and continues to epoch 4
    from leclip_tpu.engine.checkpoint import load_checkpoint

    resumed = load_checkpoint(ck)["params"]  # what resume must start from
    tr2 = CaptionDistillTrainer(make_cfg(4), clip_params, tiny, dataset=ds)
    final_state = tr2.train(resume=True)
    barrier("phase2")
    with open(os.path.join(outdir, f"resume_{pid}.pkl"), "wb") as f:
        pickle.dump({
            "resumed_params": resumed,
            "final_params": jax.tree.map(np.asarray, final_state.params),
        }, f)
    print(f"resume worker {pid} ok", flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_default_matmul_precision", "float32")

    mode, pid, nproc, port, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])

    from leclip_tpu.parallel.multihost import initialize

    initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.device_count() == 2 * nproc

    if mode == "infer":
        run_infer(outdir, pid)
    elif mode == "resume":
        run_resume(outdir, pid)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
