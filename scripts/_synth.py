"""THE canonical synthetic competition setup — shared by bench.py,
scripts/rehearsal.py and scripts/probe_fused_breakdown.py so the three
measurements are of the identical engine construction by construction,
not by copy-paste discipline.

Random weights stand in for the unobtainable OpenAI checkpoints (zero
egress); everything big is generated ON the device inside jitted programs
(host-side init + device_put would ship ~300 MB through the axon tunnel).
"""

import numpy as np

ENSEMBLE_NAMES = ["best", "ema", "zema", "diff", "diffh", "difft"]


def synth_engine_inputs(preset: str = "ViT-B/16", bank_rows: int = 220_000,
                        log=lambda msg: None):
    """Build (clip_cfg, clip_params, specs, bank) for the 6-member synthetic
    competition ensemble: bf16 on-device CLIP params, one prompt-learner spec
    per ensemble member (evidence flags on best/difft, like the reference's
    run_eval.sh groups), and an L2-normalised [bank_rows, E] caption bank."""
    import jax
    import jax.numpy as jnp

    from leclip_tpu.data.vocab import COCO_OBJECT_CATEGORIES
    from leclip_tpu.inference.tta import build_model_spec
    from leclip_tpu.models.clip import PRESETS, init_clip_params
    from leclip_tpu.models.dense_clip import DenseFlags
    from leclip_tpu.models.prompt import build_prompt_learner

    clip_cfg = PRESETS[preset]
    log(f"initialising {preset} params on device…")
    init_fn = jax.jit(lambda key: init_clip_params(key, clip_cfg, dtype=jnp.bfloat16))
    clip_params = init_fn(jax.random.PRNGKey(0))
    jax.tree.map(lambda x: x.block_until_ready(), clip_params)

    log("building 6 ensemble specs…")
    flags = DenseFlags(use_evidence=True)
    # prompt scaffolding (tokenize + tiny embedding lookups) built on CPU
    # from a SPARSE host stub of the token embedding — fetching the full
    # [49408, D] table over the axon tunnel measured 136 s when the link
    # degrades, which once pushed bench.py past the driver timeout
    from leclip_tpu.models.prompt import sparse_token_embedding_stub

    token_emb_host = sparse_token_embedding_stub(
        clip_params["text"]["token_embedding"], COCO_OBJECT_CATEGORIES, n_ctx=16
    )
    host_clip_stub = {"text": {"token_embedding": token_emb_host}}
    specs = {}
    for i, name in enumerate(ENSEMBLE_NAMES):
        trainable, constants = build_prompt_learner(
            jax.random.PRNGKey(i), host_clip_stub, COCO_OBJECT_CATEGORIES,
            n_ctx=16, dtype=jnp.bfloat16,
        )
        specs[name] = build_model_spec(
            clip_params, clip_cfg, trainable, constants,
            flags if name in ("best", "difft") else DenseFlags(),
        )

    log(f"building {bank_rows // 1000}k caption bank on device…")

    @jax.jit
    def bank_fn(key):
        b = jax.random.normal(key, (bank_rows, clip_cfg.embed_dim), jnp.bfloat16)
        return b / jnp.linalg.norm(
            b.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(jnp.bfloat16)

    bank = bank_fn(jax.random.PRNGKey(7))
    bank.block_until_ready()
    return clip_cfg, clip_params, specs, bank
