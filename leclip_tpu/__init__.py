"""leclip_tpu — TPU-native (JAX/XLA/Pallas) framework for language-enhanced
multi-label image recognition.

A from-scratch rebuild of the capabilities of the CVPR'23 Visual Prompt Tuning
Challenge 3rd-place solution
(JarvisUSTC/Language-Enhanced-CLIP-For-Multi-label-Image-Recognition):

* CLIP RN50 / ViT image+text encoders as pure-functional JAX (bf16 on MXU,
  scan-over-layers, Pallas flash-attention).
* "Texts-as-Images" prompt tuning: three learnable context-token sets +
  learnable temperatures trained against frozen CLIP text features of
  ChatGLM-generated captions (ref: project/my_code/trainers/Caption_distill_double.py).
* Dense per-position scoring with Winner-Take-All / evidence re-weighting,
  multi-scale sliding-window TTA, retrieval augmentation against a caption
  feature bank, co-occurrence modulation, and similarity/variance-weighted
  multi-checkpoint ensembling to the competition `impreds.json` format
  (ref: project/my_code/gen_final_ans.py).
* Data-parallel training/inference via jax.sharding over a device Mesh
  (replacing the reference's DDP/NCCL).

Public API convenience re-exports (submodules stay importable directly):

    from leclip_tpu import tokenize, PRESETS, load_clip, TTAEngine
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy re-exports: keep `import leclip_tpu` light (no jax import).
    table = {
        "tokenize": ("leclip_tpu.data.tokenizer", "tokenize"),
        "get_tokenizer": ("leclip_tpu.data.tokenizer", "get_tokenizer"),
        "COCO_OBJECT_CATEGORIES": ("leclip_tpu.data.vocab", "COCO_OBJECT_CATEGORIES"),
        "CaptionLabeler": ("leclip_tpu.data.labeling", "CaptionLabeler"),
        "CLIPConfig": ("leclip_tpu.models.clip", "CLIPConfig"),
        "PRESETS": ("leclip_tpu.models.clip", "PRESETS"),
        "init_clip_params": ("leclip_tpu.models.clip", "init_clip_params"),
        "load_clip_weights": ("leclip_tpu.models.convert", "load_clip_weights"),
        "build_prompt_learner": ("leclip_tpu.models.prompt", "build_prompt_learner"),
        "DenseFlags": ("leclip_tpu.models.dense_clip", "DenseFlags"),
        "dense_train_forward": ("leclip_tpu.models.dense_clip", "dense_train_forward"),
        "dense_test_forward": ("leclip_tpu.models.dense_clip", "dense_test_forward"),
        "setup_config": ("leclip_tpu.engine.config", "setup_config"),
        "CaptionDistillTrainer": ("leclip_tpu.engine.trainer", "CaptionDistillTrainer"),
        "CLIPFineTuner": ("leclip_tpu.engine.finetune", "CLIPFineTuner"),
        "TTAEngine": ("leclip_tpu.inference.tta", "TTAEngine"),
        "build_model_spec": ("leclip_tpu.inference.tta", "build_model_spec"),
        "run_full_inference": ("leclip_tpu.inference.pipeline", "run_full_inference"),
        "build_caption_bank": ("leclip_tpu.inference.pipeline", "build_caption_bank"),
        "make_engine": ("leclip_tpu.inference.pipeline", "make_engine"),
        "load_ensemble_specs": ("leclip_tpu.inference.pipeline", "load_ensemble_specs"),
        "load_prompt_checkpoint": ("leclip_tpu.models.convert", "load_prompt_checkpoint"),
        "ScoringService": ("leclip_tpu.cli.serve", "ScoringService"),
        "multihost_initialize": ("leclip_tpu.parallel.multihost", "initialize"),
        "is_primary": ("leclip_tpu.parallel.multihost", "is_primary"),
        "generate_final_answers": ("leclip_tpu.ops.ensemble", "generate_final_answers"),
        "randaugment": ("leclip_tpu.ops.randaugment", "randaugment"),
        "autoaugment": ("leclip_tpu.ops.autoaugment", "autoaugment"),
        "gcn_forward": ("leclip_tpu.models.gcn", "gcn_forward"),
        "init_gcn_params": ("leclip_tpu.models.gcn", "init_gcn_params"),
        "quantize_block_stack": ("leclip_tpu.ops.quant", "quantize_block_stack"),
        "int8_matmul": ("leclip_tpu.ops.quant", "int8_matmul"),
    }
    if name in table:
        import importlib

        module, attr = table[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'leclip_tpu' has no attribute {name!r}")
