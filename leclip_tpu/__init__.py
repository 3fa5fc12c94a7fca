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
"""

__version__ = "0.1.0"
