"""CLIP assembly: config, init, and encode functions.

Capability parity with the reference CLIP core (ref: project/my_code/clip/
model.py:279-472): dual-tower contrastive model, architecture inference from
a state-dict's shapes (``config_from_state_dict`` mirrors build_model's
shape-sniffing, model.py:435-458), and the known preset geometries.

Everything is a pure function over an explicit parameter pytree — no module
objects — so towers compose freely under jit/pjit and the frozen CLIP params
can be donated/replicated as a single pytree constant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import encode_image_resnet, init_resnet_params
from .text import encode_text, init_text_params
from .vit import encode_image_vit, init_vit_params


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: Union[Tuple[int, int, int, int], int]
    vision_width: int
    vision_patch_size: Optional[int]
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64

    @property
    def grid_size(self) -> int:
        if self.is_vit:
            return self.image_resolution // self.vision_patch_size
        return self.image_resolution // 32


PRESETS = {
    "RN50": CLIPConfig(1024, 224, (3, 4, 6, 3), 64, None),
    "RN101": CLIPConfig(512, 224, (3, 4, 23, 3), 64, None),
    "RN50x4": CLIPConfig(
        640, 288, (4, 6, 10, 6), 80, None,
        transformer_width=640, transformer_heads=10, transformer_layers=12,
    ),
    "RN50x16": CLIPConfig(
        768, 384, (6, 8, 18, 8), 96, None,
        transformer_width=768, transformer_heads=12, transformer_layers=12,
    ),
    "ViT-B/32": CLIPConfig(512, 224, 12, 768, 32),
    "ViT-B/16": CLIPConfig(512, 224, 12, 768, 16),
    "ViT-L/14": CLIPConfig(
        768, 224, 24, 1024, 14,
        transformer_width=768, transformer_heads=12, transformer_layers=12,
    ),
    # trainable-from-scratch tiny tower for the labeled synthetic IMAGE
    # closed loop (scripts/image_rehearsal.py): big enough to learn the
    # 80 procedural glyph classes contrastively, small enough to pretrain
    # in minutes on one chip
    "RN-SYN": CLIPConfig(
        128, 64, (1, 1, 1, 1), 16, None,
        transformer_width=128, transformer_heads=4, transformer_layers=4,
    ),
    # ViT-B's REAL vision geometry (768 wide × 12 layers, the auto-int8
    # surface) on 64px inputs — trainable on the glyph benchmark, used by
    # the real-width VISION int8 task gate (scripts/quant_gate_realwidth.py)
    "ViT-SYN": CLIPConfig(
        512, 64, 12, 768, 16,
        transformer_width=256, transformer_heads=4, transformer_layers=4,
    ),
    # ViT-L's real vision WIDTH (1024, 16 heads) at 12 layers — the other
    # candidate auto-int8 vision geometry, gated the same way
    "ViT-SYN-L": CLIPConfig(
        512, 64, 12, 1024, 16,
        transformer_width=256, transformer_heads=4, transformer_layers=4,
    ),
    # miniature towers for CI / smoke runs (not real CLIP geometries)
    "RN-TEST": CLIPConfig(
        64, 64, (1, 1, 1, 1), 8, None,
        transformer_width=64, transformer_heads=2, transformer_layers=2,
    ),
    "ViT-TEST": CLIPConfig(
        64, 64, 2, 64, 16,
        transformer_width=64, transformer_heads=2, transformer_layers=2,
    ),
}


def init_clip_params(key, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    k_vis, k_txt = jax.random.split(key)
    if cfg.is_vit:
        visual = init_vit_params(
            k_vis, cfg.image_resolution, cfg.vision_patch_size,
            cfg.vision_width, cfg.vision_layers, cfg.embed_dim, dtype,
        )
    else:
        visual = init_resnet_params(
            k_vis, cfg.vision_layers, cfg.embed_dim, cfg.image_resolution,
            cfg.vision_width, dtype,
        )
    return {
        "visual": visual,
        "text": init_text_params(
            k_txt, cfg.vocab_size, cfg.context_length, cfg.transformer_width,
            cfg.transformer_layers, cfg.embed_dim, dtype,
        ),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def clip_encode_image(
    params: dict, cfg: CLIPConfig, images: jnp.ndarray,
    dense: bool = False, if_pos: bool = True, impl: str = "auto",
    q8: dict = None, fused: bool = False, pool_map: bool = True,
):
    """Images [B, H, W, 3] (normalized) → global embedding [B, E]; with
    ``dense`` also the per-position embeddings. ``q8``: optional stacked
    int8 transformer weights (W8A8 inference path, ViT only); ``fused``:
    bf16 fused-block kernels (inference, ViT only). ``pool_map=False``
    (RN only): skip the attention pool's per-position output — dense
    callers that project the trunk map themselves get the single-query
    fast pool (identical global feature)."""
    if cfg.is_vit:
        return encode_image_vit(
            images, params["visual"], cfg.vision_heads, cfg.vision_patch_size,
            dense=dense, impl=impl, q8=q8, fused=fused,
        )
    return encode_image_resnet(
        images, params["visual"], cfg.vision_heads, dense=dense, if_pos=if_pos,
        pool_map=pool_map,
    )


def clip_encode_text(
    params: dict, cfg: CLIPConfig, tokens: jnp.ndarray,
    sequence: bool = False, impl: str = "auto", remat: bool = False,
):
    return encode_text(
        params["text"], tokens, cfg.transformer_heads,
        impl=impl, remat=remat, sequence=sequence,
    )


def clip_similarity(params: dict, cfg: CLIPConfig, images, tokens, impl="auto"):
    """The contrastive-CLIP forward: L2-normalised features, scaled cosine
    logits both ways (ref model.py:394-408)."""
    img = clip_encode_image(params, cfg, images, impl=impl)
    txt = clip_encode_text(params, cfg, tokens, impl=impl)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


def config_from_state_dict(sd: dict) -> CLIPConfig:
    """Infer architecture geometry from an OpenAI-format state dict's shapes
    (same logic as reference build_model, model.py:435-458). ``sd`` maps
    name → array-like with ``.shape``."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks")}
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        )
        vision_layers = counts
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_patch_size = None
        image_resolution = out_width * 32

    embed_dim = sd["text_projection"].shape[1]
    transformer_width = sd["ln_final.weight"].shape[0]
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
    )
