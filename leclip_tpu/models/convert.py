"""OpenAI-CLIP checkpoint → leclip_tpu parameter pytree.

Loads the torch ``.pt`` artifacts (JIT archive or plain state dict — same
dual-path the reference loader has, ref: project/my_code/clip/clip.py:120-160
and trainers/Caption_distill_double.py:38-54) and remaps to this framework's
layout: linear kernels transposed to [in, out], convs OIHW→HWIO, per-layer
block params stacked along a leading layer axis for lax.scan.

torch is only imported here, at conversion time; the rest of the framework is
torch-free.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .clip import CLIPConfig, config_from_state_dict


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().float().numpy() if hasattr(x, "detach") else x)
    return arr


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import warnings

    import torch

    try:
        with warnings.catch_warnings():
            # OpenAI ships TorchScript archives; torch.jit.load is the only
            # reader for them (its deprecation warning is noise here)
            warnings.simplefilter("ignore", DeprecationWarning)
            model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    return {k: _t(v) for k, v in sd.items()}


def _linear(sd, prefix):
    return {
        "kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _bn(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def _conv(sd, key):
    # torch OIHW → HWIO
    return jnp.asarray(sd[key].transpose(2, 3, 1, 0))


def _block_stack(sd, prefix: str, layers: int) -> dict:
    """Stack transformer resblocks ``prefix.{i}.*`` along a leading axis."""

    def gather(fn):
        return jnp.stack([fn(i) for i in range(layers)])

    return {
        "ln_1": {
            "scale": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.ln_1.weight"])),
            "bias": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.ln_1.bias"])),
        },
        "attn": {
            "qkv_kernel": gather(
                lambda i: jnp.asarray(sd[f"{prefix}.{i}.attn.in_proj_weight"].T)
            ),
            "qkv_bias": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.attn.in_proj_bias"])),
            "out_kernel": gather(
                lambda i: jnp.asarray(sd[f"{prefix}.{i}.attn.out_proj.weight"].T)
            ),
            "out_bias": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.attn.out_proj.bias"])),
        },
        "ln_2": {
            "scale": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.ln_2.weight"])),
            "bias": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.ln_2.bias"])),
        },
        "mlp": {
            "fc_kernel": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.mlp.c_fc.weight"].T)),
            "fc_bias": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.mlp.c_fc.bias"])),
            "proj_kernel": gather(
                lambda i: jnp.asarray(sd[f"{prefix}.{i}.mlp.c_proj.weight"].T)
            ),
            "proj_bias": gather(lambda i: jnp.asarray(sd[f"{prefix}.{i}.mlp.c_proj.bias"])),
        },
    }


def _convert_resnet(sd, layers) -> dict:
    p = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = _conv(sd, f"visual.conv{i}.weight")
        p[f"bn{i}"] = _bn(sd, f"visual.bn{i}")

    def bottleneck(prefix):
        blk = {
            "conv1": _conv(sd, f"{prefix}.conv1.weight"),
            "bn1": _bn(sd, f"{prefix}.bn1"),
            "conv2": _conv(sd, f"{prefix}.conv2.weight"),
            "bn2": _bn(sd, f"{prefix}.bn2"),
            "conv3": _conv(sd, f"{prefix}.conv3.weight"),
            "bn3": _bn(sd, f"{prefix}.bn3"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            blk["downsample"] = {
                "conv": _conv(sd, f"{prefix}.downsample.0.weight"),
                "bn": _bn(sd, f"{prefix}.downsample.1"),
            }
        return blk

    import jax

    for li, n_blocks in zip((1, 2, 3, 4), layers):
        stage = {"block0": bottleneck(f"visual.layer{li}.0")}
        if n_blocks > 1:
            rest = [bottleneck(f"visual.layer{li}.{b}") for b in range(1, n_blocks)]
            stage["rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *rest)
        p[f"layer{li}"] = stage

    p["attnpool"] = {
        "positional_embedding": jnp.asarray(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _linear(sd, "visual.attnpool.q_proj"),
        "k_proj": _linear(sd, "visual.attnpool.k_proj"),
        "v_proj": _linear(sd, "visual.attnpool.v_proj"),
        "c_proj": _linear(sd, "visual.attnpool.c_proj"),
    }
    return p


def _convert_vit(sd, n_layers: int) -> dict:
    conv_w = sd["visual.conv1.weight"]  # [width, 3, p, p]
    patch_kernel = jnp.asarray(
        conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    )  # (p,p,c) flatten order matches vit.patchify
    return {
        "patch_kernel": patch_kernel,
        "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
        "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
        "ln_pre": {
            "scale": jnp.asarray(sd["visual.ln_pre.weight"]),
            "bias": jnp.asarray(sd["visual.ln_pre.bias"]),
        },
        "blocks": _block_stack(sd, "visual.transformer.resblocks", n_layers),
        "ln_post": {
            "scale": jnp.asarray(sd["visual.ln_post.weight"]),
            "bias": jnp.asarray(sd["visual.ln_post.bias"]),
        },
        "proj": jnp.asarray(sd["visual.proj"]),
    }


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[CLIPConfig, dict]:
    cfg = config_from_state_dict(sd)
    visual = (
        _convert_vit(sd, cfg.vision_layers)
        if cfg.is_vit
        else _convert_resnet(sd, cfg.vision_layers)
    )
    params = {
        "visual": visual,
        "text": {
            "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
            "positional_embedding": jnp.asarray(sd["positional_embedding"]),
            "blocks": _block_stack(sd, "transformer.resblocks", cfg.transformer_layers),
            "ln_final": {
                "scale": jnp.asarray(sd["ln_final.weight"]),
                "bias": jnp.asarray(sd["ln_final.bias"]),
            },
            "text_projection": jnp.asarray(sd["text_projection"]),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"], jnp.float32),
    }
    return cfg, params


def load_clip_weights(path: str) -> Tuple[CLIPConfig, dict]:
    """Load an OpenAI CLIP checkpoint file into (config, params)."""
    return convert_state_dict(load_torch_state_dict(path))


_PROMPT_KEYS = (
    "ctx", "ctx_double", "ctx_evidence",
    "temperature", "spatial_T", "ranking_scale",
)


def load_prompt_checkpoint(path: str) -> Tuple[dict, int]:
    """Convert a reference-trained prompt checkpoint (``model.pth.tar[-N]``)
    into this framework's trainable prompt pytree.

    The reference registers only the ``prompt_learner`` module, so its
    checkpoints are ``{"state_dict": {ctx, ctx_double, ctx_evidence,
    temperature, spatial_T, ranking_scale, token_prefix, token_suffix,
    token_suffix_nocls}, "epoch": N, "optimizer": ..., "scheduler": ...}``
    (ref: register_model Caption_distill_double.py:773-776, save format
    dassl/utils/torchtools.py:27-82). Frozen token buffers are dropped —
    they are rebuilt from the current class list at load time, exactly like
    the reference's strict=False load (Caption_distill_double.py:929-938).

    Returns ``(trainable, epoch)`` with fp32 arrays (the reference trains
    fp32 after clip_model.float(); fp16-PREC checkpoints are upcast).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)

    def norm(k: str) -> str:
        for prefix in ("module.", "prompt_learner."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        return k

    sd = {norm(k): v for k, v in sd.items()}
    missing = [k for k in _PROMPT_KEYS if k not in sd]
    if missing:
        raise KeyError(
            f"{path} is not a reference prompt checkpoint (missing {missing}; "
            f"has {sorted(sd)})"
        )
    trainable = {k: _t(sd[k]).astype(np.float32) for k in _PROMPT_KEYS}
    epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0
    return trainable, epoch
