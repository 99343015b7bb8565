"""Frozen-teacher loading: spec parsing, local weight discovery, torch->Flax
conversion with per-family checkpoint-key fixups.

Re-design of the reference encoder loader (reference: tools/encoders.py):
the rank-0-downloads-then-barrier pattern (encoders.py:76-82, 109-113)
disappears under single-process SPMD; in zero-egress environments weights
must exist locally (VAW_ENCODER_DIR or ./pretrained/encoders/). Key fixups
mirror the reference: MoCo-v3 strips the `module.base_encoder.` prefix
(encoders.py:13-36); MAE/JEPA unwrap their checkpoint dicts
(encoders.py:185-257).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vit_backbone import FeatureViT, make_teacher

__all__ = ["load_encoders", "convert_timm_vit", "find_encoder_weights"]


def find_encoder_weights(family: str, size: str) -> Optional[str]:
    base = os.environ.get("VAW_ENCODER_DIR", "pretrained/encoders")
    for ext in (".safetensors", ".pth", ".pt", ".bin"):
        p = os.path.join(base, f"{family}-vit-{size}{ext}")
        if os.path.exists(p):
            return p
    return None


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    # Checkpoint unwrapping fixups (reference: tools/encoders.py:13-36,
    # 185-257).
    for key in ("state_dict", "model", "target_encoder", "encoder"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    out = {}
    for k, v in sd.items():
        # MoCo-v3 DDP prefix fixup.
        for prefix in ("module.base_encoder.", "module.", "base_encoder."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        if hasattr(v, "numpy"):
            v = v.numpy()
        out[k] = v
    return out


def _t(w):
    return np.transpose(w)


def convert_timm_vit(sd: Dict[str, np.ndarray], depth: int,
                     layer_scale: bool = False,
                     use_cls_token: bool = True,
                     fixed_sincos_pos: bool = False,
                     pre_norm: bool = False,
                     final_norm: bool = True) -> Dict:
    """timm/DINO/MAE-style ViT state dict -> FeatureViT params.

    Handles the common timm naming (patch_embed.proj, blocks.N.attn.qkv,
    blocks.N.mlp.fc1/fc2, norm) that all reference teacher families share.
    """
    params: Dict = {}
    w = sd["patch_embed.proj.weight"]  # [D, 3, p, p]
    params["patch_embed"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if "patch_embed.proj.bias" in sd and not pre_norm:
        params["patch_embed"]["bias"] = sd["patch_embed.proj.bias"]
    if use_cls_token and "cls_token" in sd:
        params["cls_token"] = sd["cls_token"]
    if not fixed_sincos_pos and "pos_embed" in sd:
        params["pos_embed"] = sd["pos_embed"]
    if pre_norm and "ln_pre.weight" in sd:
        params["ln_pre"] = {"scale": sd["ln_pre.weight"],
                            "bias": sd["ln_pre.bias"]}

    for i in range(depth):
        p = f"blocks.{i}"
        blk: Dict = {
            "norm1": {"scale": sd[f"{p}.norm1.weight"],
                      "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"scale": sd[f"{p}.norm2.weight"],
                      "bias": sd[f"{p}.norm2.bias"]},
            "attn": {
                "Dense_0": {"kernel": _t(sd[f"{p}.attn.qkv.weight"]),
                            "bias": sd[f"{p}.attn.qkv.bias"]},
                "Dense_1": {"kernel": _t(sd[f"{p}.attn.proj.weight"]),
                            "bias": sd[f"{p}.attn.proj.bias"]},
            },
            "mlp": {
                "Dense_0": {"kernel": _t(sd[f"{p}.mlp.fc1.weight"]),
                            "bias": sd[f"{p}.mlp.fc1.bias"]},
                "Dense_1": {"kernel": _t(sd[f"{p}.mlp.fc2.weight"]),
                            "bias": sd[f"{p}.mlp.fc2.bias"]},
            },
        }
        if layer_scale:
            blk["ls1"] = sd[f"{p}.ls1.gamma"] if f"{p}.ls1.gamma" in sd \
                else sd[f"{p}.gamma_1"]
            blk["ls2"] = sd[f"{p}.ls2.gamma"] if f"{p}.ls2.gamma" in sd \
                else sd[f"{p}.gamma_2"]
        params[f"block_{i}"] = blk

    if final_norm and "norm.weight" in sd:
        params["norm"] = {"scale": sd["norm.weight"],
                          "bias": sd["norm.bias"]}
    return jax.tree_util.tree_map(jnp.asarray, params)


def _parse_spec(spec: str) -> Tuple[str, str, str]:
    """'dinov2-vit-b' -> (family, arch, size)
    (reference: tools/encoders.py:56-66)."""
    parts = spec.split("-")
    assert len(parts) == 3, f"bad encoder spec {spec!r}"
    return parts[0], parts[1], parts[2]


def load_encoders(enc_type: str, image_size: int = 224, dtype=jnp.float32):
    """Load frozen teachers from a comma-separated spec list.

    Returns (encoder_fns, architectures, families) mirroring the reference's
    (encoders, architectures, encoder_types) tuple (tools/encoders.py:56-94).
    Each encoder_fn maps preprocessed NHWC pixels -> token features.
    """
    encoder_fns: List = []
    architectures: List[str] = []
    families: List[str] = []
    for spec in enc_type.split(","):
        family, arch, size = _parse_spec(spec.strip())
        model = make_teacher(family, size, image_size, dtype)
        path = find_encoder_weights(family, size)
        if path is None:
            raise FileNotFoundError(
                f"weights for {spec} not found; place them at "
                f"$VAW_ENCODER_DIR/{family}-vit-{size}.(safetensors|pth)"
            )
        sd = _load_torch_state(path)
        cfg = model
        params = convert_timm_vit(
            sd, depth=cfg.depth, layer_scale=cfg.layer_scale,
            use_cls_token=cfg.use_cls_token,
            fixed_sincos_pos=cfg.fixed_sincos_pos, pre_norm=cfg.pre_norm,
            final_norm=cfg.final_norm,
        )

        def encoder_fn(x, _model=model, _params=params):
            return _model.apply({"params": _params}, x)

        encoder_fns.append(jax.jit(encoder_fn))
        architectures.append(arch)
        families.append(family)
    return encoder_fns, architectures, families
