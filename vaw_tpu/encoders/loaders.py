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

__all__ = ["load_encoders", "convert_timm_vit", "convert_clip_vit",
           "find_encoder_weights", "resample_pos_embed",
           "runtime_image_size"]


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


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel with a = -0.5 — the PIL-style filter torch uses on
    its antialiased bicubic path (the one timm resample_abs_pos_embed and
    therefore the reference loader hit; verified numerically vs torch)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        np.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                 0.0),
    )


def _resize_bicubic_axis(x: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """One axis of torch F.interpolate(mode='bicubic', align_corners=False,
    antialias=True): half-pixel centers, kernel stretched by in/out when
    downscaling, window truncated at the borders and weights renormalized
    (torch UpSampleKernel.cpp aa path semantics)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    kscale = max(scale, 1.0)  # antialias stretch on downscale only
    support = 2.0 * kscale
    center = scale * (np.arange(out_size) + 0.5)
    lo = np.maximum(np.trunc(center - support + 0.5).astype(np.int64), 0)
    hi = np.minimum(np.trunc(center + support + 0.5).astype(np.int64),
                    in_size)
    taps = int(np.ceil(support)) * 2 + 1
    idxs = lo[:, None] + np.arange(taps)[None, :]
    weights = _cubic_kernel((idxs - center[:, None] + 0.5) / kscale)
    weights = np.where(idxs < hi[:, None], weights, 0.0)
    weights = weights / weights.sum(axis=1, keepdims=True)
    idxs = np.clip(idxs, 0, in_size - 1)  # zero-weight taps only
    moved = np.moveaxis(np.asarray(x, np.float64), axis, 0)
    out = np.einsum("ok,ok...->o...", weights, moved[idxs])
    return np.moveaxis(out, 0, axis)


def resample_pos_embed(pos: np.ndarray, target_grid: int,
                       num_prefix_tokens: int = 1) -> np.ndarray:
    """Bicubically resample an absolute pos-embed table [1, P + T, D] to a
    new square grid, preserving prefix (cls) rows — numpy equivalent of
    timm.layers.pos_embed.resample_abs_pos_embed, which the reference
    applies to the MAE teacher at 256 px (tools/encoders.py:215-224) and
    relies on timm to apply for dinov1/mocov3."""
    pos = np.asarray(pos)
    squeeze = pos.ndim == 3
    tab = pos[0] if squeeze else pos
    prefix, grid_part = tab[:num_prefix_tokens], tab[num_prefix_tokens:]
    src = int(round(len(grid_part) ** 0.5))
    assert src * src == len(grid_part), (
        f"pos_embed grid is not square: {len(grid_part)} tokens")
    if src != target_grid:
        g = grid_part.reshape(src, src, -1)
        g = _resize_bicubic_axis(g, target_grid, 0)
        g = _resize_bicubic_axis(g, target_grid, 1)
        grid_part = g.reshape(target_grid * target_grid, -1)
    out = np.concatenate([prefix, grid_part]).astype(pos.dtype)
    return out[None] if squeeze else out


def convert_timm_vit(sd: Dict[str, np.ndarray], depth: int,
                     layer_scale: bool = False,
                     use_cls_token: bool = True,
                     pre_norm: bool = False,
                     final_norm: bool = True,
                     target_grid: Optional[int] = None) -> Dict:
    """timm/DINO/MAE-style ViT state dict -> FeatureViT params.

    Handles the common timm naming (patch_embed.proj, blocks.N.attn.qkv,
    blocks.N.mlp.fc1/fc2, norm) that all reference teacher families share.
    `target_grid` resamples the checkpoint pos-embed to the runtime token
    grid the way the reference does at load time
    (timm resample_abs_pos_embed, tools/encoders.py:32-35,117-118,149-151,
    217-225) — without it a 224-px checkpoint cannot run at 256 px.
    """
    params: Dict = {}
    w = sd["patch_embed.proj.weight"]  # [D, 3, p, p]
    params["patch_embed"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if "patch_embed.proj.bias" in sd and not pre_norm:
        params["patch_embed"]["bias"] = sd["patch_embed.proj.bias"]
    if use_cls_token and "cls_token" in sd:
        params["cls_token"] = sd["cls_token"]
    if "pos_embed" in sd:
        pos = sd["pos_embed"]
        if target_grid is not None:
            pos = resample_pos_embed(
                pos, target_grid,
                num_prefix_tokens=1 if use_cls_token else 0)
        params["pos_embed"] = pos
    if "register_tokens" in sd:
        params["register_tokens"] = sd["register_tokens"]
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


def convert_clip_vit(sd: Dict[str, np.ndarray], depth: int,
                     target_grid: Optional[int] = None) -> Dict:
    """CLIP visual-tower state dict -> FeatureViT params.

    CLIP naming differs from timm (reference: encoders/clip_vit.py:159-230):
    conv1 (bias-free patch embed), class_embedding [D],
    positional_embedding [T+1, D] (no batch dim), ln_pre, and
    transformer.resblocks.N.{ln_1, attn.in_proj_*, attn.out_proj, ln_2,
    mlp.c_fc, mlp.c_proj}. ln_post/proj are dropped — the reference
    wrapper never applies them (clip_vit.py:228-230).
    """
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in sd.items()}
    params: Dict = {
        "patch_embed": {
            "kernel": np.transpose(sd["conv1.weight"], (2, 3, 1, 0))},
        "cls_token": np.asarray(sd["class_embedding"]).reshape(1, 1, -1),
        "ln_pre": {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]},
    }
    pos = np.asarray(sd["positional_embedding"])[None]  # [1, T+1, D]
    if target_grid is not None:
        pos = resample_pos_embed(pos, target_grid, num_prefix_tokens=1)
    params["pos_embed"] = pos
    for i in range(depth):
        p = f"transformer.resblocks.{i}"
        params[f"block_{i}"] = {
            "norm1": {"scale": sd[f"{p}.ln_1.weight"],
                      "bias": sd[f"{p}.ln_1.bias"]},
            "norm2": {"scale": sd[f"{p}.ln_2.weight"],
                      "bias": sd[f"{p}.ln_2.bias"]},
            "attn": {
                "Dense_0": {"kernel": _t(sd[f"{p}.attn.in_proj_weight"]),
                            "bias": sd[f"{p}.attn.in_proj_bias"]},
                "Dense_1": {"kernel": _t(sd[f"{p}.attn.out_proj.weight"]),
                            "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "mlp": {
                "Dense_0": {"kernel": _t(sd[f"{p}.mlp.c_fc.weight"]),
                            "bias": sd[f"{p}.mlp.c_fc.bias"]},
                "Dense_1": {"kernel": _t(sd[f"{p}.mlp.c_proj.weight"]),
                            "bias": sd[f"{p}.mlp.c_proj.bias"]},
            },
        }
    return jax.tree_util.tree_map(jnp.asarray, params)


def runtime_image_size(family: str, image_size: int) -> int:
    """Pixel size a teacher actually sees after align-glue preprocessing
    (reference: tools/align_utils.py:19-40 — clip/dinov2/jepa inputs are
    bicubically resized to 224*(resolution//256); mae/mocov3/dinov1 are
    fed raw)."""
    if family in ("clip", "dinov2", "dinov2reg", "jepa"):
        return 224 * max(image_size // 256, 1)
    return image_size


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
        # Runtime token grid after the align-glue preprocessing: families
        # resized to 224*(res//256) vs fed raw pixels
        # (reference: tools/align_utils.py:19-40); the checkpoint pos-embed
        # is resampled to this grid exactly as the reference loader does.
        eff = runtime_image_size(family, image_size)
        grid = eff // cfg.patch_size
        if family == "clip":
            params = convert_clip_vit(sd, depth=cfg.depth, target_grid=grid)
        else:
            params = convert_timm_vit(
                sd, depth=cfg.depth, layer_scale=cfg.layer_scale,
                use_cls_token=cfg.use_cls_token, pre_norm=cfg.pre_norm,
                final_norm=cfg.final_norm, target_grid=grid,
            )

        def encoder_fn(x, _model=model, _params=params):
            return _model.apply({"params": _params}, x)

        encoder_fns.append(jax.jit(encoder_fn))
        architectures.append(arch)
        families.append(family)
    return encoder_fns, architectures, families
