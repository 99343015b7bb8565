"""Torch-checkpoint -> Flax-params converters for every backbone.

Lets users of the reference framework (LilYau350/Variance-Aware-Weight) load
their trained PyTorch checkpoints into the TPU models. Input is a flat
``{name: numpy array}`` state dict (load a ``.pth`` with
``torch.load(..., map_location="cpu")`` and call ``.numpy()`` per tensor, or
use :func:`tests/_reference.state_dict_numpy` in-process).

Layout rules applied throughout:
- torch ``nn.Linear`` weight is ``[out, in]``; Flax ``Dense`` kernel is
  ``[in, out]`` -> transpose.
- torch ``nn.Conv2d`` weight is ``[O, I, kh, kw]`` (OIHW); Flax ``Conv``
  kernel is ``[kh, kw, I, O]`` (HWIO) -> transpose (2, 3, 1, 0).
- Embedding tables carry over unchanged.

Name maps cite the reference modules they mirror:
- DiT:   reference models/dit.py:157-298
- UNet:  reference models/unet.py:397-918
- ViT:   reference models/vit.py:299-522
- U-ViT: reference models/uvit.py:133-255
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Mapping

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

__all__ = [
    "convert_dit",
    "convert_unet",
    "convert_vit",
    "convert_uvit",
    "convert_state_dict",
]

Array = np.ndarray
StateDict = Mapping[str, Array]


def _t(w: Array) -> Array:
    """torch Linear [out, in] -> Flax Dense kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:
    """torch Conv2d OIHW -> Flax Conv HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv1d(w: Array) -> Array:
    """torch Conv1d [O, I, k] -> Flax Conv [k, I, O]."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def convert_state_dict(
    sd: StateDict,
    rules: Dict[str, "tuple[str, Callable[[Array], Array]] | None"],
) -> dict:
    """Apply exact-name or regex rules ``torch_name -> (flax_path, transform)``
    and return a nested Flax params dict. A ``None`` rule drops the entry
    (frozen buffers the Flax model recomputes). Raises on any unmatched
    torch tensor so silent partial loads are impossible."""
    out = {}
    unmatched = []
    compiled = [
        (re.compile(pat + r"\Z"), rule) for pat, rule in rules.items()
    ]
    for name, value in sd.items():
        for rx, rule in compiled:
            m = rx.match(name)
            if m is None:
                continue
            if rule is not None:
                path_tpl, fn = rule
                path = m.expand(path_tpl)
                out[tuple(path.split("/"))] = np.asarray(fn(value))
            break
        else:
            unmatched.append(name)
    if unmatched:
        raise ValueError(
            f"no conversion rule for {len(unmatched)} torch tensors: "
            f"{unmatched[:8]}{'...' if len(unmatched) > 8 else ''}"
        )
    return unflatten_dict(out)


def _check_against(params: dict, target_params) -> dict:
    """Validate converted tree against a target params tree (shapes+paths)."""
    got = flatten_dict(params)
    want = flatten_dict(target_params)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    if missing or extra:
        raise ValueError(
            f"converted param tree mismatch: missing={missing[:6]} "
            f"extra={extra[:6]}"
        )
    for k, v in want.items():
        if tuple(got[k].shape) != tuple(np.shape(v)):
            raise ValueError(
                f"shape mismatch at {'/'.join(k)}: converted "
                f"{got[k].shape}, model expects {np.shape(v)}"
            )
    return params


# ---------------------------------------------------------------------------
# DiT (reference models/dit.py)
# ---------------------------------------------------------------------------

_DIT_RULES: Dict[str, object] = {
    r"x_embedder\.proj\.weight": ("PatchEmbed_0/Conv_0/kernel", _conv),
    r"x_embedder\.proj\.bias": ("PatchEmbed_0/Conv_0/bias", lambda x: x),
    r"t_embedder\.mlp\.0\.weight": ("TimestepEmbedder_0/Dense_0/kernel", _t),
    r"t_embedder\.mlp\.0\.bias": ("TimestepEmbedder_0/Dense_0/bias", lambda x: x),
    r"t_embedder\.mlp\.2\.weight": ("TimestepEmbedder_0/Dense_1/kernel", _t),
    r"t_embedder\.mlp\.2\.bias": ("TimestepEmbedder_0/Dense_1/bias", lambda x: x),
    r"y_embedder\.embedding_table\.weight": (
        "LabelEmbedder_0/Embed_0/embedding", lambda x: x),
    # frozen sin-cos table — the Flax model recomputes it as a jit constant
    r"pos_embed": None,
    r"blocks\.(\d+)\.adaLN_modulation\.1\.weight": (
        r"DiTBlock_\1/Dense_0/kernel", _t),
    r"blocks\.(\d+)\.adaLN_modulation\.1\.bias": (
        r"DiTBlock_\1/Dense_0/bias", lambda x: x),
    r"blocks\.(\d+)\.attn\.qkv\.weight": (
        r"DiTBlock_\1/MultiHeadSelfAttention_0/Dense_0/kernel", _t),
    r"blocks\.(\d+)\.attn\.qkv\.bias": (
        r"DiTBlock_\1/MultiHeadSelfAttention_0/Dense_0/bias", lambda x: x),
    r"blocks\.(\d+)\.attn\.proj\.weight": (
        r"DiTBlock_\1/MultiHeadSelfAttention_0/Dense_1/kernel", _t),
    r"blocks\.(\d+)\.attn\.proj\.bias": (
        r"DiTBlock_\1/MultiHeadSelfAttention_0/Dense_1/bias", lambda x: x),
    r"blocks\.(\d+)\.mlp\.fc1\.weight": (r"DiTBlock_\1/Mlp_0/Dense_0/kernel", _t),
    r"blocks\.(\d+)\.mlp\.fc1\.bias": (
        r"DiTBlock_\1/Mlp_0/Dense_0/bias", lambda x: x),
    r"blocks\.(\d+)\.mlp\.fc2\.weight": (r"DiTBlock_\1/Mlp_0/Dense_1/kernel", _t),
    r"blocks\.(\d+)\.mlp\.fc2\.bias": (
        r"DiTBlock_\1/Mlp_0/Dense_1/bias", lambda x: x),
    # REPA projector MLP (reference dit.py:27-34): Sequential indices 0/2/4
    # land on the DiT-scope Dense_0/1/2 of the tap.
    r"projectors\.0\.weight": ("Dense_0/kernel", _t),
    r"projectors\.0\.bias": ("Dense_0/bias", lambda x: x),
    r"projectors\.2\.weight": ("Dense_1/kernel", _t),
    r"projectors\.2\.bias": ("Dense_1/bias", lambda x: x),
    r"projectors\.4\.weight": ("Dense_2/kernel", _t),
    r"projectors\.4\.bias": ("Dense_2/bias", lambda x: x),
    r"final_layer\.adaLN_modulation\.1\.weight": (
        "FinalLayer_0/Dense_0/kernel", _t),
    r"final_layer\.adaLN_modulation\.1\.bias": (
        "FinalLayer_0/Dense_0/bias", lambda x: x),
    r"final_layer\.linear\.weight": ("FinalLayer_0/Dense_1/kernel", _t),
    r"final_layer\.linear\.bias": ("FinalLayer_0/Dense_1/bias", lambda x: x),
}


def convert_dit(sd: StateDict, target_params=None) -> dict:
    """Reference DiT state_dict -> Flax ``vaw_tpu.models.dit.DiT`` params."""
    params = convert_state_dict(sd, _DIT_RULES)
    if target_params is not None:
        _check_against(params, target_params)
    return params
