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
    "convert_mmdit",
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
        want_shape = getattr(v, "shape", None)
        want_shape = (tuple(want_shape) if want_shape is not None
                      else tuple(np.shape(v)))
        if tuple(got[k].shape) != want_shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(k)}: converted "
                f"{got[k].shape}, model expects {want_shape}"
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


# ---------------------------------------------------------------------------
# ViT (reference models/vit.py)
# ---------------------------------------------------------------------------

_VIT_RULES: Dict[str, object] = {
    r"patch_embed\.proj\.weight": ("PatchEmbed_0/Conv_0/kernel", _conv),
    r"patch_embed\.proj\.bias": ("PatchEmbed_0/Conv_0/bias", lambda x: x),
    r"time_embedding\.weight": ("time_embedding/embedding", lambda x: x),
    r"class_embedding\.weight": ("class_embedding/embedding", lambda x: x),
    r"pos_embed": ("pos_embed", lambda x: x),
    r"rel_pos_bias\.relative_position_bias_table": (
        "RelativePositionBias_0/relative_position_bias_table", lambda x: x),
    r"rel_pos_bias\.relative_position_index": None,  # recomputed host-side
    r"blocks\.(\d+)\.norm1\.weight": (r"ViTBlock_\1/LayerNorm_0/scale",
                                      lambda x: x),
    r"blocks\.(\d+)\.norm1\.bias": (r"ViTBlock_\1/LayerNorm_0/bias",
                                    lambda x: x),
    r"blocks\.(\d+)\.norm2\.weight": (r"ViTBlock_\1/LayerNorm_1/scale",
                                      lambda x: x),
    r"blocks\.(\d+)\.norm2\.bias": (r"ViTBlock_\1/LayerNorm_1/bias",
                                    lambda x: x),
    r"blocks\.(\d+)\.attn\.qkv\.weight": (
        r"ViTBlock_\1/ViTAttention_0/Dense_0/kernel", _t),
    r"blocks\.(\d+)\.attn\.proj\.weight": (
        r"ViTBlock_\1/ViTAttention_0/Dense_1/kernel", _t),
    r"blocks\.(\d+)\.attn\.proj\.bias": (
        r"ViTBlock_\1/ViTAttention_0/Dense_1/bias", lambda x: x),
    r"blocks\.(\d+)\.gamma_1": (r"ViTBlock_\1/gamma_1", lambda x: x),
    r"blocks\.(\d+)\.gamma_2": (r"ViTBlock_\1/gamma_2", lambda x: x),
    r"blocks\.(\d+)\.mlp\.fc1\.weight": (r"ViTBlock_\1/Mlp_0/Dense_0/kernel",
                                         _t),
    r"blocks\.(\d+)\.mlp\.fc1\.bias": (r"ViTBlock_\1/Mlp_0/Dense_0/bias",
                                       lambda x: x),
    r"blocks\.(\d+)\.mlp\.fc2\.weight": (r"ViTBlock_\1/Mlp_0/Dense_1/kernel",
                                         _t),
    r"blocks\.(\d+)\.mlp\.fc2\.bias": (r"ViTBlock_\1/Mlp_0/Dense_1/bias",
                                       lambda x: x),
    r"norm\.weight": ("LayerNorm_0/scale", lambda x: x),
    r"norm\.bias": ("LayerNorm_0/bias", lambda x: x),
    r"linear_projection\.weight": ("Dense_0/kernel", _t),
    r"linear_projection\.bias": ("Dense_0/bias", lambda x: x),
    r"to_pixel\.weight": ("to_pixel/kernel", _conv),
    r"to_pixel\.bias": ("to_pixel/bias", lambda x: x),
}


def convert_vit(sd: StateDict, target_params=None) -> dict:
    """Reference ViT state_dict -> Flax ``vaw_tpu.models.vit.ViT`` params.

    BEiT attention keeps separate q_bias/v_bias with an implicit zero k bias
    (reference models/vit.py:94-99, 161); they are fused into the Flax qkv
    Dense bias here."""
    sd = dict(sd)
    qv = {}
    for name in list(sd):
        m = re.match(r"blocks\.(\d+)\.attn\.([qv])_bias\Z", name)
        if m:
            qv.setdefault(m.group(1), {})[m.group(2)] = sd.pop(name)
    params = convert_state_dict(sd, _VIT_RULES)
    for i, parts in qv.items():
        bias = np.concatenate(
            [parts["q"], np.zeros_like(parts["v"]), parts["v"]])
        params[f"ViTBlock_{i}"]["ViTAttention_0"]["Dense_0"]["bias"] = bias
    if target_params is not None:
        _check_against(params, target_params)
    return params


# ---------------------------------------------------------------------------
# U-ViT (reference models/uvit.py)
# ---------------------------------------------------------------------------

def convert_uvit(sd: StateDict, target_params=None, *, depth=None,
                 mlp_time_embed=False) -> dict:
    """Reference UViT state_dict -> Flax ``vaw_tpu.models.uvit.UViT`` params.

    Block order: in_blocks.{i} -> UViTBlock_{i}, mid_block ->
    UViTBlock_{depth//2}, out_blocks.{i} -> UViTBlock_{depth//2+1+i}
    (reference models/uvit.py:159-177). Inside a skip block the skip_linear
    Dense comes first, shifting qkv/proj to Dense_1/Dense_2."""
    if depth is None:
        n_in = 1 + max(
            int(m.group(1))
            for m in (re.match(r"in_blocks\.(\d+)\.", k) for k in sd) if m)
        depth = 2 * n_in + 1
    half = depth // 2

    def block_scope(name):
        """-> (flax scope, block prefix, remaining field) or Nones."""
        m = re.match(r"(in_blocks|out_blocks)\.(\d+)\.(.*)\Z|"
                     r"(mid_block)\.(.*)\Z", name)
        if not m:
            return None, None, None
        if m.group(4):
            return f"UViTBlock_{half}", "mid_block", m.group(5)
        i = int(m.group(2))
        prefix = f"{m.group(1)}.{i}"
        if m.group(1) == "in_blocks":
            return f"UViTBlock_{i}", prefix, m.group(3)
        return f"UViTBlock_{half + 1 + i}", prefix, m.group(3)

    decoder_dense = "Dense_2" if mlp_time_embed else "Dense_0"
    entries: Dict[str, Array] = {}
    for name, arr in sd.items():
        scope, prefix, sub = block_scope(name)
        if scope is not None:
            off = 1 if f"{prefix}.skip_linear.weight" in sd else 0
            field = {
                "norm1.weight": ("LayerNorm_0/scale", lambda x: x),
                "norm1.bias": ("LayerNorm_0/bias", lambda x: x),
                "norm2.weight": ("LayerNorm_1/scale", lambda x: x),
                "norm2.bias": ("LayerNorm_1/bias", lambda x: x),
                "skip_linear.weight": ("Dense_0/kernel", _t),
                "skip_linear.bias": ("Dense_0/bias", lambda x: x),
                "attn.qkv.weight": (f"Dense_{off}/kernel", _t),
                "attn.qkv.bias": (f"Dense_{off}/bias", lambda x: x),
                "attn.proj.weight": (f"Dense_{off + 1}/kernel", _t),
                "attn.proj.bias": (f"Dense_{off + 1}/bias", lambda x: x),
                "mlp.fc1.weight": ("Mlp_0/Dense_0/kernel", _t),
                "mlp.fc1.bias": ("Mlp_0/Dense_0/bias", lambda x: x),
                "mlp.fc2.weight": ("Mlp_0/Dense_1/kernel", _t),
                "mlp.fc2.bias": ("Mlp_0/Dense_1/bias", lambda x: x),
            }.get(sub)
            if field is None:
                raise ValueError(f"unhandled UViT block tensor: {name}")
            path, fn = field
            entries[f"{scope}/{path}"] = fn(arr)
            continue
        top = {
            "patch_embed.proj.weight": ("PatchEmbed_0/Conv_0/kernel", _conv),
            "patch_embed.proj.bias": ("PatchEmbed_0/Conv_0/bias", lambda x: x),
            "time_embed.0.weight": ("Dense_0/kernel", _t),
            "time_embed.0.bias": ("Dense_0/bias", lambda x: x),
            "time_embed.2.weight": ("Dense_1/kernel", _t),
            "time_embed.2.bias": ("Dense_1/bias", lambda x: x),
            "label_emb.weight": ("Embed_0/embedding", lambda x: x),
            "pos_embed": ("pos_embed", lambda x: x),
            "norm.weight": ("LayerNorm_0/scale", lambda x: x),
            "norm.bias": ("LayerNorm_0/bias", lambda x: x),
            "decoder_pred.weight": (f"{decoder_dense}/kernel", _t),
            "decoder_pred.bias": (f"{decoder_dense}/bias", lambda x: x),
            "final_layer.weight": ("final_layer/kernel", _conv),
            "final_layer.bias": ("final_layer/bias", lambda x: x),
        }.get(name)
        if top is None:
            raise ValueError(f"unhandled UViT tensor: {name}")
        path, fn = top
        entries[path] = fn(arr)

    params = unflatten_dict(
        {tuple(k.split("/")): np.asarray(v) for k, v in entries.items()})
    if target_params is not None:
        _check_against(params, target_params)
    return params


# ---------------------------------------------------------------------------
# ADM UNet + EncoderUNet (reference models/unet.py)
# ---------------------------------------------------------------------------

def _legacy_qkv_perm(c: int, heads: int) -> np.ndarray:
    """Row permutation from the reference's legacy head-interleaved qkv
    layout (QKVAttentionLegacy, models/unet.py:330-356: per head [q|k|v])
    to the plain [q_all | k_all | v_all] layout of the Flax Dense."""
    hd = c // heads
    perm = np.empty(3 * c, np.int64)
    for p in range(3):          # q, k, v
        for h in range(heads):
            dst = p * c + h * hd
            src = h * 3 * hd + p * hd
            perm[dst:dst + hd] = np.arange(src, src + hd)
    return perm


def _group_blocks(sd: StateDict):
    """Split a UNet state dict into (top_level, ordered block groups).

    Block prefix examples: input_blocks.3.0, middle_block.1,
    output_blocks.11.2. Returns [(prefix, {subkey: arr})] ordered exactly as
    the reference builds (and calls) them, plus the dict of non-block keys.
    """
    blocks: Dict[tuple, Dict[str, Array]] = {}
    top: Dict[str, Array] = {}
    for name, arr in sd.items():
        parts = name.split(".")
        if parts[0] in ("input_blocks", "output_blocks"):
            key = (parts[0], int(parts[1]), int(parts[2]))
            sub = ".".join(parts[3:])
        elif parts[0] == "middle_block":
            key = (parts[0], 0, int(parts[1]))
            sub = ".".join(parts[2:])
        else:
            top[name] = arr
            continue
        blocks.setdefault(key, {})[sub] = arr

    section_rank = {"input_blocks": 0, "middle_block": 1, "output_blocks": 2}
    ordered = sorted(blocks.items(),
                     key=lambda kv: (section_rank[kv[0][0]], kv[0][1], kv[0][2]))
    return top, ordered


def _res_block_entries(scope: str, sub: Dict[str, Array]):
    out = {
        f"{scope}/GroupNorm32_0/GroupNorm_0/scale": sub["in_layers.0.weight"],
        f"{scope}/GroupNorm32_0/GroupNorm_0/bias": sub["in_layers.0.bias"],
        f"{scope}/Conv_0/kernel": _conv(sub["in_layers.2.weight"]),
        f"{scope}/Conv_0/bias": sub["in_layers.2.bias"],
        f"{scope}/Dense_0/kernel": _t(sub["emb_layers.1.weight"]),
        f"{scope}/Dense_0/bias": sub["emb_layers.1.bias"],
        f"{scope}/GroupNorm32_1/GroupNorm_0/scale": sub["out_layers.0.weight"],
        f"{scope}/GroupNorm32_1/GroupNorm_0/bias": sub["out_layers.0.bias"],
        f"{scope}/Conv_1/kernel": _conv(sub["out_layers.3.weight"]),
        f"{scope}/Conv_1/bias": sub["out_layers.3.bias"],
    }
    if "skip_connection.weight" in sub:
        out[f"{scope}/Conv_2/kernel"] = _conv(sub["skip_connection.weight"])
        out[f"{scope}/Conv_2/bias"] = sub["skip_connection.bias"]
    covered = {"in_layers.0.weight", "in_layers.0.bias", "in_layers.2.weight",
               "in_layers.2.bias", "emb_layers.1.weight", "emb_layers.1.bias",
               "out_layers.0.weight", "out_layers.0.bias",
               "out_layers.3.weight", "out_layers.3.bias",
               "skip_connection.weight", "skip_connection.bias"}
    leftover = set(sub) - covered
    if leftover:
        raise ValueError(f"unhandled ResBlock tensors: {sorted(leftover)}")
    return out


def _attn_block_entries(scope: str, sub: Dict[str, Array], num_heads: int,
                        num_head_channels: int):
    c = sub["qkv.weight"].shape[1]
    heads = num_heads if num_head_channels == -1 else c // num_head_channels
    perm = _legacy_qkv_perm(c, heads)
    qkv_w = sub["qkv.weight"][:, :, 0]          # conv1d [3C, C, 1]
    return {
        f"{scope}/GroupNorm32_0/GroupNorm_0/scale": sub["norm.weight"],
        f"{scope}/GroupNorm32_0/GroupNorm_0/bias": sub["norm.bias"],
        f"{scope}/Dense_0/kernel": _t(qkv_w[perm]),
        f"{scope}/Dense_0/bias": sub["qkv.bias"][perm],
        f"{scope}/Dense_1/kernel": _t(sub["proj_out.weight"][:, :, 0]),
        f"{scope}/Dense_1/bias": sub["proj_out.bias"],
    }


def _walk_unet_blocks(ordered, num_heads, num_head_channels,
                      num_heads_upsample):
    """Assign each reference block the next Flax auto-number of its type and
    emit its converted tensors. The stem conv (input_blocks.0.0) maps to the
    top-scope Conv_0."""
    if num_heads_upsample == -1:
        num_heads_upsample = num_heads
    entries: Dict[str, Array] = {}
    counters = {"ResBlock": 0, "AttentionBlock": 0, "Upsample": 0,
                "Downsample": 0}

    def next_scope(kind):
        scope = f"{kind}_{counters[kind]}"
        counters[kind] += 1
        return scope

    for (section, i, j), sub in ordered:
        if section == "input_blocks" and i == 0:
            assert set(sub) == {"weight", "bias"}, sorted(sub)
            entries["Conv_0/kernel"] = _conv(sub["weight"])
            entries["Conv_0/bias"] = sub["bias"]
            continue
        if "in_layers.0.weight" in sub:
            entries.update(_res_block_entries(next_scope("ResBlock"), sub))
        elif "qkv.weight" in sub:
            heads = (num_heads_upsample if section == "output_blocks"
                     else num_heads)
            entries.update(_attn_block_entries(
                next_scope("AttentionBlock"), sub, heads, num_head_channels))
        elif "conv.weight" in sub:
            scope = next_scope("Upsample")
            entries[f"{scope}/Conv_0/kernel"] = _conv(sub["conv.weight"])
            entries[f"{scope}/Conv_0/bias"] = sub["conv.bias"]
        elif "op.weight" in sub:
            scope = next_scope("Downsample")
            entries[f"{scope}/Conv_0/kernel"] = _conv(sub["op.weight"])
            entries[f"{scope}/Conv_0/bias"] = sub["op.bias"]
        else:
            raise ValueError(
                f"unrecognized block {section}.{i}.{j}: {sorted(sub)}")
    return entries


def convert_unet(sd: StateDict, target_params=None, *, num_heads=1,
                 num_head_channels=-1, num_heads_upsample=-1) -> dict:
    """Reference UNetModel state_dict -> Flax
    ``vaw_tpu.models.unet.UNetModel`` params. Head counts are needed to
    un-interleave the legacy qkv layout (models/unet.py:330-356)."""
    top, ordered = _group_blocks(sd)
    entries = _walk_unet_blocks(ordered, num_heads, num_head_channels,
                                num_heads_upsample)

    entries["Dense_0/kernel"] = _t(top.pop("time_embed.0.weight"))
    entries["Dense_0/bias"] = top.pop("time_embed.0.bias")
    entries["Dense_1/kernel"] = _t(top.pop("time_embed.2.weight"))
    entries["Dense_1/bias"] = top.pop("time_embed.2.bias")
    if "label_emb.weight" in top:
        entries["Embed_0/embedding"] = top.pop("label_emb.weight")
    entries["GroupNorm32_0/GroupNorm_0/scale"] = top.pop("out.0.weight")
    entries["GroupNorm32_0/GroupNorm_0/bias"] = top.pop("out.0.bias")
    entries["Conv_1/kernel"] = _conv(top.pop("out.2.weight"))
    entries["Conv_1/bias"] = top.pop("out.2.bias")
    if top:
        raise ValueError(f"unconverted UNet tensors: {sorted(top)}")

    params = unflatten_dict(
        {tuple(k.split("/")): np.asarray(v) for k, v in entries.items()})
    if target_params is not None:
        _check_against(params, target_params)
    return params


def convert_encoder_unet(sd: StateDict, target_params=None, *, num_heads=1,
                         num_head_channels=-1, pool="adaptive") -> dict:
    """Reference EncoderUNetModel state_dict -> Flax
    ``vaw_tpu.models.unet.EncoderUNetModel`` params
    (reference models/unet.py:707-918)."""
    top, ordered = _group_blocks(sd)
    entries = _walk_unet_blocks(ordered, num_heads, num_head_channels, -1)

    entries["Dense_0/kernel"] = _t(top.pop("time_embed.0.weight"))
    entries["Dense_0/bias"] = top.pop("time_embed.0.bias")
    entries["Dense_1/kernel"] = _t(top.pop("time_embed.2.weight"))
    entries["Dense_1/bias"] = top.pop("time_embed.2.bias")

    if pool == "adaptive":
        entries["GroupNorm32_0/GroupNorm_0/scale"] = top.pop("out.0.weight")
        entries["GroupNorm32_0/GroupNorm_0/bias"] = top.pop("out.0.bias")
        # zero-init 1x1 conv after global pool == Dense
        entries["Dense_2/kernel"] = _t(top.pop("out.3.weight")[:, :, 0, 0])
        entries["Dense_2/bias"] = top.pop("out.3.bias")
    elif pool == "attention":
        entries["GroupNorm32_0/GroupNorm_0/scale"] = top.pop("out.0.weight")
        entries["GroupNorm32_0/GroupNorm_0/bias"] = top.pop("out.0.bias")
        # AttentionPool2d uses the NEW qkv order (models/unet.py:287-292 via
        # :47 QKVAttention) -> plain transpose, no permutation.
        entries["AttentionPool2d_0/positional_embedding"] = _t(
            top.pop("out.2.positional_embedding"))
        entries["AttentionPool2d_0/Dense_0/kernel"] = _t(
            top.pop("out.2.qkv_proj.weight")[:, :, 0])
        entries["AttentionPool2d_0/Dense_0/bias"] = top.pop("out.2.qkv_proj.bias")
        entries["AttentionPool2d_0/Dense_1/kernel"] = _t(
            top.pop("out.2.c_proj.weight")[:, :, 0])
        entries["AttentionPool2d_0/Dense_1/bias"] = top.pop("out.2.c_proj.bias")
    elif pool == "spatial":
        entries["Dense_2/kernel"] = _t(top.pop("out.0.weight"))
        entries["Dense_2/bias"] = top.pop("out.0.bias")
        entries["Dense_3/kernel"] = _t(top.pop("out.2.weight"))
        entries["Dense_3/bias"] = top.pop("out.2.bias")
    elif pool == "spatial_v2":
        entries["Dense_2/kernel"] = _t(top.pop("out.0.weight"))
        entries["Dense_2/bias"] = top.pop("out.0.bias")
        entries["GroupNorm32_0/GroupNorm_0/scale"] = top.pop("out.1.weight")
        entries["GroupNorm32_0/GroupNorm_0/bias"] = top.pop("out.1.bias")
        entries["Dense_3/kernel"] = _t(top.pop("out.3.weight"))
        entries["Dense_3/bias"] = top.pop("out.3.bias")
    else:
        raise NotImplementedError(pool)
    if top:
        raise ValueError(f"unconverted EncoderUNet tensors: {sorted(top)}")

    params = unflatten_dict(
        {tuple(k.split("/")): np.asarray(v) for k, v in entries.items()})
    if target_params is not None:
        _check_against(params, target_params)
    return params


# ---------------------------------------------------------------------------
# MM-DiT (reference encoders/mmdit.py:511-695)
# ---------------------------------------------------------------------------

def _mmdit_stream_rules(torch_stream: str, flax_stream: str):
    p = rf"joint_blocks\.(\d+)\.{torch_stream}\."
    f = rf"joint_\1/{flax_stream}/"
    return {
        p + r"adaLN_modulation\.1\.weight": (f + "adaLN/kernel", _t),
        p + r"adaLN_modulation\.1\.bias": (f + "adaLN/bias", lambda x: x),
        p + r"attn\.qkv\.weight": (f + "qkv_proj/kernel", _t),
        p + r"attn\.qkv\.bias": (f + "qkv_proj/bias", lambda x: x),
        p + r"attn\.proj\.weight": (f + "out_proj/kernel", _t),
        p + r"attn\.proj\.bias": (f + "out_proj/bias", lambda x: x),
        # qk-norm: rms has a lone scale; ln has scale+bias
        p + r"attn\.ln_q\.weight": (f + "q_norm/scale", lambda x: x),
        p + r"attn\.ln_k\.weight": (f + "k_norm/scale", lambda x: x),
        p + r"attn\.ln_q\.bias": (f + "q_norm/bias", lambda x: x),
        p + r"attn\.ln_k\.bias": (f + "k_norm/bias", lambda x: x),
        # GELU Mlp (default)
        p + r"mlp\.fc1\.weight": (f + "mlp/fc1/kernel", _t),
        p + r"mlp\.fc1\.bias": (f + "mlp/fc1/bias", lambda x: x),
        p + r"mlp\.fc2\.weight": (f + "mlp/fc2/kernel", _t),
        p + r"mlp\.fc2\.bias": (f + "mlp/fc2/bias", lambda x: x),
        # SwiGLU (bias-free w1/w2/w3)
        p + r"mlp\.w1\.weight": (f + "mlp/w1/kernel", _t),
        p + r"mlp\.w2\.weight": (f + "mlp/w2/kernel", _t),
        p + r"mlp\.w3\.weight": (f + "mlp/w3/kernel", _t),
    }


_MMDIT_RULES: Dict[str, object] = {
    r"x_embedder\.proj\.weight": ("x_embedder/Conv_0/kernel", _conv),
    r"x_embedder\.proj\.bias": ("x_embedder/Conv_0/bias", lambda x: x),
    r"t_embedder\.mlp\.0\.weight": ("t_embedder/Dense_0/kernel", _t),
    r"t_embedder\.mlp\.0\.bias": ("t_embedder/Dense_0/bias", lambda x: x),
    r"t_embedder\.mlp\.2\.weight": ("t_embedder/Dense_1/kernel", _t),
    r"t_embedder\.mlp\.2\.bias": ("t_embedder/Dense_1/bias", lambda x: x),
    r"y_embedder\.mlp\.0\.weight": ("y_embedder_fc1/kernel", _t),
    r"y_embedder\.mlp\.0\.bias": ("y_embedder_fc1/bias", lambda x: x),
    r"y_embedder\.mlp\.2\.weight": ("y_embedder_fc2/kernel", _t),
    r"y_embedder\.mlp\.2\.bias": ("y_embedder_fc2/bias", lambda x: x),
    r"context_embedder\.weight": ("context_embedder/kernel", _t),
    r"context_embedder\.bias": ("context_embedder/bias", lambda x: x),
    r"register": ("register", lambda x: x),
    r"pos_embed": None,  # frozen sincos table, recomputed + cropped
    r"final_layer\.adaLN_modulation\.1\.weight": ("final_adaLN/kernel", _t),
    r"final_layer\.adaLN_modulation\.1\.bias": ("final_adaLN/bias",
                                                lambda x: x),
    r"final_layer\.linear\.weight": ("final_linear/kernel", _t),
    r"final_layer\.linear\.bias": ("final_linear/bias", lambda x: x),
    r"projectors\.(\d+)\.0\.weight": (r"projector_\1_fc1/kernel", _t),
    r"projectors\.(\d+)\.0\.bias": (r"projector_\1_fc1/bias", lambda x: x),
    r"projectors\.(\d+)\.2\.weight": (r"projector_\1_fc2/kernel", _t),
    r"projectors\.(\d+)\.2\.bias": (r"projector_\1_fc2/bias", lambda x: x),
    r"projectors\.(\d+)\.4\.weight": (r"projector_\1_fc3/kernel", _t),
    r"projectors\.(\d+)\.4\.bias": (r"projector_\1_fc3/bias", lambda x: x),
    **_mmdit_stream_rules("context_block", "context"),
    **_mmdit_stream_rules("x_block", "x"),
}


def convert_mmdit(sd: StateDict, target_params=None) -> dict:
    """Reference MM-DiT state_dict (encoders/mmdit.py MMDiT) -> Flax
    ``vaw_tpu.models.mmdit.MMDiT`` params."""
    params = convert_state_dict(sd, _MMDIT_RULES)
    if target_params is not None:
        _check_against(params, target_params)
    return params
