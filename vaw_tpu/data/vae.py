"""VAE weight loading + jitted encode/decode closures.

Replaces diffusers `AutoencoderKL.from_pretrained(...)`
(reference: tools/sampler.py:104, preprocessing/encode_latent.py): weights
are read from a locally-provided diffusers checkpoint
(diffusion_pytorch_model.safetensors or .bin) and converted torch->Flax
(NCHW OIHW conv kernels -> NHWC HWIO). Zero-egress environments must place
the checkpoint under ./pretrained/sd-vae-ft-{ema,mse}/ or point VAW_VAE_PATH
at it.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import AutoencoderKL

__all__ = ["find_vae_checkpoint", "load_vae", "load_vae_decoder",
           "convert_diffusers_vae"]


def find_vae_checkpoint(name: str = "ema") -> Optional[str]:
    candidates = [
        os.environ.get("VAW_VAE_PATH", ""),
        f"pretrained/sd-vae-ft-{name}/diffusion_pytorch_model.safetensors",
        f"pretrained/sd-vae-ft-{name}/diffusion_pytorch_model.bin",
        f"pretrained/sd-vae-ft-{name}.safetensors",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.numpy() for k, v in sd.items()}


def _conv(sd, prefix):
    return {
        "kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _dense_from_1x1(sd, prefix):
    w = sd[f"{prefix}.weight"]
    if w.ndim == 4:  # 1x1 conv -> dense
        w = w[:, :, 0, 0]
    return {"kernel": np.transpose(w, (1, 0)), "bias": sd[f"{prefix}.bias"]}


def _gn_params(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resnet(sd, prefix, has_shortcut):
    out = {
        "GroupNorm_0": _gn_params(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "GroupNorm_1": _gn_params(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if has_shortcut:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    return out


def _attn(sd, prefix):
    return {
        "GroupNorm_0": _gn_params(sd, f"{prefix}.group_norm"),
        "to_q": _dense_from_1x1(sd, f"{prefix}.to_q"),
        "to_k": _dense_from_1x1(sd, f"{prefix}.to_k"),
        "to_v": _dense_from_1x1(sd, f"{prefix}.to_v"),
        "to_out": _dense_from_1x1(sd, f"{prefix}.to_out.0"),
    }


def convert_diffusers_vae(sd: Dict[str, np.ndarray],
                          channel_mults=(1, 2, 4, 4),
                          num_res_blocks=2, base=128) -> Dict:
    """diffusers AutoencoderKL state dict -> Flax params for models.vae."""
    enc: Dict = {}
    enc["conv_in"] = _conv(sd, "encoder.conv_in")
    ch = base
    for i, mult in enumerate(channel_mults):
        out_ch = base * mult
        for j in range(num_res_blocks):
            has_short = (j == 0 and ch != out_ch)
            enc[f"down_{i}_block_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", has_short
            )
        ch = out_ch
        if i != len(channel_mults) - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    enc["mid_block_1"] = _resnet(sd, "encoder.mid_block.resnets.0", False)
    enc["mid_attn"] = _attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_block_2"] = _resnet(sd, "encoder.mid_block.resnets.1", False)
    enc["GroupNorm_0"] = _gn_params(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")
    enc["quant_conv"] = _conv(sd, "quant_conv")

    dec: Dict = {}
    dec["post_quant_conv"] = _conv(sd, "post_quant_conv")
    dec["conv_in"] = _conv(sd, "decoder.conv_in")
    dec["mid_block_1"] = _resnet(sd, "decoder.mid_block.resnets.0", False)
    dec["mid_attn"] = _attn(sd, "decoder.mid_block.attentions.0")
    dec["mid_block_2"] = _resnet(sd, "decoder.mid_block.resnets.1", False)
    ch = base * channel_mults[-1]
    for i, mult in enumerate(reversed(channel_mults)):
        out_ch = base * mult
        for j in range(num_res_blocks + 1):
            has_short = (j == 0 and ch != out_ch)
            dec[f"up_{i}_block_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", has_short
            )
        ch = out_ch
        if i != len(channel_mults) - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    dec["GroupNorm_0"] = _gn_params(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    params = {"encoder": enc, "decoder": dec}
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_vae(name: str = "ema", dtype=jnp.float32):
    """Returns (model, params). Raises FileNotFoundError when no local
    checkpoint exists (zero egress)."""
    path = find_vae_checkpoint(name)
    if path is None:
        raise FileNotFoundError(
            f"sd-vae-ft-{name} checkpoint not found; set VAW_VAE_PATH or "
            f"place it under pretrained/sd-vae-ft-{name}/"
        )
    sd = _load_torch_state(path)
    params = convert_diffusers_vae(sd)
    model = AutoencoderKL(dtype=dtype)
    return model, {"params": params}


def load_vae_decoder(name: str = "ema", dtype=jnp.float32) -> Callable:
    """latents [N,h,w,4] (already divided by latent_scale by the caller,
    reference: tools/sampler.py:249-255) -> images [N,H,W,3] in [-1,1]."""
    model, variables = load_vae(name, dtype)

    @jax.jit
    def decode(z):
        return model.apply(variables, z, method=model.decode)

    return decode


def load_vae_encoder(name: str = "ema", dtype=jnp.float32) -> Callable:
    """images [-1,1] -> [mean | std] moment stacks (the HDF5 layout,
    reference: preprocessing/encode_latent.py:95-100)."""
    model, variables = load_vae(name, dtype)

    @jax.jit
    def encode(x):
        moments = model.apply(variables, x, method=model.encode)
        return AutoencoderKL.moments_to_mean_std(moments)

    return encode
