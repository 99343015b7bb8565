"""Loader for the reference implementation at /root/reference (CPU torch).

The reference imports `timm` and `torchdiffeq`, neither of which is in this
image. Both are stubbed here with faithful minimal implementations of the
exact symbols the reference uses:

- timm.models.vision_transformer.{Attention, Mlp, PatchEmbed} — the standard
  timm layers (timm 0.3.2 math, which tools/timm.py in the reference vendors
  for trunc_normal_/DropPath/Mlp; Attention/PatchEmbed follow the same
  release). Used only by reference models/dit.py:17.
- timm.models.layers.{drop_path, to_2tuple, trunc_normal_} and
  timm.models.registry.register_model — used by reference models/vit.py:14-15.
- torchdiffeq.odeint — referenced by tools/gaussian_diffusion.py:10; only the
  (buggy, see SURVEY.md §7) ode_sample path calls it, which no parity test
  exercises, so the stub raises.

These stubs define the *reference semantics* for the differential parity
tests in test_reference_parity.py; they are torch code matching public timm,
not part of the TPU framework.
"""

from __future__ import annotations

import importlib
import sys
import types

import torch
import torch.nn as nn

try:
    from _timm_vit import (
        Attention as _TimmAttention,
        Mlp as _TimmMlp,
        PatchEmbed as _TimmPatchEmbed,
        VisionTransformer as _TimmVisionTransformer,
    )
except ImportError:
    from tests._timm_vit import (
        Attention as _TimmAttention,
        Mlp as _TimmMlp,
        PatchEmbed as _TimmPatchEmbed,
        VisionTransformer as _TimmVisionTransformer,
    )

REFERENCE_ROOT = "/root/reference"


def _to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def _install_stubs():
    if "timm" in sys.modules:
        return
    # Reuse the reference's own vendored timm 0.3.2 pieces where it has them.
    sys.path.insert(0, REFERENCE_ROOT)
    ref_timm = importlib.import_module("tools.timm")

    import importlib.machinery as _machinery

    def _mod(name):
        m = types.ModuleType(name)
        # transformers probes dependencies via importlib.util.find_spec;
        # a stub without __spec__ raises "<name>.__spec__ is None"
        m.__spec__ = _machinery.ModuleSpec(name, loader=None)
        return m

    timm = _mod("timm")
    models = _mod("timm.models")
    vit_mod = _mod("timm.models.vision_transformer")
    vit_mod.Attention = _TimmAttention
    vit_mod.Mlp = _TimmMlp
    vit_mod.PatchEmbed = _TimmPatchEmbed
    layers = _mod("timm.models.layers")
    layers.drop_path = ref_timm.drop_path
    layers.to_2tuple = _to_2tuple
    layers.trunc_normal_ = ref_timm.trunc_normal_
    layers.DropPath = ref_timm.DropPath
    registry = _mod("timm.models.registry")
    registry.register_model = lambda fn: fn
    models.vision_transformer = vit_mod
    models.layers = layers
    models.registry = registry
    timm.models = models
    for name, mod in (
        ("timm", timm),
        ("timm.models", models),
        ("timm.models.vision_transformer", vit_mod),
        ("timm.models.layers", layers),
        ("timm.models.registry", registry),
    ):
        sys.modules[name] = mod

    # timm.layers.helpers.to_2tuple (encoders/mocov3_vit.py:13) and a
    # VisionTransformer base (mocov3_vit.py:14, mae_vit.py:17). The full
    # faithful VisionTransformer lives in _timm_vit.py (encoder parity
    # tests); import lazily so plain model parity doesn't need it.
    layers_pkg = _mod("timm.layers")
    helpers = _mod("timm.layers.helpers")
    helpers.to_2tuple = _to_2tuple
    layers_pkg.helpers = helpers
    # timm.layers.pos_embed.resample_abs_pos_embed (used by the reference
    # encoder loader, tools/encoders.py:33,117,150,218): public timm ≥0.9
    # semantics — split prefix tokens, bicubic antialiased F.interpolate
    # of the grid part in float32, concat back.
    pos_embed_mod = _mod("timm.layers.pos_embed")

    def _resample_abs_pos_embed(posemb, new_size, old_size=None,
                                num_prefix_tokens=1, interpolation="bicubic",
                                antialias=True, verbose=False):
        num_pos = posemb.shape[1] - num_prefix_tokens
        if old_size is None:
            hw = int(num_pos ** 0.5)
            old_size = (hw, hw)
        if tuple(new_size) == tuple(old_size):
            return posemb
        prefix = posemb[:, :num_prefix_tokens]
        grid = posemb[:, num_prefix_tokens:]
        embed_dim = posemb.shape[-1]
        orig_dtype = grid.dtype
        grid = grid.float().reshape(1, old_size[0], old_size[1], -1)
        grid = grid.permute(0, 3, 1, 2)
        grid = torch.nn.functional.interpolate(
            grid, size=tuple(new_size), mode=interpolation,
            antialias=antialias)
        grid = grid.permute(0, 2, 3, 1).reshape(1, -1, embed_dim)
        grid = grid.to(orig_dtype)
        return torch.cat([prefix, grid], dim=1)

    pos_embed_mod.resample_abs_pos_embed = _resample_abs_pos_embed
    layers_pkg.pos_embed = pos_embed_mod
    timm.layers = layers_pkg
    sys.modules["timm.layers"] = layers_pkg
    sys.modules["timm.layers.helpers"] = helpers
    sys.modules["timm.layers.pos_embed"] = pos_embed_mod
    vit_mod.VisionTransformer = _TimmVisionTransformer
    vit_mod._cfg = lambda url="", **kwargs: {"url": url, **kwargs}

    # timm.data constants (used by tools/align_utils.py:3).
    data_mod = _mod("timm.data")
    data_mod.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data_mod.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm.data = data_mod
    sys.modules["timm.data"] = data_mod

    tde = _mod("torchdiffeq")

    def _odeint(*args, **kwargs):
        raise RuntimeError(
            "torchdiffeq stubbed for parity tests (reference ode_sample is "
            "known-broken: undefined self.rtol/self.atol, SURVEY.md §7)"
        )

    tde.odeint = _odeint
    sys.modules["torchdiffeq"] = tde

    # torchvision / diffusers: pulled in by tools/utils.py:16 and
    # tools/sampler.py:4 at import time but irrelevant to numerics parity
    # (sample-grid IO and the SD VAE loader). Raising attr stubs.
    def _unavailable(name):
        def _raise(*args, **kwargs):
            raise RuntimeError(f"{name} stubbed for parity tests")

        return _raise

    tv = _mod("torchvision")
    tv.__path__ = []  # mark as package so submodule imports resolve
    tv_utils = _mod("torchvision.utils")
    tv_utils.make_grid = _unavailable("torchvision.utils.make_grid")
    tv_utils.save_image = _unavailable("torchvision.utils.save_image")
    tv_transforms = _mod("torchvision.transforms")
    tv_transforms.Normalize = _unavailable("torchvision.transforms.Normalize")
    tv_transforms.Compose = _unavailable("torchvision.transforms.Compose")
    tv_transforms.Resize = _unavailable("torchvision.transforms.Resize")
    tv_datasets = _mod("torchvision.datasets")
    tv_ds_utils = _mod("torchvision.datasets.utils")
    tv_ds_utils.download_url = _unavailable("torchvision download_url")
    tv_datasets.utils = tv_ds_utils
    tv_models = _mod("torchvision.models")
    tv.utils = tv_utils
    tv.transforms = tv_transforms
    tv.datasets = tv_datasets
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tv_utils
    sys.modules["torchvision.transforms"] = tv_transforms
    sys.modules["torchvision.datasets"] = tv_datasets
    sys.modules["torchvision.datasets.utils"] = tv_ds_utils
    sys.modules["torchvision.models"] = tv_models

    clip_mod = _mod("clip")
    clip_mod.load = _unavailable("clip.load")
    sys.modules["clip"] = clip_mod

    df = _mod("diffusers")
    df_models = _mod("diffusers.models")
    df_models.AutoencoderKL = _unavailable("diffusers AutoencoderKL")
    df.models = df_models
    sys.modules["diffusers"] = df
    sys.modules["diffusers.models"] = df_models


def load_reference(module: str):
    """Import a reference module (e.g. 'tools.gaussian_diffusion') with the
    timm/torchdiffeq stubs installed. Returns the module."""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(module)


def state_dict_numpy(model: nn.Module):
    """torch state_dict -> {name: float32 numpy array}."""
    return {
        k: v.detach().to(torch.float32).numpy()
        for k, v in model.state_dict().items()
    }
