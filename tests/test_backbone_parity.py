"""Backbone forward parity: reference torch models (random init) -> torch->
Flax weight conversion (vaw_tpu.models.convert) -> outputs must agree.

Covers DiT (reference models/dit.py), ADM UNet + EncoderUNet
(models/unet.py), ViT (models/vit.py), and U-ViT (models/uvit.py). Zero-
initialized tensors (adaLN projections, final layers) are re-randomized
before conversion so the comparison exercises every weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from _reference import load_reference, state_dict_numpy


def randomize_zeros(model: torch.nn.Module, seed: int = 0) -> None:
    """Fill zero-initialized parameters with small random values so parity
    tests exercise those weights too."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.requires_grad and float(p.abs().max()) == 0.0:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


# --------------------------------------------------------------------------
# DiT
# --------------------------------------------------------------------------

DIT_KW = dict(image_size=16, patch_size=2, in_channels=4, hidden_size=64,
              depth=3, num_heads=2, class_dropout_prob=0.1, num_classes=10)


@pytest.mark.parametrize("learn_sigma,learn_align", [
    (False, False), (True, False), (True, True),
])
def test_dit_forward_parity(learn_sigma, learn_align):
    ref_dit = load_reference("models.dit")
    from vaw_tpu.models.convert import convert_dit
    from vaw_tpu.models.dit import DiT

    kw = dict(DIT_KW, learn_sigma=learn_sigma, learn_align=learn_align,
              encoder_depth=2, z_dims=32, projector_dim=48)
    torch.manual_seed(0)
    tm = ref_dit.DiT(**kw)
    randomize_zeros(tm)
    tm.eval()

    jm = DiT(**kw)
    target = jm.init(
        {"params": jax.random.key(0)}, jnp.zeros((2, 16, 16, 4)),
        jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))["params"]
    params = convert_dit(state_dict_numpy(tm), target)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([5.0, 500.0], np.float32)
    y = np.array([1, 7])

    with torch.no_grad():
        t_out, t_zs = tm(nchw(x), torch.from_numpy(t), torch.from_numpy(y))
    j_out, j_zs = jm.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(t), jnp.asarray(y))

    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out),
                               rtol=1e-4, atol=1e-5)
    if learn_align:
        np.testing.assert_allclose(np.asarray(j_zs), t_zs.numpy(),
                                   rtol=1e-4, atol=1e-5)
    else:
        assert t_zs is None and j_zs is None


# --------------------------------------------------------------------------
# ViT (time/class-token BEiT-style)
# --------------------------------------------------------------------------

VIT_BASE = dict(image_size=16, patch_size=4, in_channels=3, embed_dim=48,
                depth=3, num_heads=4, mlp_ratio=4.0, qkv_bias=True,
                num_steps=1000)


@pytest.mark.parametrize("case", [
    dict(num_classes=0, use_abs_pos_emb=True, use_mean_pooling=True),
    dict(num_classes=10, drop_label_prob=0.1, use_shared_rel_pos_bias=True,
         init_values=0.1, use_mean_pooling=False, use_conv_last=True,
         learn_sigma=True),
    dict(num_classes=0, use_shared_rel_pos_bias=True, use_abs_pos_emb=False),
], ids=["uncond-abs", "cond-relpos-gamma-conv", "uncond-relpos-only"])
def test_vit_forward_parity(case):
    ref_vit = load_reference("models.vit")
    from vaw_tpu.models.convert import convert_vit
    from vaw_tpu.models.vit import ViT

    kw = dict(VIT_BASE, **case)
    torch.manual_seed(3)
    tm = ref_vit.ViT(**kw)
    randomize_zeros(tm, seed=3)
    tm.eval()

    jm = ViT(**kw)
    y0 = (jnp.zeros((2,), jnp.int32) if kw.get("num_classes") else None)
    target = jm.init({"params": jax.random.key(0)},
                     jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)), y0)["params"]
    params = convert_vit(state_dict_numpy(tm), target)

    rs = np.random.RandomState(3)
    x = rs.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([17, 801], np.int64)
    y = np.array([0, 9]) if kw.get("num_classes") else None

    with torch.no_grad():
        t_out = tm(nchw(x), torch.from_numpy(t),
                   y=torch.from_numpy(y) if y is not None else None)
    j_out = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(y) if y is not None else None)
    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out),
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# U-ViT (long skip connections)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("case", [
    dict(num_classes=-1, mlp_time_embed=False, conv=True, qkv_bias=False),
    dict(num_classes=10, class_dropout_prob=0.1, mlp_time_embed=True,
         conv=False, qkv_bias=True),
], ids=["uncond-conv", "cond-mlp-time"])
def test_uvit_forward_parity(case):
    ref_uvit = load_reference("models.uvit")
    from vaw_tpu.models.convert import convert_uvit
    from vaw_tpu.models.uvit import UViT

    kw = dict(image_size=16, patch_size=4, in_channels=3, embed_dim=48,
              depth=5, num_heads=4, mlp_ratio=4.0, skip=True, **case)
    torch.manual_seed(4)
    tm = ref_uvit.UViT(**kw)
    randomize_zeros(tm, seed=4)
    tm.eval()

    jm = UViT(**kw)
    y0 = (jnp.zeros((2,), jnp.int32) if kw["num_classes"] > 0 else None)
    target = jm.init({"params": jax.random.key(0)},
                     jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)), y0)["params"]
    params = convert_uvit(state_dict_numpy(tm), target, depth=kw["depth"],
                          mlp_time_embed=kw["mlp_time_embed"])

    rs = np.random.RandomState(4)
    x = rs.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([12.0, 700.0], np.float32)
    y = np.array([3, 8]) if kw["num_classes"] > 0 else None

    with torch.no_grad():
        t_out = tm(nchw(x), torch.from_numpy(t),
                   y=torch.from_numpy(y) if y is not None else None)
    j_out = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(y) if y is not None else None)
    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out),
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# ADM UNet + EncoderUNet
# --------------------------------------------------------------------------

UNET_BASE = dict(image_size=16, in_channels=3, model_channels=32,
                 num_res_blocks=1, attention_resolutions=(2,),
                 channel_mult=(1, 2))


@pytest.mark.parametrize("case", [
    pytest.param(
        dict(num_classes=10, drop_label_prob=0.1, use_scale_shift_norm=True,
             resblock_updown=True, num_head_channels=16, num_heads=1,
             out_mult=2),
        marks=pytest.mark.slow),
    dict(num_classes=0, use_scale_shift_norm=False, resblock_updown=False,
         conv_resample=True, num_heads=2, num_head_channels=-1, out_mult=1),
    dict(num_classes=0, use_scale_shift_norm=False, resblock_updown=True,
         num_head_channels=16, out_mult=1),
    dict(num_classes=0, use_scale_shift_norm=True, resblock_updown=False,
         conv_resample=True, num_head_channels=16, out_mult=1),
], ids=["cond-ssn-updown-headch", "uncond-plain-heads", "ssn-false-only",
        "updown-false-only"])
def test_unet_forward_parity(case):
    ref_unet = load_reference("models.unet")
    from vaw_tpu.models.convert import convert_unet
    from vaw_tpu.models.unet import UNetModel

    case = dict(case)
    out_mult = case.pop("out_mult")
    kw = dict(UNET_BASE, out_channels=3 * out_mult, **case)

    torch.manual_seed(0)
    tm = ref_unet.UNetModel(**kw)
    randomize_zeros(tm)
    tm.eval()

    jkw = dict(kw)
    jkw.pop("conv_resample", None)
    jm = UNetModel(**jkw)
    y0 = (jnp.zeros((2,), jnp.int32) if kw["num_classes"] else None)
    target = jm.init({"params": jax.random.key(0)},
                     jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)), y0)["params"]
    params = convert_unet(
        state_dict_numpy(tm), target, num_heads=kw.get("num_heads", 1),
        num_head_channels=kw.get("num_head_channels", -1))

    rs = np.random.RandomState(0)
    x = rs.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([7.0, 320.0], np.float32)
    y = np.array([2, 9]) if kw["num_classes"] else None

    with torch.no_grad():
        t_out = tm(nchw(x), torch.from_numpy(t),
                   y=torch.from_numpy(y) if y is not None else None)
    j_out = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(y) if y is not None else None)
    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                  "spatial_v2"])
def test_encoder_unet_parity(pool):
    ref_unet = load_reference("models.unet")
    from vaw_tpu.models.convert import convert_encoder_unet
    from vaw_tpu.models.unet import EncoderUNetModel

    kw = dict(UNET_BASE, out_channels=10, num_head_channels=16,
              use_scale_shift_norm=True, resblock_updown=True, pool=pool)
    torch.manual_seed(2)
    tm = ref_unet.EncoderUNetModel(**kw)
    randomize_zeros(tm, seed=2)
    tm.eval()

    jm = EncoderUNetModel(**kw)
    target = jm.init({"params": jax.random.key(0)},
                     jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)))["params"]
    params = convert_encoder_unet(
        state_dict_numpy(tm), target, num_head_channels=16, pool=pool)

    rs = np.random.RandomState(2)
    x = rs.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([3.0, 800.0], np.float32)

    with torch.no_grad():
        t_out = tm(nchw(x), torch.from_numpy(t))
    j_out = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dit_forward_with_cfg_parity():
    """The 3-channel CFG quirk (reference models/dit.py:282-298)."""
    ref_dit = load_reference("models.dit")
    from vaw_tpu.models.convert import convert_dit
    from vaw_tpu.models.dit import DiT

    kw = dict(DIT_KW, in_channels=4, learn_sigma=True)
    torch.manual_seed(1)
    tm = ref_dit.DiT(**kw)
    randomize_zeros(tm, seed=1)
    tm.eval()

    jm = DiT(**kw)
    target = jm.init(
        {"params": jax.random.key(0)}, jnp.zeros((4, 16, 16, 4)),
        jnp.zeros((4,)), jnp.zeros((4,), jnp.int32))["params"]
    params = convert_dit(state_dict_numpy(tm), target)

    rs = np.random.RandomState(1)
    x = rs.randn(4, 16, 16, 4).astype(np.float32)
    t = np.full((4,), 123.0, np.float32)
    y = np.array([1, 2, 10, 10])  # cond half + null-class half

    # Reference bug: forward_with_cfg indexes forward()'s (x, zs) tuple as a
    # tensor (models/dit.py:294, stale since the REPA tap changed forward's
    # return type) and crashes. Unwrap so its intended semantics run.
    tm.forward = lambda *a, **k: ref_dit.DiT.forward(tm, *a, **k)[0]
    with torch.no_grad():
        t_out = tm.forward_with_cfg(nchw(x), torch.from_numpy(t),
                                    torch.from_numpy(y), cfg_scale=3.0)
    j_out = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(y), cfg_scale=3.0,
                     method=jm.forward_with_cfg)
    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out),
                               rtol=1e-4, atol=1e-5)
