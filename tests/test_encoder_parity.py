"""Differential parity: FeatureViT + converters vs the reference teacher
encoder classes (encoders/mocov3_vit.py, mae_vit.py, jepa.py, clip_vit.py)
instantiated on CPU torch, including the load-time pos-embed resampling the
reference applies for 256-px inputs (tools/encoders.py:32-35, 217-225).

These tests instantiate the *reference torch classes* with random weights,
convert the state dicts with the vaw_tpu loaders, and assert forward
outputs agree — the proof obligation VERDICT r1 item 6 asked for.
"""

import sys
from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

sys.path.insert(0, "tests")
from _reference import load_reference, state_dict_numpy  # noqa: E402

from vaw_tpu.encoders import (  # noqa: E402
    FeatureViT,
    convert_clip_vit,
    convert_timm_vit,
    mocov3_sincos_pos_embed,
    resample_pos_embed,
    runtime_image_size,
)

ATOL = 2e-4


def _perturb(model: nn.Module, seed: int = 0) -> None:
    """Randomize away from degenerate inits (LN scale 1/bias 0) so parity
    failures cannot hide behind identity transforms."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))


def _torch_image(key: int, size: int) -> np.ndarray:
    rs = np.random.RandomState(key)
    return rs.randn(2, 3, size, size).astype(np.float32)


@pytest.mark.parametrize("src,dst", [(14, 16), (37, 16), (16, 14)])
def test_resample_pos_embed_matches_torch_bicubic(src, dst):
    """Our numpy bicubic == torch F.interpolate(mode='bicubic',
    antialias=True) — the kernel inside timm resample_abs_pos_embed."""
    rs = np.random.RandomState(0)
    pos = rs.randn(1, 1 + src * src, 24).astype(np.float32)
    ours = resample_pos_embed(pos, dst)

    grid = torch.tensor(pos[:, 1:]).reshape(1, src, src, 24).permute(
        0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        grid, size=(dst, dst), mode="bicubic", antialias=True)
    ref = ref.permute(0, 2, 3, 1).reshape(1, dst * dst, 24).numpy()
    np.testing.assert_allclose(ours[:, 1:], ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ours[:, :1], pos[:, :1])  # cls preserved


def test_mocov3_sincos_table_matches_reference():
    moco = load_reference("encoders.mocov3_vit")
    model = moco.VisionTransformerMoCo(
        img_size=256, patch_size=16, embed_dim=64, depth=1, num_heads=4,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), num_classes=0)
    ours = mocov3_sincos_pos_embed(64, 16)
    np.testing.assert_allclose(
        ours, model.pos_embed.detach().numpy(), atol=1e-6)


def test_mocov3_parity_256px_with_224_checkpoint():
    """Full mocov3 flow at 256 px: simulate a 224-grid checkpoint, run the
    reference's own fix_mocov3_state_dict (prefix strip + resample to
    [16,16], tools/encoders.py:13-36), and assert FeatureViT on the raw
    state dict reproduces the torch forward."""
    moco = load_reference("encoders.mocov3_vit")
    enc = load_reference("tools.encoders")
    model = moco.VisionTransformerMoCo(
        img_size=256, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), num_classes=0)
    _perturb(model)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(7)
    sd["pos_embed"] = 0.02 * torch.randn(1, 1 + 14 * 14, 64, generator=g)
    raw = {k: v.clone() for k, v in sd.items()}

    prefixed = {"module.base_encoder." + k: v.clone() for k, v in sd.items()}
    fixed = enc.fix_mocov3_state_dict(prefixed)
    model.load_state_dict(fixed, strict=True)
    model.eval()
    x = _torch_image(1, 256)
    with torch.no_grad():
        ref_out = model.forward_features(torch.tensor(x)).numpy()

    ours = FeatureViT(image_size=256, patch_size=16, embed_dim=64, depth=2,
                      num_heads=4, fixed_sincos_pos=True)
    params = convert_timm_vit(
        {k: v.numpy() for k, v in raw.items()}, depth=2, target_grid=16)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert out.shape == ref_out.shape == (2, 257, 64)
    np.testing.assert_allclose(out, ref_out, atol=ATOL, rtol=1e-4)


def test_mae_parity_256px_with_224_checkpoint():
    """MAE at 256 px: reference resamples the checkpoint pos-embed to
    [16,16] (tools/encoders.py:217-225) and its forward_features strips the
    cls token WITHOUT applying the final norm (encoders/mae_vit.py:34-48)."""
    mae = load_reference("encoders.mae_vit")
    import timm.layers.pos_embed as tpe

    model = mae.VisionTransformer(
        num_classes=0, img_size=256, patch_size=16, embed_dim=64, depth=2,
        num_heads=4, mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6))
    _perturb(model, seed=1)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(8)
    sd["pos_embed"] = 0.02 * torch.randn(1, 1 + 14 * 14, 64, generator=g)
    raw = {k: v.clone() for k, v in sd.items()}

    sd["pos_embed"] = tpe.resample_abs_pos_embed(sd["pos_embed"], [16, 16])
    model.load_state_dict(sd, strict=True)
    model.eval()
    x = _torch_image(2, 256)
    with torch.no_grad():
        ref_out = model.forward_features(torch.tensor(x)).numpy()

    ours = FeatureViT(image_size=256, patch_size=16, embed_dim=64, depth=2,
                      num_heads=4, final_norm=False)
    params = convert_timm_vit(
        {k: v.numpy() for k, v in raw.items()}, depth=2,
        final_norm=False, target_grid=16)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert ref_out.shape == (2, 256, 64)  # cls stripped by the reference
    np.testing.assert_allclose(out[:, 1:], ref_out, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("size", [224, 256])
def test_jepa_parity(size):
    """I-JEPA (no cls token, sincos pos, final norm) — the reference feeds
    it 224-resized pixels at both training resolutions
    (tools/align_utils.py:36-39); jepa is exercised at its native grid."""
    eff = runtime_image_size("jepa", size)
    assert eff == 224
    jepa = load_reference("encoders.jepa")
    model = jepa.VisionTransformer(
        img_size=[eff], patch_size=14, embed_dim=64,
        predictor_embed_dim=32, depth=2, num_heads=4)
    _perturb(model, seed=2)
    model.eval()
    x = _torch_image(3, eff)
    with torch.no_grad():
        ref_out = model(torch.tensor(x)).numpy()

    ours = FeatureViT(image_size=eff, patch_size=14, embed_dim=64, depth=2,
                      num_heads=4, use_cls_token=False)
    params = convert_timm_vit(
        state_dict_numpy(model), depth=2, use_cls_token=False,
        target_grid=eff // 14)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert out.shape == ref_out.shape == (2, (eff // 14) ** 2, 64)
    np.testing.assert_allclose(out, ref_out, atol=ATOL, rtol=1e-4)


class _ClipVisual(nn.Module):
    """Minimal CLIP visual tower with the exact attribute surface the
    reference wrapper reads (encoders/clip_vit.py:208-230), built from the
    reference's own Transformer/LayerNorm classes so the block math
    (nn.MultiheadAttention, QuickGELU, eps=1e-5) is the reference's."""

    def __init__(self, clip_vit, res, patch, width, layers, heads):
        super().__init__()
        scale = width ** -0.5
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch, stride=patch,
                               bias=False)
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn((res // patch) ** 2 + 1, width))
        self.ln_pre = clip_vit.LayerNorm(width)
        self.transformer = clip_vit.Transformer(width, layers, heads)


@pytest.mark.parametrize("size", [224, 256])
def test_clip_parity(size):
    """CLIP wrapper parity: ln_pre, quick-GELU MLP, eps=1e-5, cls stripped,
    NO final norm (clip_vit.py:208-230); input resized to 224 for both
    resolutions (align_utils.py:21-24)."""
    eff = runtime_image_size("clip", size)
    assert eff == 224
    clip_vit = load_reference("encoders.clip_vit")
    torch.manual_seed(4)
    visual = _ClipVisual(clip_vit, res=eff, patch=14, width=64, layers=2,
                         heads=4)
    _perturb(visual, seed=4)
    model = clip_vit.UpdatedVisionTransformer(visual)
    model.eval()
    x = _torch_image(5, eff)
    with torch.no_grad():
        ref_out = model(torch.tensor(x)).numpy()

    ours = FeatureViT(image_size=eff, patch_size=14, embed_dim=64, depth=2,
                      num_heads=4, pre_norm=True, final_norm=False,
                      quick_gelu=True, norm_eps=1e-5)
    params = convert_clip_vit(state_dict_numpy(visual), depth=2,
                              target_grid=eff // 14)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert ref_out.shape == (2, (eff // 14) ** 2, 64)
    np.testing.assert_allclose(out[:, 1:], ref_out, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("resolution", [256, 512])
def test_dinov2_parity(resolution):
    """DINOv2 vs a faithful stub of the torch.hub DinoVisionTransformer
    (tests/_dinov2.py): LayerScale blocks, x_norm_patchtokens dict output,
    and the reference's load-time pos-embed resample from the hub grid
    (37x37 at 518 px) to 16*(res//256) (tools/encoders.py:106-125)."""
    from _dinov2 import DinoVisionTransformer
    import timm.layers.pos_embed as tpe

    eff = runtime_image_size("dinov2", resolution)
    assert eff == 224 * (resolution // 256)
    grid = eff // 14
    model = DinoVisionTransformer(img_size=eff, patch_size=14, embed_dim=64,
                                  depth=2, num_heads=4)
    _perturb(model, seed=6)
    sd = model.state_dict()
    # hub checkpoint table: 37x37 grid (518-px pretraining)
    g = torch.Generator().manual_seed(13)
    raw = {k: v.clone() for k, v in sd.items()}
    raw["pos_embed"] = 0.02 * torch.randn(1, 1 + 37 * 37, 64, generator=g)
    sd["pos_embed"] = tpe.resample_abs_pos_embed(
        raw["pos_embed"], [grid, grid])
    model.load_state_dict(sd, strict=True)
    model.eval()
    x = _torch_image(7, eff)
    with torch.no_grad():
        ref = model.forward_features(torch.tensor(x))

    ours = FeatureViT(image_size=eff, patch_size=14, embed_dim=64, depth=2,
                      num_heads=4, layer_scale=True)
    params = convert_timm_vit(state_dict_numpy(model) | {
        "pos_embed": raw["pos_embed"].numpy()}, depth=2, layer_scale=True,
        target_grid=grid)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert out.shape == (2, 1 + grid * grid, 64)
    np.testing.assert_allclose(out[:, 0], ref["x_norm_clstoken"].numpy(),
                               atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(out[:, 1:],
                               ref["x_norm_patchtokens"].numpy(),
                               atol=ATOL, rtol=1e-4)


def test_dinov2reg_parity():
    """dinov2-reg: 4 register tokens inserted AFTER the pos-embed add
    (no pos rows of their own); x_norm_patchtokens drops cls AND
    registers (hub `_reg` variants, tools/encoders.py:106)."""
    from _dinov2 import DinoVisionTransformer

    model = DinoVisionTransformer(img_size=224, patch_size=14, embed_dim=64,
                                  depth=2, num_heads=4,
                                  num_register_tokens=4)
    _perturb(model, seed=9)
    model.eval()
    x = _torch_image(8, 224)
    with torch.no_grad():
        ref = model.forward_features(torch.tensor(x))
    assert ref["x_norm_regtokens"].shape == (2, 4, 64)

    ours = FeatureViT(image_size=224, patch_size=14, embed_dim=64, depth=2,
                      num_heads=4, layer_scale=True, num_register_tokens=4)
    params = convert_timm_vit(state_dict_numpy(model), depth=2,
                              layer_scale=True, target_grid=16)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert out.shape == (2, 1 + 4 + 256, 64)
    np.testing.assert_allclose(out[:, 1:5], ref["x_norm_regtokens"].numpy(),
                               atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(out[:, 5:], ref["x_norm_patchtokens"].numpy(),
                               atol=ATOL, rtol=1e-4)


def test_dinov1_parity_256px_with_224_checkpoint():
    """DINOv1 at 256 px: the reference resamples the 14x14 checkpoint table
    to [16,16] at load (tools/encoders.py:149-155) and exposes
    forward_features = forward — i.e. the final-norm CLS TOKEN as a [B, D]
    global feature (facebookresearch/dino forward returns x[:, 0]). The
    full token sequence is compared too: the TPU align glue keeps patch
    tokens (a [B, D] feature cannot broadcast against the [B, T, D] REPA
    tap in the reference's own align loss — compute_align_loss would
    raise — so patch tokens are the usable superset)."""
    from _dinov2 import Dinov1VisionTransformer
    import timm.layers.pos_embed as tpe

    model = Dinov1VisionTransformer(img_size=256, patch_size=16,
                                    embed_dim=64, depth=2, num_heads=4)
    _perturb(model, seed=10)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(17)
    raw = {k: v.clone() for k, v in sd.items()}
    raw["pos_embed"] = 0.02 * torch.randn(1, 1 + 14 * 14, 64, generator=g)
    sd["pos_embed"] = tpe.resample_abs_pos_embed(raw["pos_embed"], [16, 16])
    model.load_state_dict(sd, strict=True)
    model.eval()
    x = _torch_image(9, 256)
    with torch.no_grad():
        ref_cls = model(torch.tensor(x)).numpy()
        ref_all = model._all_tokens(torch.tensor(x)).numpy()

    ours = FeatureViT(image_size=256, patch_size=16, embed_dim=64, depth=2,
                      num_heads=4)
    params = convert_timm_vit(state_dict_numpy(model) | {
        "pos_embed": raw["pos_embed"].numpy()}, depth=2, target_grid=16)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert ref_cls.shape == (2, 64)  # the reference-exposed feature shape
    np.testing.assert_allclose(out[:, 0], ref_cls, atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(out, ref_all, atol=ATOL, rtol=1e-4)


def test_dinov2_register_tokens_forward():
    """dinov2reg: 4 register tokens ride between cls and patches with no
    pos-embed rows (reference hub `_reg` variants, tools/encoders.py:106);
    the align glue strips cls+registers."""
    from vaw_tpu.encoders import get_feature, make_teacher
    import jax

    model = make_teacher("dinov2reg", "s", image_size=28)
    x = jnp.ones((2, 28, 28, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1 + 4 + 4, 384)

    tokens = jnp.asarray(out)
    feats = get_feature("dinov2reg-vit-s", jnp.ones((2, 28, 28, 3)) * 255.0,
                        lambda px: tokens)
    assert feats.shape == (2, 4, 384)  # cls + 4 registers stripped


def test_mocov3_runtime_grid_is_native():
    assert runtime_image_size("mocov3", 256) == 256
    assert runtime_image_size("mae", 256) == 256
    assert runtime_image_size("dinov2", 256) == 224
    assert runtime_image_size("dinov2", 512) == 448
    assert runtime_image_size("clip", 512) == 448


@pytest.mark.slow
def test_mae_parity_full_size_vit_base():
    """Full-size MAE ViT-B/16 at 256 px (the real teacher configuration,
    reference tools/encoders.py:191-199) — slow-marked; the fast suite
    covers the same flow at depth 2."""
    mae = load_reference("encoders.mae_vit")
    import timm.layers.pos_embed as tpe

    model = mae.vit_base_patch16(img_size=256)
    _perturb(model, seed=3)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(11)
    sd["pos_embed"] = 0.02 * torch.randn(1, 1 + 14 * 14, 768, generator=g)
    raw = {k: v.clone() for k, v in sd.items()}
    sd["pos_embed"] = tpe.resample_abs_pos_embed(sd["pos_embed"], [16, 16])
    model.load_state_dict(sd, strict=True)
    model.eval()
    x = _torch_image(12, 256)[:1]
    with torch.no_grad():
        ref_out = model.forward_features(torch.tensor(x)).numpy()

    from vaw_tpu.encoders import make_teacher

    ours = make_teacher("mae", "b", image_size=256)
    params = convert_timm_vit(
        {k: v.numpy() for k, v in raw.items()}, depth=12,
        final_norm=False, target_grid=16)
    out = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(out[:, 1:], ref_out, atol=5e-4, rtol=1e-3)
