"""Teacher-encoder tests: every family's architecture builds and produces
token features; the timm converter is structurally validated against a
synthetic checkpoint; align preprocessing matches the reference recipe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.encoders import (
    FeatureViT,
    convert_timm_vit,
    get_feature,
    make_teacher,
    preprocess_raw_image,
)


@pytest.mark.parametrize("family,extra", [
    ("dinov2", 1), ("dinov1", 1), ("mae", 1), ("mocov3", 1), ("jepa", 0),
    ("clip", 1),
])
def test_teacher_families_forward(family, extra):
    probe = make_teacher(family, "s", image_size=28)
    # use a 2x2 patch grid at each family's native patch size
    size = probe.patch_size * 2
    model = make_teacher(family, "s", image_size=size)
    x = jnp.ones((2, size, size, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, extra + 4, 384)
    assert np.isfinite(np.asarray(out)).all()


def _fake_timm_sd(depth, dim, heads, patch, layer_scale=False):
    rs = np.random.RandomState(0)
    sd = {
        "patch_embed.proj.weight": rs.randn(dim, 3, patch, patch).astype(
            np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(dim, np.float32),
        "cls_token": rs.randn(1, 1, dim).astype(np.float32) * 0.02,
        "pos_embed": rs.randn(1, 1 + 4, dim).astype(np.float32) * 0.02,
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.attn.qkv.weight"] = rs.randn(3 * dim, dim).astype(
            np.float32) * 0.02
        sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{p}.attn.proj.weight"] = rs.randn(dim, dim).astype(
            np.float32) * 0.02
        sd[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rs.randn(4 * dim, dim).astype(
            np.float32) * 0.02
        sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rs.randn(dim, 4 * dim).astype(
            np.float32) * 0.02
        sd[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if layer_scale:
            sd[f"{p}.ls1.gamma"] = np.full(dim, 1e-5, np.float32)
            sd[f"{p}.ls2.gamma"] = np.full(dim, 1e-5, np.float32)
    return sd


@pytest.mark.parametrize("layer_scale", [False, True])
def test_timm_converter_structure(layer_scale):
    dim, depth, heads, patch = 32, 2, 2, 8
    model = FeatureViT(image_size=16, patch_size=patch, embed_dim=dim,
                       depth=depth, num_heads=heads,
                       layer_scale=layer_scale)
    sd = _fake_timm_sd(depth, dim, heads, patch, layer_scale)
    converted = convert_timm_vit(sd, depth=depth, layer_scale=layer_scale)

    x = jnp.ones((1, 16, 16, 3))
    init_params = model.init(jax.random.key(0), x)["params"]
    paths_init = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(init_params)
    }
    paths_conv = {
        jax.tree_util.keystr(p): np.asarray(l).shape
        for p, l in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert paths_init == paths_conv
    out = model.apply({"params": converted}, x)
    assert out.shape == (1, 5, dim)
    assert np.isfinite(np.asarray(out)).all()


def test_preprocess_normalization():
    x = jnp.full((1, 256, 256, 3), 127.5)
    out = preprocess_raw_image(x, "mae-vit-b")
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-4)
    # dinov2 resizes 256 -> 224
    out2 = preprocess_raw_image(x, "dinov2-vit-b")
    assert out2.shape == (1, 224, 224, 3)


def test_get_feature_strips_cls():
    model = FeatureViT(image_size=16, patch_size=8, embed_dim=32, depth=1,
                       num_heads=2)
    x = jnp.ones((2, 16, 16, 3))
    variables = model.init(jax.random.key(0), x)

    def enc(px):
        return model.apply(variables, px)

    # bypass preprocessing resize by using 16px "pixels"
    feats = get_feature("mocov3-vit-s", jnp.ones((2, 16, 16, 3)) * 255, enc)
    assert feats.shape == (2, 4, 32)  # cls stripped
