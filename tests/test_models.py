"""Backbone contract tests: every model family maps
(x [N,H,W,C], t [N], y [N]?) -> [N,H,W,C_out] with C_out = 2C when
learn_sigma (formalizing the reference's __main__ smoke blocks,
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.models import (
    ADM_32,
    DiT_S,
    EncoderUNetModel,
    UViT_S,
    ViT_S,
)

B = 2


def _init_and_apply(model, x, t, y=None, **kwargs):
    rngs = {"params": jax.random.key(0), "label_dropout": jax.random.key(1),
            "dropout": jax.random.key(2)}
    args = (x, t) if y is None else (x, t, y)
    variables = model.init(rngs, *args, **kwargs)
    out = model.apply(variables, *args, **kwargs)
    return variables, out


def test_dit_forward_shapes_and_repa_tap():
    model = DiT_S(image_size=16, patch_size=2, in_channels=4,
                  class_dropout_prob=0.1, num_classes=10, learn_sigma=False,
                  learn_align=True, encoder_depth=4, z_dims=32)
    x = jnp.ones((B, 16, 16, 4))
    t = jnp.array([0, 999])
    y = jnp.array([1, 2])
    variables, (out, zs) = _init_and_apply(model, x, t, y)
    assert out.shape == (B, 16, 16, 4)
    assert zs.shape == (B, 64, 32)
    # adaLN-Zero: untrained output must be exactly zero (zero-init final head).
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dit_learn_sigma_channels():
    model = DiT_S(image_size=16, patch_size=2, in_channels=3,
                  class_dropout_prob=0.0, num_classes=0, learn_sigma=True)
    x = jnp.ones((B, 16, 16, 3))
    t = jnp.array([5.0, 10.0])
    _, (out, zs) = _init_and_apply(model, x, t)
    assert out.shape == (B, 16, 16, 6)
    assert zs is None


def test_unet_forward_shapes():
    model = ADM_32(num_classes=10, in_channels=3, class_cond=True)
    x = jnp.ones((B, 32, 32, 3))
    t = jnp.array([0, 999])
    y = jnp.array([3, 7])
    _, out = _init_and_apply(model, x, t, y)
    assert out.shape == (B, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_unconditional_and_learn_sigma():
    model = ADM_32(num_classes=10, in_channels=3, learn_sigma=True,
                   class_cond=False)
    x = jnp.ones((B, 32, 32, 3))
    t = jnp.array([1, 2])
    _, out = _init_and_apply(model, x, t)
    assert out.shape == (B, 32, 32, 6)


def test_vit_forward_shapes():
    model = ViT_S(image_size=16, patch_size=4, num_classes=10, in_channels=3,
                  learn_sigma=False, drop_rate=0.0, drop_label_prob=0.1)
    x = jnp.ones((B, 16, 16, 3))
    t = jnp.array([0, 3999])
    y = jnp.array([0, 9])
    _, out = _init_and_apply(model, x, t, y)
    assert out.shape == (B, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_uvit_forward_shapes():
    model = UViT_S(image_size=16, patch_size=4, in_channels=3, num_classes=10,
                   class_dropout_prob=0.1)
    x = jnp.ones((B, 16, 16, 3))
    t = jnp.array([0, 999])
    y = jnp.array([1, 2])
    _, out = _init_and_apply(model, x, t, y)
    assert out.shape == (B, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial"])
def test_encoder_unet_pools(pool):
    model = EncoderUNetModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_head_channels=16, pool=pool,
    )
    x = jnp.ones((B, 32, 32, 3))
    t = jnp.array([0, 100])
    _, out = _init_and_apply(model, x, t)
    assert out.shape == (B, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_label_dropout_uses_null_class():
    """force_drop_ids must route all-dropped labels to the null embedding row."""
    model = DiT_S(image_size=16, patch_size=2, in_channels=3,
                  class_dropout_prob=0.1, num_classes=10, learn_sigma=False)
    x = jax.random.normal(jax.random.key(0), (B, 16, 16, 3))
    t = jnp.array([10.0, 20.0])
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, x, t, jnp.array([0, 1]))
    out_null, _ = model.apply(variables, x, t, jnp.array([0, 1]),
                              force_drop_ids=jnp.array([1, 1]))
    out_nullother, _ = model.apply(variables, x, t, jnp.array([5, 7]),
                                   force_drop_ids=jnp.array([1, 1]))
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_nullother))


def test_bf16_compute_dtype():
    model = DiT_S(image_size=16, patch_size=2, in_channels=3,
                  class_dropout_prob=0.0, num_classes=0, learn_sigma=False,
                  dtype=jnp.bfloat16)
    x = jnp.ones((B, 16, 16, 3))
    t = jnp.array([5.0, 9.0])
    variables, (out, _) = _init_and_apply(model, x, t)
    # Params stay f32; output is cast back to f32.
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    assert out.dtype == jnp.float32


def test_groupnorm32_bf16_matches_f32_reference():
    """bf16 GroupNorm with f32 statistics must track the full-f32 result
    within bf16 output precision (the reference computes wholly in f32,
    tools/nn.py:16-19)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaw_tpu.models.layers import GroupNorm32

    rs = np.random.RandomState(0)
    x = (rs.randn(2, 8, 8, 64) * 50.0).astype(np.float32)  # large scale
    gn = GroupNorm32(num_groups=32)
    params = gn.init(jax.random.key(0), jnp.asarray(x))
    out_f32 = gn.apply(params, jnp.asarray(x, jnp.float32))
    out_bf16 = gn.apply(params, jnp.asarray(x, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32),
        atol=0.05, rtol=0.05,
    )
