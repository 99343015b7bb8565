"""Generic frozen ViT feature extractor covering all REPA teacher families.

The reference vendors five separate ViT implementations
(reference: encoders/mocov3_vit.py, mae_vit.py, jepa.py, clip_vit.py and
DINOv1/v2 via torch.hub, tools/encoders.py:56-257). They are all the same
architecture modulo small deltas, so the TPU build uses ONE parameterized
Flax ViT:

  family      patch  deltas
  dinov2      14     LayerScale, cls token, final LayerNorm, patch tokens out
  dinov1      16     cls token, final LayerNorm
  mae         16     cls token, final LayerNorm
  mocov3      16     fixed 2D sin-cos pos embed, cls token
  jepa        14/16  no cls token, final LayerNorm
  clip        14/16  pre-LN after embed, quick-GELU, cls token, NO final LN
                     (the reference strips ln_post/proj,
                      encoders/clip_vit.py:207-230)

`forward_features` returns the full token sequence [N, extra+T, D]; the
align glue slices per family (vaw_tpu.encoders.align).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..models.layers import (
    Mlp,
    MultiHeadSelfAttention,
    get_2d_sincos_pos_embed,
    trunc_normal_init,
)

__all__ = ["FeatureViT", "FAMILY_CONFIGS", "make_teacher"]


def _quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class TeacherBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    quick_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = MultiHeadSelfAttention(num_heads=self.num_heads, qkv_bias=True,
                                   dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        )
        if self.layer_scale:
            h = self.param("ls1", nn.initializers.ones, (d,)) * h
        x = x + h
        h = Mlp(hidden_features=int(d * self.mlp_ratio),
                act=_quick_gelu if self.quick_gelu else nn.gelu,
                dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        )
        if self.layer_scale:
            h = self.param("ls2", nn.initializers.ones, (d,)) * h
        return x + h


class FeatureViT(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_cls_token: bool = True
    fixed_sincos_pos: bool = False
    layer_scale: bool = False
    pre_norm: bool = False
    final_norm: bool = True
    quick_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] preprocessed pixels -> tokens [N, extra+T, D]."""
        n = x.shape[0]
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    use_bias=not self.pre_norm, dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        _, gh, gw, _ = h.shape
        tokens = h.reshape(n, gh * gw, self.embed_dim)

        extra = 0
        if self.use_cls_token:
            cls = self.param("cls_token", trunc_normal_init(0.02),
                             (1, 1, self.embed_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (n, 1, self.embed_dim)).astype(
                    tokens.dtype), tokens], axis=1
            )
            extra = 1

        if self.fixed_sincos_pos:
            pos = get_2d_sincos_pos_embed(self.embed_dim, gh,
                                          cls_token=True, extra_tokens=extra)
            tokens = tokens + jnp.asarray(pos, tokens.dtype)[None]
        else:
            pos = self.param("pos_embed", trunc_normal_init(0.02),
                             (1, extra + gh * gw, self.embed_dim))
            tokens = tokens + pos.astype(tokens.dtype)

        if self.pre_norm:  # CLIP ln_pre
            tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                  name="ln_pre")(tokens).astype(self.dtype)

        for i in range(self.depth):
            tokens = TeacherBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                layer_scale=self.layer_scale, quick_gelu=self.quick_gelu,
                dtype=self.dtype, name=f"block_{i}",
            )(tokens)

        if self.final_norm:
            tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                  name="norm")(tokens)
        return tokens.astype(jnp.float32)

    def forward_features(self, x):
        return self(x)


# arch sizes: (embed_dim, depth, num_heads)
_SIZES = {
    "s": (384, 12, 6),
    "b": (768, 12, 12),
    "l": (1024, 24, 16),
    "h": (1280, 32, 16),
    "g": (1536, 40, 24),
}

FAMILY_CONFIGS = {
    "dinov2": dict(patch_size=14, layer_scale=True),
    "dinov1": dict(patch_size=16),
    "mae": dict(patch_size=16),
    "mocov3": dict(patch_size=16, fixed_sincos_pos=True),
    "jepa": dict(patch_size=14, use_cls_token=False),
    "clip": dict(patch_size=14, pre_norm=True, final_norm=False,
                 quick_gelu=True),
}


def make_teacher(family: str, size: str, image_size: int = 224,
                 dtype=jnp.float32) -> FeatureViT:
    """Instantiate the teacher architecture for a `family-vit-size` spec
    (reference spec strings, tools/encoders.py:56-257)."""
    assert family in FAMILY_CONFIGS, f"unknown encoder family {family}"
    embed_dim, depth, num_heads = _SIZES[size]
    cfg = dict(FAMILY_CONFIGS[family])
    if family == "clip" and size == "l":
        cfg["patch_size"] = 14
    return FeatureViT(
        image_size=image_size, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, dtype=dtype, **cfg,
    )
