"""Generic frozen ViT feature extractor covering all REPA teacher families.

The reference vendors five separate ViT implementations
(reference: encoders/mocov3_vit.py, mae_vit.py, jepa.py, clip_vit.py and
DINOv1/v2 via torch.hub, tools/encoders.py:56-257). They are all the same
architecture modulo small deltas, so the TPU build uses ONE parameterized
Flax ViT:

  family      patch  deltas
  dinov2      14     LayerScale, cls token, final LayerNorm
  dinov2reg   14     dinov2 + 4 register tokens (inserted after the
                     pos-embed add, no pos rows of their own — the
                     torch.hub `_reg` variants, tools/encoders.py:106)
  dinov1      16     cls token, final LayerNorm
  mae         16     cls token, NO final norm — the reference MAE
                     forward_features returns pre-norm tokens
                     (encoders/mae_vit.py:34-48: blocks then `x[:, 1:]`,
                     self.norm never applied)
  mocov3      16     cls token; pos embed is a LOADABLE param initialized
                     to MoCo-v3's 2D sin-cos table — at load time the
                     reference overwrites it with the checkpoint table
                     resampled to the runtime grid
                     (tools/encoders.py:32-35 + load_state_dict :94)
  jepa        14/16  no cls token, final LayerNorm, sincos pos
                     (encoders/jepa.py:409-413)
  clip        14/16  pre-LN after embed, quick-GELU, NO final LN, eps=1e-5
                     (torch nn.LayerNorm default; encoders/clip_vit.py:159,
                     173-195; ln_post/proj stripped by the wrapper,
                     clip_vit.py:208-230)

MoCo-v3's ConvStem variants (mocov3_vit.py:151-189 vit_conv_*) are
intentionally not modelled: the reference loader raises
NotImplementedError for any mocov3 architecture other than 'vit'
(tools/encoders.py:59-61), so they are unreachable capability.

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
    trunc_normal_init,
)

__all__ = ["FeatureViT", "FAMILY_CONFIGS", "make_teacher",
           "mocov3_sincos_pos_embed"]


def _quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form (timm blocks,
    # encoders/jepa.py:155-170); flax nn.gelu defaults to tanh-approx.
    return nn.gelu(x, approximate=False)


def mocov3_sincos_pos_embed(embed_dim: int, grid: int,
                            temperature: float = 10000.0) -> np.ndarray:
    """MoCo-v3's fixed 2D sin-cos table incl. the zero cls row, exactly as
    built by build_2d_sincos_position_embedding
    (reference: encoders/mocov3_vit.py:79-97): meshgrid(w, h) 'ij' order,
    [sin w, cos w, sin h, cos h] concat, zeros pe_token prefix.
    Returns [1, 1 + grid*grid, D]."""
    assert embed_dim % 4 == 0
    grid_w, grid_h = np.meshgrid(np.arange(grid, dtype=np.float32),
                                 np.arange(grid, dtype=np.float32),
                                 indexing="ij")
    pos_dim = embed_dim // 4
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / temperature ** omega
    out_w = np.einsum("m,d->md", grid_w.flatten(), omega)
    out_h = np.einsum("m,d->md", grid_h.flatten(), omega)
    table = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None]
    pe_token = np.zeros((1, 1, embed_dim), np.float32)
    return np.concatenate([pe_token, table], axis=1)


class TeacherBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    quick_gelu: bool = False
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = MultiHeadSelfAttention(num_heads=self.num_heads, qkv_bias=True,
                                   dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        )
        if self.layer_scale:
            h = self.param("ls1", nn.initializers.ones, (d,)) * h
        x = x + h
        h = Mlp(hidden_features=int(d * self.mlp_ratio),
                act=_quick_gelu if self.quick_gelu else _gelu_exact,
                dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32,
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
    fixed_sincos_pos: bool = False  # init pos_embed to the MoCo-v3 table
    num_register_tokens: int = 0
    layer_scale: bool = False
    pre_norm: bool = False
    final_norm: bool = True
    quick_gelu: bool = False
    norm_eps: float = 1e-6
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
            # A loadable param (the reference overwrites MoCo-v3's frozen
            # table with the resampled checkpoint table at load time,
            # tools/encoders.py:32-35); sincos is just the init.
            table = mocov3_sincos_pos_embed(self.embed_dim, gh)
            if not self.use_cls_token:
                table = table[:, 1:]
            pos = self.param(
                "pos_embed",
                lambda rng, shape: jnp.asarray(table, jnp.float32),
                (1, extra + gh * gw, self.embed_dim))
        else:
            pos = self.param("pos_embed", trunc_normal_init(0.02),
                             (1, extra + gh * gw, self.embed_dim))
        tokens = tokens + pos.astype(tokens.dtype)

        if self.num_register_tokens:
            # DINOv2-reg: registers ride after the cls token and get no
            # pos-embed rows (inserted post-add, dinov2 prepare_tokens).
            reg = self.param("register_tokens", trunc_normal_init(0.02),
                             (1, self.num_register_tokens, self.embed_dim))
            reg = jnp.broadcast_to(
                reg, (n, self.num_register_tokens, self.embed_dim)
            ).astype(tokens.dtype)
            tokens = jnp.concatenate(
                [tokens[:, :extra], reg, tokens[:, extra:]], axis=1)

        if self.pre_norm:  # CLIP ln_pre
            tokens = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32,
                                  name="ln_pre")(tokens).astype(self.dtype)

        for i in range(self.depth):
            tokens = TeacherBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                layer_scale=self.layer_scale, quick_gelu=self.quick_gelu,
                norm_eps=self.norm_eps, dtype=self.dtype, name=f"block_{i}",
            )(tokens)

        if self.final_norm:
            tokens = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32,
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
    "dinov2reg": dict(patch_size=14, layer_scale=True,
                      num_register_tokens=4),
    "dinov1": dict(patch_size=16),
    "mae": dict(patch_size=16, final_norm=False),
    "mocov3": dict(patch_size=16, fixed_sincos_pos=True),
    "jepa": dict(patch_size=14, use_cls_token=False),
    "clip": dict(patch_size=14, pre_norm=True, final_norm=False,
                 quick_gelu=True, norm_eps=1e-5),
}


def make_teacher(family: str, size: str, image_size: int = 224,
                 dtype=jnp.float32) -> FeatureViT:
    """Instantiate the teacher architecture for a `family-vit-size` spec
    (reference spec strings, tools/encoders.py:56-257)."""
    assert family in FAMILY_CONFIGS, f"unknown encoder family {family}"
    embed_dim, depth, num_heads = _SIZES[size]
    cfg = dict(FAMILY_CONFIGS[family])
    if family == "clip" and size != "l":
        # OpenAI CLIP: ViT-L is /14, ViT-B is /16. The reference supports
        # only ViT-L/14 (tools/encoders.py:165-168 raises for other sizes);
        # the B/16 geometry here is the correct superset.
        cfg["patch_size"] = 16
    return FeatureViT(
        image_size=image_size, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, dtype=dtype, **cfg,
    )
