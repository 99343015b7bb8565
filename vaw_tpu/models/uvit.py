"""U-ViT — token-concatenation ViT with long skip connections (Flax, NHWC).

TPU-first re-design of the reference U-ViT (reference: models/uvit.py:139-255):
time token from sinusoidal embedding (optionally MLP'd), label token, depth//2
in_blocks -> mid_block -> depth//2 out_blocks with `skip_linear(cat)` long
skips (models/uvit.py:110-121), final linear decoder + 3x3 conv. The
flash/xformers/math attention fallback chain (models/uvit.py:8-18) collapses
to the shared f32-softmax MHA. Sizes match models/uvit.py:258-284.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import (Mlp, PatchEmbed, remat_with_policy,
                     timestep_embedding, trunc_normal_init)

__all__ = ["UViT", "UViT_S", "UViT_S_D", "UViT_M", "UViT_L", "UViT_H",
           "UViT_models"]


class UViTBlock(nn.Module):
    """Pre-norm transformer block with optional long-skip fusion
    (reference: models/uvit.py:97-121)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        d = x.shape[-1]
        if self.skip:
            x = nn.Dense(d, dtype=self.dtype,
                         kernel_init=trunc_normal_init(0.02))(
                jnp.concatenate([x, skip], axis=-1)
            )
        n, t, _ = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype)
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02))(y)
        qkv = qkv.reshape(n, t, 3, self.num_heads, d // self.num_heads)
        from ..ops.attention import multi_head_attention_packed, \
            packed_qkv_enabled

        if packed_qkv_enabled():
            attn = multi_head_attention_packed(qkv)
        else:
            attn = multi_head_attention(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        attn = nn.Dense(d, dtype=self.dtype,
                        kernel_init=trunc_normal_init(0.02))(
            attn.reshape(n, t, d)
        )
        x = x + attn
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype)
        # exact (erf) GELU: reference Mlp uses torch nn.GELU()'s default
        # (tools/timm.py:84-113 via models/uvit.py:4, 106)
        x = x + Mlp(hidden_features=int(d * self.mlp_ratio),
                    act=lambda z: nn.gelu(z, approximate=False),
                    dtype=self.dtype)(y)
        return x


class UViT(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    mlp_time_embed: bool = False
    num_classes: int = -1
    conv: bool = True
    skip: bool = True
    # remat blocks in the backward; 'dots' saves MXU outputs only
    use_checkpoint: bool = False
    remat_policy: str = "full"
    class_dropout_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, train: bool = False,
                 force_drop_ids=None):
        extras = 1 + int(self.num_classes > 0 and y is not None)
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)(
            x.astype(self.dtype)
        )
        n, num_patches, _ = x.shape

        t_emb = timestep_embedding(timesteps, self.embed_dim)
        if self.mlp_time_embed:
            t_emb = nn.Dense(4 * self.embed_dim, dtype=self.dtype)(t_emb)
            t_emb = nn.Dense(self.embed_dim, dtype=self.dtype)(nn.silu(t_emb))
        # Token order is [label, time, patches]: the reference prepends the
        # time token first, then the label token in front of it
        # (models/uvit.py:224-231). Matters for pos_embed row alignment.
        tokens = [t_emb[:, None].astype(self.dtype)]

        if self.num_classes > 0 and y is not None:
            if self.class_dropout_prob > 0 and train:
                rng = self.make_rng("label_dropout")
                drop_ids = (
                    jax.random.uniform(rng, (y.shape[0],))
                    < self.class_dropout_prob
                )
                y = jnp.where(drop_ids, self.num_classes, y)
            elif force_drop_ids is not None:
                y = jnp.where(force_drop_ids == 1, self.num_classes, y)
            label_emb = nn.Embed(
                self.num_classes + int(self.class_dropout_prob > 0),
                self.embed_dim, embedding_init=trunc_normal_init(0.02),
            )(y)
            tokens.insert(0, label_emb[:, None].astype(self.dtype))

        x = jnp.concatenate(tokens + [x], axis=1)
        pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, extras + num_patches, self.embed_dim),
        )
        x = x + pos_embed.astype(self.dtype)

        block_cls = (remat_with_policy(UViTBlock, self.remat_policy)
                     if self.use_checkpoint else UViTBlock)
        skips = []
        for _ in range(self.depth // 2):
            x = block_cls(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias, dtype=self.dtype)(x)
            skips.append(x)

        x = block_cls(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, dtype=self.dtype)(x)

        for _ in range(self.depth // 2):
            x = block_cls(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias, skip=self.skip,
                          dtype=self.dtype)(x, skips.pop())

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x)
        x = nn.Dense(self.patch_size ** 2 * self.in_channels,
                     kernel_init=trunc_normal_init(0.02),
                     dtype=jnp.float32)(x)
        x = x[:, extras:, :]

        p = self.patch_size
        h = w = int(x.shape[1] ** 0.5)
        assert h * w == x.shape[1]
        x = x.reshape(n, h, w, p, p, self.in_channels)
        x = jnp.einsum("nhwpqc->nhpwqc", x)
        imgs = x.reshape(n, h * p, w * p, self.in_channels)
        if self.conv:
            imgs = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                           dtype=jnp.float32, name="final_layer")(imgs)
        return imgs


def _make_uvit(embed_dim, depth, num_heads):
    def ctor(image_size, patch_size, in_channels, num_classes,
             class_dropout_prob=0.0, **kwargs):
        return UViT(
            image_size=image_size, patch_size=patch_size or 16,
            in_channels=in_channels, embed_dim=embed_dim, depth=depth,
            num_heads=num_heads, mlp_ratio=4, num_classes=num_classes,
            class_dropout_prob=class_dropout_prob, **kwargs,
        )

    return ctor


# Sizes (reference: models/uvit.py:258-284).
UViT_S = _make_uvit(512, 13, 8)
UViT_S_D = _make_uvit(512, 17, 8)
UViT_M = _make_uvit(768, 17, 12)
UViT_L = _make_uvit(1024, 21, 16)
UViT_H = _make_uvit(1152, 29, 16)

UViT_models = {
    "U-ViT-S": UViT_S,
    "U-ViT-S-D": UViT_S_D,
    "U-ViT-M": UViT_M,
    "U-ViT-L": UViT_L,
    "U-ViT-H": UViT_H,
}
