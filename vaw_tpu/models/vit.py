"""Time/class-token ViT backbone (Flax linen, NHWC).

TPU-first re-design of the reference's BEiT-style ViT (reference:
models/vit.py:300-565): a *learned* timestep-embedding table
(models/vit.py:377), class token for conditioning, optional shared relative
position bias (models/vit.py:102-146, 243-297), depth-scaled residual init
`fix_init_weight` (models/vit.py:383-389), and an init_scale-damped linear
projection head (models/vit.py:352-366). Sizes S/B/L/XL match
models/vit.py:551-565.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from .layers import (
    DropPath,
    Mlp,
    PatchEmbed,
    remat_with_policy,
    timestep_embedding,
    trunc_normal_init,
    zeros_init,
)

__all__ = ["ViT", "ViT_S", "ViT_B", "ViT_L", "ViT_XL", "ViT_models"]


def _rel_pos_index(window, num_extra_tokens=1):
    """BEiT relative-position index table for a (h, w) window plus 0/1/2
    extra tokens with distinct learned entries per extra-token relation
    (reference: models/vit.py:243-290: 3 extra entries for one token —
    cls->token / token->cls / cls->cls — and 8 for two, covering every
    time/cls/token pairing)."""
    h, w = window
    assert num_extra_tokens in (0, 1, 2)
    extra = num_extra_tokens * (num_extra_tokens + 2)
    num_rel = (2 * h - 1) * (2 * w - 1) + extra
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    e = num_extra_tokens
    index = np.zeros((h * w + e, h * w + e), dtype=np.int64)
    index[e:, e:] = rel.sum(-1)
    if e == 1:
        index[0, 0:] = num_rel - 3
        index[0:, 0] = num_rel - 2
        index[0, 0] = num_rel - 1
    elif e == 2:
        index[1, 1] = num_rel - 8
        index[1, 0] = num_rel - 7
        index[0, 1] = num_rel - 6
        index[0, 2:] = num_rel - 5
        index[2:, 0] = num_rel - 4
        index[1, 2:] = num_rel - 3
        index[2:, 1] = num_rel - 2
        index[0, 0] = num_rel - 1
    return index, num_rel


class RelativePositionBias(nn.Module):
    """Shared relative position bias across blocks
    (reference: models/vit.py:243-297)."""

    window: tuple
    num_heads: int
    num_extra_tokens: int = 1

    @nn.compact
    def __call__(self):
        h, w = self.window
        e = self.num_extra_tokens
        index, num_rel = _rel_pos_index(self.window, e)
        table = self.param(
            "relative_position_bias_table", zeros_init, (num_rel, self.num_heads)
        )
        bias = table[index.reshape(-1)].reshape(
            h * w + e, h * w + e, self.num_heads
        )
        return bias.transpose(2, 0, 1)  # [H, T, T]


class ViTAttention(nn.Module):
    """MHA with optional additive relative position bias."""

    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    proj_init_scale: float = 1.0

    @nn.compact
    def __call__(self, x, rel_pos_bias=None):
        n, t, d = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02))(x)
        qkv = qkv.reshape(n, t, 3, self.num_heads, head_dim)
        from ..ops.attention import multi_head_attention_packed, \
            packed_qkv_enabled

        if rel_pos_bias is None and packed_qkv_enabled():
            out = multi_head_attention_packed(qkv)
            q = k = v = None
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if q is None:
            pass  # packed path above
        elif rel_pos_bias is None:
            out = multi_head_attention(q, k, v)
        else:
            scale = 1.0 / math.sqrt(head_dim)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits.astype(jnp.float32) * scale + rel_pos_bias[None]
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(n, t, d)
        # Depth-scaled init (reference fix_init_weight, models/vit.py:383-389).
        return nn.Dense(d, dtype=self.dtype,
                        kernel_init=trunc_normal_init(0.02 * self.proj_init_scale)
                        )(out)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    layer_scale: float = 1.0  # 1/sqrt(2*layer_id) depth rescale
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic: bool = True):
        d = x.shape[-1]
        h = ViTAttention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype,
            proj_init_scale=self.layer_scale,
        )(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype), rel_pos_bias)
        if self.init_values is not None:
            gamma1 = self.param("gamma_1",
                                nn.initializers.constant(self.init_values), (d,))
            h = gamma1 * h
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = Mlp(
            hidden_features=int(d * self.mlp_ratio), dropout=self.drop_rate,
            # exact (erf) GELU: the reference uses torch nn.GELU()'s default
            # (models/vit.py:62-80, 190), not the tanh approximation
            act=lambda y: nn.gelu(y, approximate=False),
            # trunc_normal(0.02) with fc2 depth-rescaled, matching the
            # reference _init_weights + fix_init_weight pair
            # (models/vit.py:383-397).
            kernel_init=trunc_normal_init(0.02),
            out_kernel_init=trunc_normal_init(0.02 * self.layer_scale),
            dtype=self.dtype,
        )(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype), deterministic)
        if self.init_values is not None:
            gamma2 = self.param("gamma_2",
                                nn.initializers.constant(self.init_values), (d,))
            h = gamma2 * h
        x = x + DropPath(self.drop_path)(h, deterministic)
        return x


class ViT(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    use_abs_pos_emb: bool = True
    use_shared_rel_pos_bias: bool = False
    use_mean_pooling: bool = True
    # remat blocks in the backward; 'dots' saves MXU outputs only
    use_checkpoint: bool = False
    remat_policy: str = "full"
    init_scale: float = 0.001
    use_conv_last: bool = False
    num_steps: int = 4000
    learn_sigma: bool = False
    drop_label_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, train: bool = False,
                 force_drop_ids=None):
        out_dim = self.in_channels * 2 if self.learn_sigma else self.in_channels
        num_extra = 1 + int(self.num_classes > 0 and y is not None)
        deterministic = not train

        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02))(
            x.astype(self.dtype)
        )
        n, num_patches, _ = x.shape

        # Learned discrete timestep token (reference: models/vit.py:377, 453).
        t_idx = jnp.clip(timesteps.astype(jnp.int32), 0, self.num_steps - 1)
        time_tokens = nn.Embed(
            self.num_steps, self.embed_dim,
            embedding_init=trunc_normal_init(0.02), name="time_embedding",
        )(t_idx)[:, None].astype(self.dtype)

        if self.num_classes > 0 and y is not None:
            use_dropout = self.drop_label_prob > 0 and train
            if use_dropout or (force_drop_ids is not None):
                if force_drop_ids is None:
                    rng = self.make_rng("label_dropout")
                    drop_ids = (
                        jax.random.uniform(rng, (y.shape[0],))
                        < self.drop_label_prob
                    )
                else:
                    drop_ids = force_drop_ids == 1
                y = jnp.where(drop_ids, self.num_classes, y)
            cls_tokens = nn.Embed(
                self.num_classes + int(self.drop_label_prob > 0),
                self.embed_dim, embedding_init=trunc_normal_init(0.02),
                name="class_embedding",
            )(y)[:, None].astype(self.dtype)
            x = jnp.concatenate([time_tokens, cls_tokens, x], axis=1)
        else:
            x = jnp.concatenate([time_tokens, x], axis=1)

        if self.use_abs_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_init(0.02),
                (1, num_patches + num_extra, self.embed_dim),
            )
            x = x + pos_embed.astype(self.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        rel_pos_bias = None
        if self.use_shared_rel_pos_bias:
            grid = self.image_size // self.patch_size
            rel_pos_bias = RelativePositionBias(
                window=(grid, grid), num_heads=self.num_heads,
                num_extra_tokens=num_extra,
            )()

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        block_cls = (
            remat_with_policy(ViTBlock, self.remat_policy,
                              static_argnums=(3,))
            if self.use_checkpoint else ViTBlock)
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
                drop_path=float(dpr[i]), init_values=self.init_values,
                layer_scale=1.0 / math.sqrt(2.0 * (i + 1)), dtype=self.dtype,
            )(x, rel_pos_bias, deterministic)

        if not self.use_mean_pooling:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype)

        # init_scale-damped projection head (reference: models/vit.py:352-366).
        x = nn.Dense(
            out_dim * self.patch_size ** 2,
            kernel_init=trunc_normal_init(0.02 * self.init_scale),
            bias_init=zeros_init, dtype=jnp.float32,
        )(x[:, num_extra:].astype(jnp.float32))

        p = self.patch_size
        h = w = int(x.shape[1] ** 0.5)
        assert h * w == x.shape[1]
        x = x.reshape(n, h, w, p, p, out_dim)
        x = jnp.einsum("nhwpqc->nhpwqc", x)
        imgs = x.reshape(n, h * p, w * p, out_dim)

        if self.use_conv_last:
            imgs = nn.Conv(out_dim, (3, 3), padding="SAME",
                           dtype=jnp.float32, name="to_pixel")(imgs)
        return imgs


def vit_forward_with_cfg(model, variables, x, timesteps, y,
                         classifier_free_scale: float = 1.0):
    """Batched-uncond CFG forward (reference: models/vit.py:494-522):
    duplicate the conditional half, run once, blend, and return the
    duplicated guided batch."""
    import jax.numpy as jnp

    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    imgs = model.apply(variables, combined, timesteps, y)
    cond, uncond = jnp.split(imgs, 2, axis=0)
    guided = uncond + classifier_free_scale * (cond - uncond)
    return jnp.concatenate([guided, guided], axis=0)


def _make_vit(embed_dim, depth, num_heads):
    def ctor(image_size, patch_size, num_classes, in_channels, learn_sigma,
             drop_rate=0.0, drop_label_prob=0.0, **kwargs):
        return ViT(
            image_size=image_size, patch_size=patch_size or 16,
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            mlp_ratio=4, num_classes=num_classes, in_channels=in_channels,
            learn_sigma=learn_sigma, drop_rate=drop_rate,
            drop_label_prob=drop_label_prob, **kwargs,
        )

    return ctor


# Sizes (reference: models/vit.py:551-565).
ViT_S = _make_vit(512, 13, 4)
ViT_B = _make_vit(768, 12, 12)
ViT_L = _make_vit(1024, 21, 16)
ViT_XL = _make_vit(1152, 28, 16)

ViT_models = {"ViT-S": ViT_S, "ViT-B": ViT_B, "ViT-L": ViT_L, "ViT-XL": ViT_XL}
