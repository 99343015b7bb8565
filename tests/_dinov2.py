"""Faithful torch stubs of the DINO teacher classes the reference pulls
from torch.hub (tools/encoders.py:96-158) — the hub repos are unreachable
in this environment, so these re-implement the exact forward math of

  facebookresearch/dinov2  dinov2/models/vision_transformer.py
                           (DinoVisionTransformer: LayerScale blocks,
                           optional register tokens, forward_features dict
                           with x_norm_{cls,reg,patch}tokens)
  facebookresearch/dino    vision_transformer.py (VisionTransformer:
                           plain pre-norm ViT; forward returns the cls
                           token after the final norm — which is what the
                           reference's `forward_features = forward`
                           aliasing exposes, tools/encoders.py:158)

the same way tests/_timm_vit.py stubs timm. Used only by
tests/test_encoder_parity.py as the differential oracle.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()  # exact erf form, both repos
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, t, d = x.shape
        qkv = self.qkv(x).reshape(b, t, 3, self.num_heads, d // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(x)


class _LayerScale(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class _Block(nn.Module):
    """Pre-norm block; with layer_scale=True it is DINOv2's NestedTensorBlock
    on regular tensors, without it DINOv1's Block."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, layer_scale=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))
        if layer_scale:
            self.ls1 = _LayerScale(dim)
            self.ls2 = _LayerScale(dim)
        else:
            self.ls1 = nn.Identity()
            self.ls2 = nn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class _PatchEmbed(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv2d(3, embed_dim, kernel_size=patch_size,
                              stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)  # [B, T, D]


class DinoVisionTransformer(nn.Module):
    """DINOv2 forward_features semantics. pos_embed covers cls+patches;
    register tokens are inserted AFTER the pos-embed add and get no pos
    rows (dinov2 prepare_tokens_with_masks)."""

    def __init__(self, img_size=224, patch_size=14, embed_dim=384, depth=2,
                 num_heads=6, num_register_tokens=0):
        super().__init__()
        self.patch_embed = _PatchEmbed(patch_size, embed_dim)
        grid = img_size // patch_size
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, 1 + grid * grid, embed_dim))
        self.num_register_tokens = num_register_tokens
        if num_register_tokens:
            self.register_tokens = nn.Parameter(
                torch.zeros(1, num_register_tokens, embed_dim))
        self.blocks = nn.ModuleList(
            [_Block(embed_dim, num_heads, layer_scale=True)
             for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def prepare_tokens_with_masks(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        # The reference resamples pos_embed to the runtime grid at load
        # time (tools/encoders.py:117-118), so the hub model's
        # interpolate_pos_encoding hits its identity fast path here.
        assert x.shape[1] == self.pos_embed.shape[1], (
            "stub expects load-time-resampled pos_embed (identity path)")
        x = x + self.pos_embed
        if self.num_register_tokens:
            x = torch.cat(
                [x[:, :1], self.register_tokens.expand(b, -1, -1), x[:, 1:]],
                dim=1)
        return x

    def forward_features(self, x):
        x = self.prepare_tokens_with_masks(x)
        for blk in self.blocks:
            x = blk(x)
        x_norm = self.norm(x)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x_norm[:, 0],
            "x_norm_regtokens": x_norm[:, 1:r + 1],
            "x_norm_patchtokens": x_norm[:, r + 1:],
            "x_prenorm": x,
        }

    def forward(self, x):
        return self.forward_features(x)


class Dinov1VisionTransformer(nn.Module):
    """facebookresearch/dino VisionTransformer. Its forward returns the
    final-norm cls token ONLY — the reference aliases
    forward_features = forward (tools/encoders.py:158), so the dinov1
    teacher exposes a [B, D] global feature, not a token grid."""

    def __init__(self, img_size=256, patch_size=16, embed_dim=384, depth=2,
                 num_heads=6):
        super().__init__()
        self.patch_embed = _PatchEmbed(patch_size, embed_dim)
        grid = img_size // patch_size
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, 1 + grid * grid, embed_dim))
        self.blocks = nn.ModuleList(
            [_Block(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def _all_tokens(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        assert x.shape[1] == self.pos_embed.shape[1], (
            "stub expects load-time-resampled pos_embed (identity path)")
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def forward(self, x):
        return self._all_tokens(x)[:, 0]
