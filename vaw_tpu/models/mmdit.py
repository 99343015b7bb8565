"""MM-DiT — SD3-style dual-stream joint-attention transformer (optional
backbone).

The reference ships a full MM-DiT implementation that is imported nowhere
(reference: encoders/mmdit.py:511-695, orphaned per SURVEY.md section 2.4);
it is kept as an optional backbone here. Structure: context (conditioning)
and latent (image) token streams each get their own adaLN DismantledBlock
projections, attend JOINTLY over the concatenated sequence
(mmdit.py:373-487), then split back. RMSNorm qk-normalization (mmdit.py:289)
and an optional SwiGLU MLP (mmdit.py:335) are included. NHWC / Flax.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import (
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    modulate,
    xavier_uniform_init,
    zeros_init,
)

__all__ = ["MMDiT"]


class RMSNorm(nn.Module):
    eps: float = 1e-6
    learnable: bool = True

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x.astype(jnp.float32) / jnp.sqrt(var + self.eps)
        if self.learnable:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            y = y * scale
        return y.astype(x.dtype)


class SwiGLU(nn.Module):
    hidden_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = nn.Dense(self.hidden_features, dtype=self.dtype)(x)
        b = nn.Dense(self.hidden_features, dtype=self.dtype)(x)
        return nn.Dense(d, dtype=self.dtype)(nn.silu(a) * b)


class StreamProj(nn.Module):
    """Per-stream adaLN modulation + qkv projection (one half of a
    DismantledBlock, reference: encoders/mmdit.py:373-446). setup-style so
    the JointBlock can call qkv() and post() separately around the shared
    joint attention."""

    hidden_size: int
    num_heads: int
    qk_norm: bool = True
    pre_only: bool = False  # context stream of the last block has no output
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n_mod = 2 if self.pre_only else 6
        self.adaLN = nn.Dense(n_mod * self.hidden_size, dtype=self.dtype,
                              kernel_init=zeros_init, bias_init=zeros_init)
        self.norm1 = nn.LayerNorm(use_bias=False, use_scale=False,
                                  epsilon=1e-6, dtype=jnp.float32)
        self.qkv_proj = nn.Dense(3 * self.hidden_size, dtype=self.dtype,
                                 kernel_init=xavier_uniform_init)
        if self.qk_norm:
            self.q_norm = RMSNorm()
            self.k_norm = RMSNorm()
        if not self.pre_only:
            self.out_proj = nn.Dense(self.hidden_size, dtype=self.dtype)
            self.norm2 = nn.LayerNorm(use_bias=False, use_scale=False,
                                      epsilon=1e-6, dtype=jnp.float32)
            self.mlp = SwiGLU(hidden_features=int(self.hidden_size * 4),
                              dtype=self.dtype)

    def __call__(self, x, c):
        # Unused directly; setup-style modules need a __call__ for init via
        # JointBlock's explicit method calls instead.
        raise NotImplementedError

    def qkv(self, x, c):
        n_mod = 2 if self.pre_only else 6
        mod = self.adaLN(nn.silu(c))
        parts = jnp.split(mod, n_mod, axis=-1)
        shift_msa, scale_msa = parts[0], parts[1]
        rest = parts[2:]
        y = modulate(self.norm1(x).astype(self.dtype), shift_msa, scale_msa)
        qkv = self.qkv_proj(y)
        n, t, _ = qkv.shape
        head_dim = self.hidden_size // self.num_heads
        qkv = qkv.reshape(n, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm:
            q = self.q_norm(q)
            k = self.k_norm(k)
        return (q, k, v), rest

    def post(self, x, attn_out, rest):
        assert not self.pre_only
        gate_msa, shift_mlp, scale_mlp, gate_mlp = rest
        x = x + gate_msa[:, None] * self.out_proj(attn_out)
        y = modulate(self.norm2(x).astype(self.dtype), shift_mlp, scale_mlp)
        return x + gate_mlp[:, None] * self.mlp(y)


class JointBlock(nn.Module):
    """Dual-stream joint attention (reference: encoders/mmdit.py:475-487)."""

    hidden_size: int
    num_heads: int
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context, x, c):
        ctx_proj = StreamProj(self.hidden_size, self.num_heads,
                              pre_only=self.context_pre_only,
                              dtype=self.dtype, name="context")
        x_proj = StreamProj(self.hidden_size, self.num_heads,
                            dtype=self.dtype, name="x")
        (cq, ck, cv), ctx_rest = ctx_proj.qkv(context, c)
        (xq, xk, xv), x_rest = x_proj.qkv(x, c)
        q = jnp.concatenate([cq, xq], axis=1)
        k = jnp.concatenate([ck, xk], axis=1)
        v = jnp.concatenate([cv, xv], axis=1)
        out = multi_head_attention(q, k, v)
        n, t, h, hd = out.shape
        out = out.reshape(n, t, h * hd)
        ctx_len = context.shape[1]
        ctx_attn, x_attn = out[:, :ctx_len], out[:, ctx_len:]
        x = x_proj.post(x, x_attn, x_rest)
        if self.context_pre_only:
            return None, x
        context = ctx_proj.post(context, ctx_attn, ctx_rest)
        return context, x


class MMDiT(nn.Module):
    """forward(x [N,H,W,C], t [N], y [N]) -> [N,H,W,C]
    (reference: encoders/mmdit.py:511-695, class-conditional variant:
    the label embedding forms the context stream)."""

    image_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    num_classes: int = 1000
    context_tokens: int = 1
    learn_sigma: bool = False
    class_dropout_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False,
                 force_drop_ids=None):
        import jax

        out_channels = (
            self.in_channels * 2 if self.learn_sigma else self.in_channels
        )
        x = PatchEmbed(self.patch_size, self.hidden_size,
                       dtype=self.dtype)(x.astype(self.dtype))
        grid = self.image_size // self.patch_size
        pos = get_2d_sincos_pos_embed(self.hidden_size, grid)
        x = x + jnp.asarray(pos, self.dtype)[None]

        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype)(t)
        if self.num_classes > 0 and y is not None:
            use_cfg = self.class_dropout_prob > 0
            if (use_cfg and train) or (force_drop_ids is not None):
                if force_drop_ids is None:
                    rng = self.make_rng("label_dropout")
                    drop = (jax.random.uniform(rng, (y.shape[0],))
                            < self.class_dropout_prob)
                else:
                    drop = force_drop_ids == 1
                y = jnp.where(drop, self.num_classes, y)
            y_emb = nn.Embed(
                self.num_classes + int(use_cfg), self.hidden_size,
                embedding_init=nn.initializers.normal(0.02),
            )(y).astype(self.dtype)
            c = c + y_emb
            context = jnp.repeat(y_emb[:, None], self.context_tokens, axis=1)
        else:
            context = jnp.repeat(c[:, None], self.context_tokens, axis=1)

        for i in range(self.depth):
            last = i == self.depth - 1
            context, x = JointBlock(
                self.hidden_size, self.num_heads, context_pre_only=last,
                dtype=self.dtype, name=f"joint_{i}",
            )(context, x, c)

        # Final adaLN + zero-init linear head (reference: mmdit.py:489-508).
        mod = nn.Dense(2 * self.hidden_size, dtype=self.dtype,
                       kernel_init=zeros_init, bias_init=zeros_init,
                       name="final_adaLN")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32)(x).astype(self.dtype)
        x = modulate(x, shift, scale)
        x = nn.Dense(self.patch_size ** 2 * out_channels,
                     kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=jnp.float32, name="final_linear")(x)

        n, tkn, _ = x.shape
        p = self.patch_size
        h = w = int(tkn ** 0.5)
        x = x.reshape(n, h, w, p, p, out_channels)
        x = jnp.einsum("nhwpqc->nhpwqc", x)
        return x.reshape(n, h * p, w * p, out_channels)
