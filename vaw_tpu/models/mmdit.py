"""MM-DiT — SD3-style dual-stream joint-attention transformer (optional
backbone).

The reference ships a full MM-DiT implementation that is imported nowhere
(reference: encoders/mmdit.py:511-695, orphaned per SURVEY.md section 2.4);
it is kept as a first-class optional backbone here with the reference's
full option surface: context (text) token stream through a linear
context_embedder (mmdit.py:568-574), learnable register tokens prepended to
the context (:576-578, :661-663), a VectorEmbedder conditioning path
(adm_in_channels, :203-215), per-block options {rmsnorm, swiglu,
scale_mod_only, qk_norm} matching DismantledBlock (:373-446), the
center-cropped 16-grid pos table (:615-636), the pre-only context stream of
the last block (:596-599), and the REPA projector tap returning (x, zs)
(:658-680). NHWC / Flax; joint attention over the concatenated streams runs
through the shared f32-softmax MHA.

Parity: tests/test_mmdit_parity.py instantiates the reference torch MMDiT,
converts with models.convert.convert_mmdit, and asserts forward equality.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import (
    PatchEmbed,
    remat_with_policy,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    xavier_uniform_init,
    zeros_init,
)

__all__ = ["MMDiT"]


def _modulate(x, shift, scale):
    """adaLN modulation with optional shift (scale_mod_only passes None,
    reference: encoders/mmdit.py:98-102)."""
    y = x * (1 + scale[:, None])
    if shift is not None:
        y = y + shift[:, None]
    return y


class RMSNorm(nn.Module):
    """reference: encoders/mmdit.py:289-332 (eps inside the mean-square
    rsqrt; optional learnable scale)."""

    eps: float = 1e-6
    learnable: bool = True

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        if self.learnable:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            y = y * scale
        return y.astype(x.dtype)


class SwiGLUFeedForward(nn.Module):
    """reference: encoders/mmdit.py:335-371 — hidden = multiple_of-rounded
    2/3 of the nominal mlp width; three bias-free linears
    w2(silu(w1 x) * w3 x)."""

    nominal_hidden: int
    multiple_of: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        hidden = int(2 * self.nominal_hidden / 3)
        hidden = self.multiple_of * (
            (hidden + self.multiple_of - 1) // self.multiple_of
        )
        a = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="w1")(x)
        b = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="w3")(x)
        return nn.Dense(d, use_bias=False, dtype=self.dtype,
                        name="w2")(nn.silu(a) * b)


class GeluMlp(nn.Module):
    """DismantledBlock's default MLP: GELU(tanh) (mmdit.py:31-45, :408)."""

    hidden_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(x)


class StreamProj(nn.Module):
    """Per-stream adaLN modulation + qkv projection (one DismantledBlock,
    reference: encoders/mmdit.py:373-446). setup-style so the JointBlock
    can call qkv() and post() separately around the shared joint
    attention."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: Optional[str] = None  # None | 'rms' | 'ln'
    use_rmsnorm: bool = False  # block norms as affine-free RMSNorm
    use_swiglu: bool = False
    scale_mod_only: bool = False
    pre_only: bool = False  # context stream of the last block has no output
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.scale_mod_only:
            n_mod = 1 if self.pre_only else 4
        else:
            n_mod = 2 if self.pre_only else 6
        self.adaLN = nn.Dense(n_mod * self.hidden_size, dtype=self.dtype,
                              kernel_init=zeros_init, bias_init=zeros_init)

        def make_norm():
            if self.use_rmsnorm:
                return RMSNorm(learnable=False)
            return nn.LayerNorm(use_bias=False, use_scale=False,
                                epsilon=1e-6, dtype=jnp.float32)

        self.norm1 = make_norm()
        self.qkv_proj = nn.Dense(3 * self.hidden_size,
                                 use_bias=self.qkv_bias, dtype=self.dtype,
                                 kernel_init=xavier_uniform_init)
        if self.qk_norm == "rms":
            self.q_norm = RMSNorm(learnable=True)
            self.k_norm = RMSNorm(learnable=True)
        elif self.qk_norm == "ln":
            self.q_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
            self.k_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        else:
            assert self.qk_norm is None, self.qk_norm
        if not self.pre_only:
            self.out_proj = nn.Dense(self.hidden_size, dtype=self.dtype)
            self.norm2 = make_norm()
            nominal = int(self.hidden_size * self.mlp_ratio)
            if self.use_swiglu:
                self.mlp = SwiGLUFeedForward(nominal_hidden=nominal,
                                             dtype=self.dtype)
            else:
                self.mlp = GeluMlp(hidden_features=nominal, dtype=self.dtype)

    def __call__(self, x, c):
        # setup-style module; JointBlock calls qkv()/post() explicitly.
        raise NotImplementedError

    def _mods(self, c):
        mod = self.adaLN(nn.silu(c))
        if self.scale_mod_only:
            if self.pre_only:
                return (None, mod), ()
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(
                mod, 4, axis=-1)
            return (None, scale_msa), (gate_msa, None, scale_mlp, gate_mlp)
        parts = jnp.split(mod, 2 if self.pre_only else 6, axis=-1)
        if self.pre_only:
            return (parts[0], parts[1]), ()
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = parts
        return (shift_msa, scale_msa), (gate_msa, shift_mlp, scale_mlp,
                                        gate_mlp)

    def qkv(self, x, c):
        (shift_msa, scale_msa), rest = self._mods(c)
        y = _modulate(self.norm1(x).astype(self.dtype), shift_msa, scale_msa)
        qkv = self.qkv_proj(y)
        n, t, _ = qkv.shape
        head_dim = self.hidden_size // self.num_heads
        qkv = qkv.reshape(n, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        return (q, k, v), rest

    def post(self, x, attn_out, rest):
        assert not self.pre_only
        gate_msa, shift_mlp, scale_mlp, gate_mlp = rest
        x = x + gate_msa[:, None] * self.out_proj(attn_out)
        y = _modulate(self.norm2(x).astype(self.dtype), shift_mlp, scale_mlp)
        return x + gate_mlp[:, None] * self.mlp(y)


class JointBlock(nn.Module):
    """Dual-stream joint attention (reference: encoders/mmdit.py:453-487):
    both streams project qkv, attend over the concatenation, split back."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: Optional[str] = None
    use_rmsnorm: bool = False
    use_swiglu: bool = False
    scale_mod_only: bool = False
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context, x, c):
        kw = dict(mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                  qk_norm=self.qk_norm, use_rmsnorm=self.use_rmsnorm,
                  use_swiglu=self.use_swiglu,
                  scale_mod_only=self.scale_mod_only, dtype=self.dtype)
        ctx_proj = StreamProj(self.hidden_size, self.num_heads,
                              pre_only=self.context_pre_only,
                              name="context", **kw)
        x_proj = StreamProj(self.hidden_size, self.num_heads, name="x", **kw)
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
    """forward(x [N,H,W,C], t [N], y=None, context=None) -> (out, zs)
    (reference: encoders/mmdit.py:511-695).

    Conditioning inputs, mirroring the reference:
      - context: [N, L, context_dim] token stream through the linear
        context_embedder (text embeddings in SD3);
      - y: with adm_in_channels set, a [N, adm_in_channels] VECTOR through
        the VectorEmbedder MLP (reference :562-565); otherwise (TPU
        convenience extension) integer class ids through an embedding
        table with CFG dropout, which also seeds a 1-token context when no
        context is given.
    """

    image_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    # remat the JointBlocks in the backward (O(depth) -> O(1) activation
    # memory); 'dots' saves MXU outputs and recomputes elementwise only.
    use_checkpoint: bool = False
    remat_policy: str = "full"
    adm_in_channels: Optional[int] = None
    context_dim: int = 768
    context_tokens: int = 1  # synthesized context length (class-cond path)
    register_length: int = 0
    qkv_bias: bool = True
    qk_norm: Optional[str] = None
    use_rmsnorm: bool = False
    use_swiglu: bool = False
    scale_mod_only: bool = False
    pos_embed_max_size: int = 16  # hardcoded in the reference (:553)
    learn_sigma: bool = False
    learn_align: bool = False
    encoder_depth: int = 8
    z_dims: Sequence[int] = (768,)
    projector_dim: int = 2048
    class_dropout_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _cropped_pos_embed(self, h_tokens, w_tokens):
        """Center-crop the fixed 16-grid sincos table to the actual token
        grid (reference: encoders/mmdit.py:615-636)."""
        m = self.pos_embed_max_size
        assert h_tokens <= m and w_tokens <= m, (h_tokens, w_tokens, m)
        table = get_2d_sincos_pos_embed(self.hidden_size, m)
        table = table.reshape(m, m, self.hidden_size)
        top = (m - h_tokens) // 2
        left = (m - w_tokens) // 2
        crop = table[top: top + h_tokens, left: left + w_tokens]
        return crop.reshape(h_tokens * w_tokens, self.hidden_size)

    @nn.compact
    def __call__(self, x, t, y=None, context=None, train: bool = False,
                 force_drop_ids=None) -> Tuple[jnp.ndarray, Optional[list]]:
        assert not self.learn_align or self.encoder_depth > 0, (
            "learn_align requires encoder_depth > 0 (pass --encoder_depth; "
            "the projector tap would otherwise never fire and zs stays None)"
        )
        out_channels = (
            self.in_channels * 2 if self.learn_sigma else self.in_channels
        )
        h_tok = x.shape[1] // self.patch_size
        w_tok = x.shape[2] // self.patch_size
        x = PatchEmbed(self.patch_size, self.hidden_size,
                       dtype=self.dtype, name="x_embedder")(
            x.astype(self.dtype))
        pos = self._cropped_pos_embed(h_tok, w_tok)
        x = x + jnp.asarray(pos, self.dtype)[None]

        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                             name="t_embedder")(t)
        user_context = context is not None
        if y is not None and self.adm_in_channels is not None:
            # VectorEmbedder conditioning (reference :203-215, :562-565)
            h = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name="y_embedder_fc1")(y.astype(self.dtype))
            y_emb = nn.Dense(self.hidden_size, dtype=self.dtype,
                             name="y_embedder_fc2")(nn.silu(h))
            c = c + y_emb
        elif y is not None and self.num_classes > 0:
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
                name="label_embed",
            )(y).astype(self.dtype)
            c = c + y_emb
            if context is None:
                # synthesized 1-token context (class-cond convenience;
                # already hidden-size, bypasses the context_embedder)
                context = jnp.repeat(y_emb[:, None], self.context_tokens,
                                     axis=1)
        if context is None:
            context = jnp.repeat(c[:, None], self.context_tokens, axis=1)

        if user_context:
            # the reference always routes supplied context through the
            # linear embedder (mmdit.py:568-574, :691)
            assert context.shape[-1] == self.context_dim, (
                f"context last dim {context.shape[-1]} != "
                f"context_dim {self.context_dim}")
            context = nn.Dense(self.hidden_size, dtype=self.dtype,
                               name="context_embedder")(
                context.astype(self.dtype))

        if self.register_length > 0:
            reg = self.param(
                "register", nn.initializers.normal(1.0),
                (1, self.register_length, self.hidden_size))
            reg = jnp.broadcast_to(
                reg, (x.shape[0], self.register_length, self.hidden_size))
            context = jnp.concatenate(
                [reg.astype(context.dtype), context], axis=1)

        zs = None
        block_cls = (remat_with_policy(JointBlock, self.remat_policy)
                     if self.use_checkpoint else JointBlock)
        for i in range(self.depth):
            last = i == self.depth - 1
            context, x = block_cls(
                self.hidden_size, self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_norm=self.qk_norm,
                use_rmsnorm=self.use_rmsnorm, use_swiglu=self.use_swiglu,
                scale_mod_only=self.scale_mod_only, context_pre_only=last,
                dtype=self.dtype, name=f"joint_{i}",
            )(context, x, c)
            if self.learn_align and (i + 1) == self.encoder_depth:
                # REPA projector tap (reference: mmdit.py:48-56, 666-674).
                # Framework contract (train/trainer + core align loss):
                # a single-teacher tap returns a BARE array like DiT's
                # (models/dit.py); the reference's list form is kept only
                # for multi-teacher configs.
                zs = []
                for j, z_dim in enumerate(self.z_dims):
                    h = nn.Dense(self.projector_dim, dtype=self.dtype,
                                 name=f"projector_{j}_fc1")(x)
                    h = nn.silu(h)
                    h = nn.Dense(self.projector_dim, dtype=self.dtype,
                                 name=f"projector_{j}_fc2")(h)
                    h = nn.silu(h)
                    zs.append(nn.Dense(z_dim, dtype=self.dtype,
                                       name=f"projector_{j}_fc3")(h))
                if len(zs) == 1:
                    zs = zs[0]

        # Final adaLN + linear head (reference: mmdit.py:489-508).
        mod = nn.Dense(2 * self.hidden_size, dtype=self.dtype,
                       kernel_init=zeros_init, bias_init=zeros_init,
                       name="final_adaLN")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32)(x).astype(self.dtype)
        x = _modulate(x, shift, scale)
        x = nn.Dense(self.patch_size ** 2 * out_channels,
                     kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=jnp.float32, name="final_linear")(x)

        n = x.shape[0]
        p = self.patch_size
        x = x.reshape(n, h_tok, w_tok, p, p, out_channels)
        x = jnp.einsum("nhwpqc->nhpwqc", x)
        out = x.reshape(n, h_tok * p, w_tok * p, out_channels)
        return out.astype(jnp.float32), zs
