"""Shared layer kit for all backbones (Flax linen, NHWC).

TPU-native equivalents of the reference's layer utilities:
tools/nn.py (GroupNorm32, timestep_embedding, zero_module),
tools/timm.py (trunc_normal_, DropPath, Mlp),
models/dit.py:41-110 (Timestep/Label embedders), :307-354 (2D sin-cos grid).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "timestep_embedding",
    "get_2d_sincos_pos_embed",
    "GroupNorm32",
    "Mlp",
    "DropPath",
    "PatchEmbed",
    "TimestepEmbedder",
    "LabelEmbedder",
    "MultiHeadSelfAttention",
    "modulate",
    "zeros_init",
    "xavier_uniform_init",
    "trunc_normal_init",
]

zeros_init = nn.initializers.zeros_init()
xavier_uniform_init = nn.initializers.xavier_uniform()


def trunc_normal_init(std: float = 0.02):
    """timm-style truncated normal (reference: tools/timm.py:8-40)."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, [cos | sin] ordering
    (reference: tools/nn.py:103-121, models/dit.py:55-74)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False, extra_tokens: int = 0):
    """Fixed 2D sin-cos positional table (reference: models/dit.py:307-354).
    Computed host-side in numpy; becomes a jit constant."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token and extra_tokens > 0:
        pos = np.concatenate([np.zeros([extra_tokens, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics (reference: tools/nn.py:16-19,
    normalization() :93-100). The reference upcasts the whole activation to
    f32 because fp16 lacks exponent range under AMP; bf16 shares f32's
    exponent, so on TPU only the mean/var reductions run in f32 (the flax
    default) while the normalization itself stays in the activation dtype —
    saving two full-tensor f32 HBM round-trips per call (~3.6 ms each at
    ADM-64 decoder resolution on v5e)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        # dtype must be pinned to the activation dtype: flax's default
        # (dtype=None) canonicalizes the result to promote(x.dtype,
        # param_dtype) = f32, re-creating exactly the two full-tensor f32
        # HBM round-trips described above. Stats still reduce in f32
        # (flax upcasts half-precision inputs inside _compute_stats).
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-5, dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


class Mlp(nn.Module):
    """Transformer MLP (reference: tools/timm.py:84-113)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # DiT-style xavier by default; ViT overrides with depth-scaled
    # trunc_normal to match the reference fix_init_weight rescale of
    # mlp.fc2 (reference: models/vit.py:383-389).
    kernel_init: Callable = xavier_uniform_init
    out_kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=self.kernel_init)(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(out_features, dtype=self.dtype,
                     kernel_init=self.out_kernel_init or self.kernel_init)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth (reference: tools/timm.py:43-63)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class PatchEmbed(nn.Module):
    """Conv patchify, NHWC -> [N, T, D] (timm PatchEmbed equivalent used at
    models/dit.py:192)."""

    patch_size: int
    embed_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # DiT initializes the patch projection xavier_uniform (reference
    # dit.py:207-210); ViT overrides with trunc_normal(0.02) to match its
    # _init_weights (reference vit.py:361, 391-394).
    kernel_init: Callable = xavier_uniform_init

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=self.kernel_init,
        )(x)
        n, h, w, d = x.shape
        return x.reshape(n, h * w, d)


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequency embedding + 2-layer MLP
    (reference: models/dit.py:41-79)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=trunc_normal_init(0.02))(t_freq)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=trunc_normal_init(0.02))(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG null-class dropout
    (reference: models/dit.py:82-110). When dropout_prob > 0 the table has an
    extra null row at index num_classes."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, labels, train: bool = False, force_drop_ids=None):
        use_cfg_embedding = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg_embedding), self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )
        if (train and use_cfg_embedding) or (force_drop_ids is not None):
            if force_drop_ids is None:
                rng = self.make_rng("label_dropout")
                drop_ids = (
                    jax.random.uniform(rng, (labels.shape[0],)) < self.dropout_prob
                )
            else:
                drop_ids = force_drop_ids == 1
            labels = jnp.where(drop_ids, self.num_classes, labels)
        return table(labels)


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV self-attention over [N, T, D] tokens with f32 softmax.
    TPU equivalent of timm Attention (models/dit.py:126) and the ADM
    QKVAttention (models/unet.py:362-394)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # Sequence parallelism: when set, x's token dim is a LOCAL shard of a
    # sequence sharded over this shard_map axis, and attention runs as a
    # ppermute ring (parallel/ring_attention.py). Only valid inside an
    # active shard_map providing the axis (parallel/sp_dit.py).
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import multi_head_attention

        n, t, d = x.shape
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=xavier_uniform_init)(x)
        from ..ops.attention import fused_tmajor_enabled, packed_qkv_enabled

        if self.seq_axis is None and fused_tmajor_enabled():
            # Fully t-major path: the Pallas kernel reads the raw [n,t,3d]
            # projection through lane-dim BlockSpec views and relayouts in
            # VMEM — zero host-side transposes around attention.
            from ..ops.attention import multi_head_attention_fused

            out = multi_head_attention_fused(qkv, self.num_heads)
        elif self.seq_axis is None and packed_qkv_enabled():
            # Packed path: hand the fused projection straight to the flash
            # wrapper ([n,t,3,H,hd] -> one transpose -> zero-copy BlockSpec
            # views at t==256). Avoids the lane-dim split + 3 d-major
            # transposes. (The further step of keeping the output d-major
            # into a DenseGeneral(axis=1) projection was MEASURED WORSE —
            # 174.0 vs 171.0 ms/step; XLA's folded contraction transpose
            # loses to the explicit one. PERF.md round 3.)
            from ..ops.attention import multi_head_attention_packed

            out = multi_head_attention_packed(
                qkv.reshape(n, t, 3, self.num_heads, head_dim))
        else:
            # split-then-reshape (not reshape-to-[...,3,H,hd]-then-slice):
            # strided 5D slicing forces XLA:TPU into minor-dim layout
            # copies on the qkv gradient path (~12% of DiT block time,
            # measured on v5e). The packed path above avoids BOTH.
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t, self.num_heads, head_dim)
            k = k.reshape(n, t, self.num_heads, head_dim)
            v = v.reshape(n, t, self.num_heads, head_dim)
            if self.seq_axis is not None:
                from ..parallel.ring_attention import ring_attention_local

                out = ring_attention_local(q, k, v, self.seq_axis)
            else:
                out = multi_head_attention(q, k, v)
        out = out.reshape(n, t, d)
        return nn.Dense(d, dtype=self.dtype, kernel_init=xavier_uniform_init)(out)


def modulate(x, shift, scale):
    """adaLN modulation (reference: models/dit.py:24-25)."""
    return x * (1 + scale[:, None]) + shift[:, None]


#: Selective-remat policies for `use_checkpoint` backbones. 'full' is the
#: reference CheckpointFunction semantics (recompute everything in the
#: backward, tools/nn.py:124-170); 'dots' saves MXU (matmul/conv) outputs
#: and recomputes only the elementwise tail — on TPU the backward then
#: skips the forward's matmul re-execution entirely, trading a slice of
#: the O(1)-memory win for ~25-30% less recompute FLOPs.
REMAT_POLICIES = {
    "full": None,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def remat_with_policy(module_cls, policy_name: str, **remat_kwargs):
    """nn.remat with a named policy from REMAT_POLICIES."""
    try:
        policy = REMAT_POLICIES[policy_name]
    except KeyError:
        raise ValueError(
            f"Unknown remat_policy {policy_name!r}; "
            f"expected one of {sorted(REMAT_POLICIES)}") from None
    if policy is not None:
        remat_kwargs["policy"] = policy
    return nn.remat(module_cls, **remat_kwargs)


class FusedUpsampleConv(nn.Module):
    """nearest-2x upsample + SAME 3x3 conv as one fused phase-conv
    (ops/upsample_conv.py — exact rewrite, 2.25x fewer MACs, no 4x-size
    upsampled intermediate in HBM). Param names/shapes/init identical to
    the nn.Conv it replaces (kernel [3,3,Cin,Cout] lecun-normal, bias
    zeros), so checkpoints interoperate. OPT-IN via VAW_FUSED_UPSAMPLE=1:
    the round-5 on-TPU A/B measured the fused lowering 10.7% slower on the
    256px VAE decode (phase de-stack formatting outweighs the MAC saving)
    and neutral on ADM-64 — see fused_upsample_conv_enabled()."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.upsample_conv import (
            fused_upsample_conv_enabled,
            nearest2x_conv3x3,
            nearest2x_conv3x3_reference,
        )

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x = x.astype(self.dtype)
        if fused_upsample_conv_enabled():
            # phase-kernel tap sums in f32 (the param dtype), THEN cast:
            # one rounding on the summed taps instead of summing already-
            # rounded bf16 weights — strictly closer to the unfused conv's
            # f32-accumulated arithmetic under an amp policy.
            y = nearest2x_conv3x3(x, kernel, kernel_dtype=self.dtype)
        else:
            y = nearest2x_conv3x3_reference(x, kernel.astype(self.dtype))
        return y + bias.astype(y.dtype)


# flax auto-names submodules by class __name__: alias to "Conv" so swapping
# an upsample+nn.Conv pair for this module leaves auto-indexed param trees
# (ResBlock's Conv_0/Conv_1/Conv_2) unchanged.
FusedUpsampleConv.__name__ = "Conv"
