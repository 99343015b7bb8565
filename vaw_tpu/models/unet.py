"""ADM UNet + EncoderUNet classifier (Flax linen, NHWC).

TPU-first re-design of the guided-diffusion UNet
(reference: models/unet.py:397-918): channels-last convs (XLA:TPU's preferred
layout), f32 GroupNorm under a bf16 compute policy, attention via the shared
f32-softmax MHA, and `nn.remat` replacing the custom CheckpointFunction
(reference: tools/nn.py:124-170). Size registry and per-resolution defaults
match models/unet.py:921-1032.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import (FusedUpsampleConv, GroupNorm32,
                     remat_with_policy, timestep_embedding, zeros_init)

__all__ = [
    "UNetModel",
    "EncoderUNetModel",
    "create_unet_model",
    "UNet_32", "ADM_32", "ADM_64", "ADM_128", "ADM_256", "ADM_512",
    "UNet_64", "LDM", "UNet_models",
]


def _conv(features, kernel=3, stride=1, zero_init=False, dtype=jnp.float32,
          name=None):
    # torch Conv2d(padding=1) pads symmetrically; XLA "SAME" at stride 2
    # pads (0, 1) instead, shifting every window by one pixel (caught by the
    # reference-parity suite on the Downsample conv). Use explicit symmetric
    # padding to match the reference (models/unet.py:126-136).
    from ..ops.conv2d import use_pallas_conv

    if kernel == 3 and stride == 1 and use_pallas_conv():
        return PallasConv3x3(features, zero_init=zero_init, dtype=dtype,
                             name=name)
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dtype=dtype, name=name,
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        bias_init=zeros_init,
    )


class PallasConv3x3(nn.Module):
    """Drop-in nn.Conv replacement routing the stride-1 3x3 convs to the
    Pallas implicit-GEMM kernel (ops/conv2d.py — the ADM-64 hot path,
    reference: models/unet.py:397-687). Identical param names/shapes
    (kernel [3,3,Cin,Cout], bias [Cout]) so checkpoints interoperate;
    falls back to lax.conv for unsupported spatial shapes."""

    features: int
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            zeros_init if self.zero_init else nn.initializers.lecun_normal(),
            (3, 3, cin, self.features))
        bias = self.param("bias", zeros_init, (self.features,))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        from ..ops.conv2d import conv3x3, conv3x3_supported

        if conv3x3_supported(x.shape, self.features,
                             itemsize=jnp.dtype(self.dtype).itemsize):
            y = conv3x3(x, k)
        else:
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


# Flax auto-names submodules by class __name__: without this, routing a
# conv to PallasConv3x3 would move its params from "Conv_N" to
# "PallasConv3x3_N" (and shift the sibling Conv indices), silently breaking
# checkpoint interop between VAW_PALLAS_CONV modes. Aligning the class name
# keeps the param tree IDENTICAL in both modes (kernel/bias shapes already
# match), which test_pallas_conv_param_tree_matches_xla locks in.
PallasConv3x3.__name__ = "Conv"


# single definition of the nearest-2x helper (also used by the fused
# upsample phase-conv's unfused reference path)
from ..ops.upsample_conv import upsample_nearest2x as _upsample_nearest


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample + optional conv
    (reference: models/unet.py:81-110)."""

    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return FusedUpsampleConv(self.out_channels or x.shape[-1],
                                     dtype=self.dtype)(x)
        return _upsample_nearest(x)


class Downsample(nn.Module):
    """Stride-2 conv or 2x avg-pool (reference: models/unet.py:113-140)."""

    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return _conv(self.out_channels or x.shape[-1], stride=2,
                         dtype=self.dtype)(x)
        return _avg_pool2(x)


class ResBlock(nn.Module):
    """FiLM residual block with optional scale-shift norm and fused
    up/downsampling (reference: models/unet.py:143-256). The output conv is
    zero-initialized (reference: tools/nn.py:68-76)."""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        out_ch = self.out_channels or x.shape[-1]

        h = GroupNorm32()(x)
        h = nn.silu(h)
        if self.up:
            # fused nearest-2x + conv (exact rewrite, ops/upsample_conv.py)
            x = _upsample_nearest(x)
            h = FusedUpsampleConv(out_ch, dtype=self.dtype)(h)
        else:
            if self.down:
                h = _avg_pool2(h)
                x = _avg_pool2(x)
            h = _conv(out_ch, dtype=self.dtype)(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32()(h) * (1 + scale[:, None, None]) + shift[:, None, None]
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _conv(out_ch, zero_init=True, dtype=self.dtype)(h)
        else:
            h = h + emb_out[:, None, None]
            h = GroupNorm32()(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _conv(out_ch, zero_init=True, dtype=self.dtype)(h)

        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with zero-initialized projection
    (reference: models/unet.py:259-307)."""

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = (
            self.num_heads if self.num_head_channels == -1
            else c // self.num_head_channels
        )
        assert c % heads == 0
        tokens = x.reshape(n, h * w, c)
        y = GroupNorm32()(tokens)
        qkv = nn.Dense(3 * c, dtype=self.dtype)(y)
        hd = c // heads
        from ..ops.attention import multi_head_attention_packed, \
            packed_qkv_enabled

        if packed_qkv_enabled():
            # one 2D swapaxes + leading slices (PERF.md round-3 packed-QKV
            # table) instead of the lane-dim split + 3 d-major transposes
            out = multi_head_attention_packed(
                qkv.reshape(n, h * w, 3, heads, hd))
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = multi_head_attention(
                q.reshape(n, h * w, heads, hd),
                k.reshape(n, h * w, heads, hd),
                v.reshape(n, h * w, heads, hd),
            )
        out = out.reshape(n, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                       bias_init=zeros_init)(out)
        return (tokens + out).reshape(n, h, w, c)


class UNetModel(nn.Module):
    """Full ADM UNet (reference: models/unet.py:397-687). NHWC contract:
    forward(x [N,H,W,C], t [N], y [N]?) -> [N,H,W,C_out]."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: int = 0
    use_checkpoint: bool = False
    # 'full' recomputes everything in the backward; 'dots' saves MXU
    # (matmul/conv) outputs and recomputes only elementwise ops.
    remat_policy: str = "full"
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    drop_label_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, train: bool = False,
                 force_drop_ids=None):
        assert (y is not None) == (self.num_classes > 0), (
            "must specify y iff the model is class-conditional"
        )
        deterministic = not train
        num_heads_upsample = (
            self.num_heads if self.num_heads_upsample == -1
            else self.num_heads_upsample
        )
        # Latent UNets use a fixed 512-wide time embedding
        # (reference: models/unet.py:473-477).
        time_embed_dim = 512 if self.in_channels == 4 else self.model_channels * 4

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype)(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype)(nn.silu(emb))

        if self.num_classes > 0:
            use_cfg = self.drop_label_prob > 0
            if (use_cfg and train) or (force_drop_ids is not None):
                # CFG label dropout (reference: models/unet.py:644-653).
                if force_drop_ids is None:
                    rng = self.make_rng("label_dropout")
                    drop_ids = (
                        jax.random.uniform(rng, (y.shape[0],))
                        < self.drop_label_prob
                    )
                else:
                    drop_ids = force_drop_ids == 1
                y = jnp.where(drop_ids, self.num_classes, y)
            emb = emb + nn.Embed(
                self.num_classes + int(use_cfg), time_embed_dim,
            )(y).astype(emb.dtype)

        res_block = ResBlock
        attn_block = AttentionBlock
        if self.use_checkpoint:
            res_block = remat_with_policy(ResBlock, self.remat_policy,
                                          static_argnums=(3,))
            attn_block = remat_with_policy(AttentionBlock, self.remat_policy)

        ch = int(self.channel_mult[0] * self.model_channels)
        h = _conv(ch, dtype=self.dtype)(x.astype(self.dtype))
        hs = [h]
        ds = 1
        # --- encoder -------------------------------------------------- #
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = res_block(
                    out_channels=ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                )(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn_block(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                    )(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res_block(
                        out_channels=ch, dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True, dtype=self.dtype,
                    )(h, emb, deterministic)
                else:
                    h = Downsample(self.conv_resample, out_channels=ch,
                                   dtype=self.dtype)(h)
                hs.append(h)
                ds *= 2

        # --- middle --------------------------------------------------- #
        h = res_block(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype,
        )(h, emb, deterministic)
        h = attn_block(
            num_heads=self.num_heads, num_head_channels=self.num_head_channels,
            dtype=self.dtype,
        )(h)
        h = res_block(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype,
        )(h, emb, deterministic)

        # --- decoder -------------------------------------------------- #
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(self.model_channels * mult)
                h = res_block(
                    out_channels=ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                )(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn_block(
                        num_heads=num_heads_upsample,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                    )(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res_block(
                            out_channels=ch, dropout=self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True, dtype=self.dtype,
                        )(h, emb, deterministic)
                    else:
                        h = Upsample(self.conv_resample, out_channels=ch,
                                     dtype=self.dtype)(h)
                    ds //= 2
        assert not hs

        h = GroupNorm32()(h)
        h = nn.silu(h)
        return _conv(self.out_channels, zero_init=True,
                     dtype=jnp.float32)(h).astype(jnp.float32)


class SuperResModel(nn.Module):
    """Super-resolution UNet: conditions on a bilinear-upsampled low-res
    image concatenated on the channel axis (reference: models/unet.py:690-704).
    """

    unet: UNetModel

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, y=None,
                 train: bool = False, force_drop_ids=None):
        assert low_res is not None
        n, h, w, _ = x.shape
        upsampled = jax.image.resize(
            low_res, (n, h, w, low_res.shape[-1]), method="bilinear"
        )
        x = jnp.concatenate([x, upsampled], axis=-1)
        return self.unet(x, timesteps, y=y, train=train,
                         force_drop_ids=force_drop_ids)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference: models/unet.py:22-51)."""

    num_head_channels: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=1 / c ** 0.5), (h * w + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)
        heads = c // self.num_head_channels
        qkv = nn.Dense(3 * c, dtype=self.dtype)(tokens)
        qkv = qkv.reshape(n, h * w + 1, 3, heads, c // heads)
        out = multi_head_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        out = out.reshape(n, h * w + 1, c)
        out = nn.Dense(self.output_dim, dtype=self.dtype)(out)
        return out[:, 0]


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier with adaptive / attention / spatial pooling
    (reference: models/unet.py:707-918). forward(x, t) -> [N, out_channels].
    Used for classifier guidance (tools/sampler.py:51-89)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "adaptive"
    use_checkpoint: bool = False
    remat_policy: str = "full"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, train: bool = False):
        deterministic = not train
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype)(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype)(nn.silu(emb))

        res_block, attn_block = ResBlock, AttentionBlock
        if self.use_checkpoint:
            res_block = remat_with_policy(ResBlock, self.remat_policy,
                                          static_argnums=(3,))
            attn_block = remat_with_policy(AttentionBlock,
                                           self.remat_policy)

        ch = int(self.channel_mult[0] * self.model_channels)
        h = _conv(ch, dtype=self.dtype)(x.astype(self.dtype))
        results = []
        if self.pool.startswith("spatial"):
            results.append(h.mean(axis=(1, 2)))
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = res_block(
                    out_channels=ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                )(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn_block(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                    )(h)
                if self.pool.startswith("spatial"):
                    results.append(h.mean(axis=(1, 2)))
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res_block(
                        out_channels=ch, dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True, dtype=self.dtype,
                    )(h, emb, deterministic)
                else:
                    h = Downsample(self.conv_resample, out_channels=ch,
                                   dtype=self.dtype)(h)
                if self.pool.startswith("spatial"):
                    results.append(h.mean(axis=(1, 2)))
                ds *= 2

        h = res_block(dropout=self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype)(h, emb, deterministic)
        h = attn_block(num_heads=self.num_heads,
                           num_head_channels=self.num_head_channels,
                           dtype=self.dtype)(h)
        h = res_block(dropout=self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype)(h, emb, deterministic)

        if self.pool == "adaptive":
            h = GroupNorm32()(h)
            h = nn.silu(h)
            h = h.mean(axis=(1, 2))
            return nn.Dense(self.out_channels, kernel_init=zeros_init,
                            bias_init=zeros_init)(h)
        if self.pool == "attention":
            assert self.num_head_channels != -1
            h = GroupNorm32()(h)
            h = nn.silu(h)
            return AttentionPool2d(
                num_head_channels=self.num_head_channels,
                output_dim=self.out_channels, dtype=self.dtype,
            )(h)
        if self.pool.startswith("spatial"):
            results.append(h.mean(axis=(1, 2)))
            h = jnp.concatenate(results, axis=-1)
            h = nn.Dense(2048, dtype=self.dtype)(h)
            if self.pool == "spatial_v2":
                h = GroupNorm32()(h[:, None, None, :])[:, 0, 0, :]
                h = nn.silu(h)
            else:
                h = nn.relu(h)
            return nn.Dense(self.out_channels)(h)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")


# ------------------------------------------------------------------- #
# size registry (reference: models/unet.py:921-1032)
# ------------------------------------------------------------------- #


def create_unet_model(
    image_size,
    num_channels,
    num_res_blocks,
    channel_mult="",
    in_channels=3,
    num_classes=10,
    learn_sigma=False,
    class_cond=True,
    use_checkpoint=False,
    remat_policy="full",
    attention_resolutions="16",
    num_heads=1,
    num_head_channels=-1,
    num_heads_upsample=-1,
    use_scale_shift_norm=True,
    dropout=0,
    resblock_updown=True,
    drop_label_prob=0.0,
    dtype=jnp.float32,
):
    if channel_mult == "":
        channel_mult = {
            512: (0.5, 1, 1, 2, 2, 4, 4),
            256: (1, 1, 2, 2, 4, 4),
            128: (1, 1, 2, 3, 4),
            64: (1, 2, 3, 4),
            32: (1, 2, 2, 2),
        }.get(image_size)
        if channel_mult is None:
            raise ValueError(f"unsupported image size: {image_size}")
    else:
        channel_mult = tuple(int(m) for m in channel_mult.split(","))

    attention_ds = tuple(
        image_size // int(res) for res in attention_resolutions.split(",")
    )
    return UNetModel(
        image_size=image_size,
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=(in_channels if not learn_sigma else 2 * in_channels),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        num_classes=(num_classes if class_cond else 0),
        use_checkpoint=use_checkpoint,
        remat_policy=remat_policy,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        drop_label_prob=drop_label_prob,
        dtype=dtype,
    )


def UNet_32(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
            class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=32, num_channels=128, num_res_blocks=2,
        attention_resolutions="16,8", num_heads=4, num_head_channels=-1,
        num_classes=num_classes, dropout=dropout, in_channels=in_channels,
        drop_label_prob=drop_label_prob, learn_sigma=learn_sigma,
        class_cond=class_cond, **kwargs)


def ADM_32(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
           class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=32, num_channels=128, num_res_blocks=3,
        attention_resolutions="16,8", num_heads=1, num_head_channels=32,
        num_classes=num_classes, dropout=dropout, in_channels=in_channels,
        drop_label_prob=drop_label_prob, learn_sigma=learn_sigma,
        class_cond=class_cond, **kwargs)


def ADM_64(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
           class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=64, num_channels=192, num_res_blocks=3,
        attention_resolutions="32,16,8", num_heads=1, num_head_channels=64,
        num_classes=num_classes, dropout=dropout, in_channels=in_channels,
        drop_label_prob=drop_label_prob, learn_sigma=learn_sigma,
        class_cond=class_cond, **kwargs)


def ADM_128(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
            class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=128, num_channels=256, num_res_blocks=2,
        attention_resolutions="32,16,8", num_heads=1, num_head_channels=64,
        num_classes=num_classes, dropout=dropout, in_channels=in_channels,
        drop_label_prob=drop_label_prob, learn_sigma=learn_sigma,
        class_cond=class_cond, **kwargs)


def ADM_256(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
            class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=256, num_channels=256, num_res_blocks=2,
        attention_resolutions="32,16,8", num_heads=1, num_head_channels=64,
        num_classes=num_classes, dropout=dropout, in_channels=in_channels,
        drop_label_prob=drop_label_prob, learn_sigma=learn_sigma,
        class_cond=class_cond, **kwargs)


def ADM_512(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
            class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=512, num_channels=256, num_res_blocks=2,
        attention_resolutions="32,16,8", num_heads=1, num_head_channels=64,
        num_classes=num_classes, dropout=dropout, in_channels=in_channels,
        drop_label_prob=drop_label_prob, learn_sigma=learn_sigma,
        class_cond=class_cond, **kwargs)


def UNet_64(num_classes=10, in_channels=3, dropout=0, learn_sigma=False,
            class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=64, num_channels=192, num_res_blocks=3,
        attention_resolutions="16,8", num_heads=4, channel_mult="1,2,2,2",
        num_head_channels=-1, num_classes=num_classes, dropout=dropout,
        in_channels=in_channels, drop_label_prob=drop_label_prob,
        learn_sigma=learn_sigma, class_cond=class_cond, **kwargs)


def LDM(num_classes=10, in_channels=4, dropout=0, learn_sigma=False,
        class_cond=True, drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=32, num_channels=256, num_res_blocks=2,
        attention_resolutions="32,16,8", num_heads=1, channel_mult="1,2,4",
        num_head_channels=32, num_classes=num_classes, dropout=dropout,
        in_channels=in_channels, learn_sigma=learn_sigma,
        class_cond=class_cond, drop_label_prob=drop_label_prob, **kwargs)


UNet_models = {
    "UNet-32": UNet_32,
    "ADM-32": ADM_32,
    "ADM-64": ADM_64,
    "ADM-128": ADM_128,
    "ADM-256": ADM_256,
    "ADM-512": ADM_512,
    "UNet-64": UNet_64,
    "LDM": LDM,
}
