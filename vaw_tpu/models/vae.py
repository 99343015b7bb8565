"""AutoencoderKL — the SD VAE used for latent-space training.

TPU-native replacement for the reference's diffusers dependency
(`AutoencoderKL.from_pretrained("stabilityai/sd-vae-ft-{ema,mse}")`,
reference: tools/sampler.py:104, preprocessing/encode_latent.py): a Flax
implementation of the same architecture (ch=128, mults (1,2,4,4), 2 resnet
blocks, mid attention, 4-channel latents) in NHWC, plus a converter from
diffusers torch checkpoints (data/vae.py). The encoder emits [mean | logvar]
moments; training storage keeps [mean | std] (encode_latent.py:95-100) and
the 0.18215 latent scale lives in the caller (trainer/sampler), matching
the reference wiring.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AutoencoderKL", "Encoder", "Decoder"]


def _gn(x, dtype=jnp.float32):
    """GroupNorm with f32 parameters and f32 mean/var reductions (the flax
    default), but normalization arithmetic + storage in the module dtype.
    Under a bf16 decoder the old f32-forced output made every GN+silu a
    full-tensor f32 HBM round-trip — at 256px decode resolution that is
    ~2-3 GB/img of pure elementwise traffic on a decode that PERF.md
    measures at 48-61% of the whole sampling pipeline. Same decision as
    models/layers.py:GroupNorm32 for the UNet."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype,
                        param_dtype=jnp.float32)(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x, self.dtype))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv1")(h)
        h = nn.silu(_gn(h, self.dtype))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = _gn(x, self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        q = q.reshape(n, h * w, c)
        k = k.reshape(n, h * w, c)
        v = v.reshape(n, h * w, c)
        logits = jnp.einsum("nqc,nkc->nqk", q, k,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits * (c ** -0.5), axis=-1)
        out = jnp.einsum("nqk,nkc->nqc", weights.astype(v.dtype), v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(n, h, w, c)


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # SD VAE pads (0, 1) on H and W before a stride-2 VALID conv.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # fused nearest-2x + 3x3 phase conv (ops/upsample_conv.py): the
        # upsample convs are ~56% of the decoder's 619 GF/img
        from .layers import FusedUpsampleConv

        return FusedUpsampleConv(x.shape[-1], dtype=self.dtype,
                                 name="conv")(x)


class Encoder(nn.Module):
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, mult in enumerate(self.channel_mults):
            ch = self.base_channels * mult
            for j in range(self.num_res_blocks):
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
            if i != len(self.channel_mults) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.silu(_gn(h, self.dtype))
        moments = nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                          dtype=self.dtype, name="conv_out")(h)
        moments = nn.Conv(2 * self.latent_channels, (1, 1),
                          dtype=self.dtype, name="quant_conv")(moments)
        return moments  # [N, H/8, W/8, 2*latent] = [mean | logvar]


class Decoder(nn.Module):
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    latent_channels: int = 4
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z.astype(self.dtype))
        ch = self.base_channels * self.channel_mults[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_2")(h)
        for i, mult in enumerate(reversed(self.channel_mults)):
            ch = self.base_channels * mult
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"up_{i}_block_{j}")(h)
            if i != len(self.channel_mults) - 1:
                h = Upsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.silu(_gn(h, self.dtype))
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode(x) -> [mean | logvar] moments; decode(z) -> image.
    sample(moments, rng) draws mean + std*eps (the reference stores
    [mean | std] and re-samples at train time, tools/trainer.py:21-25)."""

    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.base_channels, self.channel_mults, self.num_res_blocks,
            self.latent_channels, self.dtype,
        )
        self.decoder = Decoder(
            self.base_channels, self.channel_mults, self.num_res_blocks,
            self.latent_channels, 3, self.dtype,
        )

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng):
        moments = self.encode(x)
        z = self.sample_latent(moments, rng)
        return self.decode(z), moments

    @staticmethod
    def sample_latent(moments, rng):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    @staticmethod
    def moments_to_mean_std(moments):
        """[mean | logvar] -> [mean | std], the HDF5 storage layout
        (reference: preprocessing/encode_latent.py:95-100)."""
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return jnp.concatenate([mean, std], axis=-1)
