"""DiT — adaLN-Zero diffusion transformer (Flax linen, NHWC).

TPU-first re-design of the reference DiT (reference: models/dit.py:157-298):
tokens stay [N, T, D] throughout; adaLN modulation fuses into the surrounding
matmuls under XLA; attention uses the shared f32-softmax MHA (Pallas flash
path for long sequences). Sizes S/B/L/XL match models/dit.py:361-382.

Contract (reference: models/dit.py:258-280): forward(x, t, y) returns
(out, zs) where zs is the REPA projector output at block `encoder_depth`
(None unless learn_align).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    LabelEmbedder,
    Mlp,
    MultiHeadSelfAttention,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    modulate,
    remat_with_policy,
    xavier_uniform_init,
    zeros_init,
)

__all__ = ["DiT", "DiT_S", "DiT_B", "DiT_L", "DiT_XL", "DiT_models"]


class DiTBlock(nn.Module):
    """One adaLN-Zero block (reference: models/dit.py:118-137). The 6-way
    modulation projection is zero-initialized so each block starts as
    identity (reference :232-235)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    seq_axis: Optional[str] = None  # sequence-parallel ring attention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * self.hidden_size, dtype=self.dtype,
                       kernel_init=zeros_init, bias_init=zeros_init)(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=jnp.float32)
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=jnp.float32)
        attn_out = MultiHeadSelfAttention(
            num_heads=self.num_heads, qkv_bias=True, dtype=self.dtype,
            seq_axis=self.seq_axis,
        )(modulate(norm1(x).astype(self.dtype), shift_msa, scale_msa))
        x = x + gate_msa[:, None] * attn_out
        mlp_out = Mlp(
            hidden_features=int(self.hidden_size * self.mlp_ratio),
            act=lambda y: nn.gelu(y, approximate=True), dtype=self.dtype,
        )(modulate(norm2(x).astype(self.dtype), shift_mlp, scale_mlp))
        x = x + gate_mlp[:, None] * mlp_out
        return x


class FinalLayer(nn.Module):
    """adaLN + zero-initialized linear head (reference: models/dit.py:140-155,
    zero init :238-241)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(2 * self.hidden_size, dtype=self.dtype,
                       kernel_init=zeros_init, bias_init=zeros_init)(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32)(x).astype(self.dtype)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, kernel_init=zeros_init, bias_init=zeros_init,
        )(x)


class DiT(nn.Module):
    image_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    learn_align: bool = False
    encoder_depth: int = 8
    z_dims: int = 768
    projector_dim: int = 2048
    # Rematerialize block activations in the backward pass (replaces the
    # reference's CheckpointFunction, tools/nn.py:124-170) — trades ~33%
    # extra FLOPs for O(depth) -> O(1) activation memory.
    use_checkpoint: bool = False
    # Selective remat: 'full' recomputes everything (the reference's
    # CheckpointFunction semantics); 'dots' saves matmul outputs and
    # recomputes only elementwise ops (jax.checkpoint_policies.
    # dots_with_no_batch_dims_saveable) — skips re-running the MXU work
    # in the backward at a modest activation-memory cost.
    remat_policy: str = "full"
    # Compile ONE block and lax.scan it over stacked [depth, ...] params:
    # O(depth) -> O(1) compile time (matters through slow remote-compile
    # paths) and the param layout pipeline parallelism consumes
    # (parallel/pipeline.py). Incompatible with the REPA tap (needs an
    # unrolled per-block tap point) and with the name-based TP rules.
    scan_blocks: bool = False
    # Sequence parallelism (TPU extension; parallel/sp_dit.py): the model
    # runs inside a shard_map whose `seq_axis` shards the image rows —
    # per-token compute stays local, attention rides the ppermute ring.
    seq_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False, force_drop_ids=None):
        """x: [N, H, W, C] (NHWC), t: [N], y: [N] int labels.
        Returns (out [N, H, W, C_out], zs or None)."""
        out_channels = self.in_channels * 2 if self.learn_sigma else self.in_channels
        assert not self.learn_align or self.encoder_depth > 0

        x = x.astype(self.dtype)
        local_h = x.shape[1] // self.patch_size  # rows of the token grid
        x = PatchEmbed(self.patch_size, self.hidden_size, dtype=self.dtype)(x)
        grid = self.image_size // self.patch_size
        pos_embed = get_2d_sincos_pos_embed(self.hidden_size, grid)  # constant
        pos_embed = jnp.asarray(pos_embed, self.dtype)
        if self.seq_axis is not None:
            # this shard owns token rows [idx*local_h, (idx+1)*local_h)
            idx = jax.lax.axis_index(self.seq_axis)
            table = pos_embed.reshape(grid, grid, self.hidden_size)
            table = jax.lax.dynamic_slice_in_dim(table, idx * local_h,
                                                 local_h, axis=0)
            pos_embed = table.reshape(local_h * grid, self.hidden_size)
        x = x + pos_embed[None]

        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype)(t)
        if self.num_classes > 0:
            assert y is not None
            c = c + LabelEmbedder(
                self.num_classes, self.hidden_size, self.class_dropout_prob
            )(y, train=train, force_drop_ids=force_drop_ids).astype(self.dtype)

        block_cls = (
            remat_with_policy(DiTBlock, self.remat_policy)
            if self.use_checkpoint else DiTBlock
        )
        zs = None
        if self.scan_blocks:
            assert not self.learn_align, (
                "scan_blocks is incompatible with the REPA tap"
            )
            x = self._scan_blocks(block_cls, x, c)
            x = FinalLayer(self.hidden_size, self.patch_size, out_channels,
                           dtype=self.dtype)(x, c)
            x = self._unpatchify(x, out_channels)
            return x.astype(jnp.float32), zs
        for i in range(self.depth):
            x = block_cls(self.hidden_size, self.num_heads, self.mlp_ratio,
                          seq_axis=self.seq_axis, dtype=self.dtype)(x, c)
            if self.learn_align and (i + 1) == self.encoder_depth:
                # REPA projector tap (reference: models/dit.py:27-34, 272-275).
                h = nn.Dense(self.projector_dim, dtype=self.dtype,
                             kernel_init=xavier_uniform_init)(x)
                h = nn.silu(h)
                h = nn.Dense(self.projector_dim, dtype=self.dtype,
                             kernel_init=xavier_uniform_init)(h)
                h = nn.silu(h)
                zs = nn.Dense(self.z_dims, dtype=self.dtype,
                              kernel_init=xavier_uniform_init)(h)

        x = FinalLayer(self.hidden_size, self.patch_size, out_channels,
                       dtype=self.dtype)(x, c)
        x = self._unpatchify(x, out_channels)
        return x.astype(jnp.float32), zs

    def _scan_blocks(self, block_cls, x, c):
        """lax.scan one compiled block over stacked [depth, ...] params."""
        seq_axis = self.seq_axis

        class Body(nn.Module):
            hidden_size: int
            num_heads: int
            mlp_ratio: float
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, x, c):
                x = block_cls(self.hidden_size, self.num_heads,
                              self.mlp_ratio, seq_axis=seq_axis,
                              dtype=self.dtype)(x, c)
                return x, None

        scan = nn.scan(
            Body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
            in_axes=nn.broadcast,
        )
        x, _ = scan(self.hidden_size, self.num_heads, self.mlp_ratio,
                    dtype=self.dtype, name="ScanBlocks")(x, c)
        return x

    def forward_with_cfg(self, x, t, y, cfg_scale: float = 1.0):
        """Batched-uncond CFG forward with the reference's 3-channel guidance
        quirk (reference: models/dit.py:282-298): guidance applies to the
        first 3 channels only, the rest pass through. Expects the combined
        [cond-half; cond-half] batch layout of the reference."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out, _ = self(combined, t, y)
        eps, rest = model_out[..., :3], model_out[..., 3:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)

    def _unpatchify(self, x, out_channels):
        """[N, T, p*p*C] -> [N, H, W, C] (reference: models/dit.py:243-256,
        producing NHWC directly instead of transposing to NCHW). Under
        sequence parallelism T is a row-shard of the square grid."""
        n, t, _ = x.shape
        p = self.patch_size
        w = self.image_size // self.patch_size
        if self.seq_axis is None:
            w = int(t ** 0.5)
        h = t // w
        assert h * w == t
        x = x.reshape(n, h, w, p, p, out_channels)
        x = jnp.einsum("nhwpqc->nhpwqc", x)
        return x.reshape(n, h * p, w * p, out_channels)


def _make_dit(hidden_size, depth, num_heads):
    def ctor(image_size, patch_size, in_channels, class_dropout_prob,
             num_classes, learn_sigma, **kwargs):
        return DiT(
            image_size=image_size, patch_size=patch_size or 2,
            in_channels=in_channels, hidden_size=hidden_size, depth=depth,
            num_heads=num_heads, class_dropout_prob=class_dropout_prob,
            num_classes=num_classes, learn_sigma=learn_sigma, **kwargs,
        )

    return ctor


# Size registry (reference: models/dit.py:361-382).
DiT_S = _make_dit(384, 12, 6)
DiT_B = _make_dit(768, 12, 12)
DiT_L = _make_dit(1024, 24, 16)
DiT_XL = _make_dit(1152, 28, 16)

DiT_models = {"DiT-S": DiT_S, "DiT-B": DiT_B, "DiT-L": DiT_L, "DiT-XL": DiT_XL}
