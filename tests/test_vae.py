"""AutoencoderKL tests: architecture shapes, moment handling, and the
torch->Flax converter validated against a synthetically-built diffusers
state dict (exact key/shape coverage without needing real weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.data.vae import convert_diffusers_vae
from vaw_tpu.models.vae import AutoencoderKL

BASE = 32
MULTS = (1, 2)
NRES = 1
LAT = 4


@pytest.fixture(scope="module")
def tiny_vae():
    return AutoencoderKL(base_channels=BASE, channel_mults=MULTS,
                         num_res_blocks=NRES, latent_channels=LAT)


def test_vae_shapes_roundtrip(tiny_vae):
    x = jnp.ones((2, 16, 16, 3))
    rng = jax.random.key(0)
    variables = tiny_vae.init(rng, x, rng)
    moments = tiny_vae.apply(variables, x, method=tiny_vae.encode)
    # one downsample (len(mults)-1 = 1) -> 8x8 spatial, 2*latent channels
    assert moments.shape == (2, 8, 8, 2 * LAT)
    z = AutoencoderKL.sample_latent(moments, rng)
    assert z.shape == (2, 8, 8, LAT)
    out = tiny_vae.apply(variables, z, method=tiny_vae.decode)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_moments_to_mean_std():
    moments = jnp.concatenate(
        [jnp.full((1, 2, 2, 4), 0.5), jnp.full((1, 2, 2, 4), 2.0)], axis=-1
    )
    ms = AutoencoderKL.moments_to_mean_std(moments)
    mean, std = jnp.split(ms, 2, axis=-1)
    np.testing.assert_allclose(mean, 0.5)
    np.testing.assert_allclose(std, np.exp(1.0), rtol=1e-5)


def _fake_diffusers_sd(base, mults, nres, lat):
    """Build a diffusers-style AutoencoderKL state dict with the exact keys
    and shapes of the real checkpoint (scaled down)."""
    rs = np.random.RandomState(0)
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def dense(name, cin, cout):
        sd[f"{name}.weight"] = rs.randn(cout, cin).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def resnet(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cin, cout, k=1)

    def attn(prefix, c):
        norm(f"{prefix}.group_norm", c)
        for p in ["to_q", "to_k", "to_v"]:
            dense(f"{prefix}.{p}", c, c)
        dense(f"{prefix}.to_out.0", c, c)

    # encoder
    conv("encoder.conv_in", 3, base)
    ch = base
    for i, mult in enumerate(mults):
        out_ch = base * mult
        for j in range(nres):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   ch if j == 0 else out_ch, out_ch)
        ch = out_ch
        if i != len(mults) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attn("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    norm("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", ch, 2 * lat)
    conv("quant_conv", 2 * lat, 2 * lat, k=1)

    # decoder
    conv("post_quant_conv", lat, lat, k=1)
    top = base * mults[-1]
    conv("decoder.conv_in", lat, top)
    resnet("decoder.mid_block.resnets.0", top, top)
    attn("decoder.mid_block.attentions.0", top)
    resnet("decoder.mid_block.resnets.1", top, top)
    ch = top
    for i, mult in enumerate(reversed(mults)):
        out_ch = base * mult
        for j in range(nres + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   ch if j == 0 else out_ch, out_ch)
        ch = out_ch
        if i != len(mults) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    norm("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", ch, 3)
    return sd


def test_converter_structure_matches_flax_init(tiny_vae):
    """Converted params must be tree-identical (names + shapes) to a fresh
    Flax init — guaranteeing real diffusers checkpoints load correctly."""
    sd = _fake_diffusers_sd(BASE, MULTS, NRES, LAT)
    converted = convert_diffusers_vae(sd, channel_mults=MULTS,
                                      num_res_blocks=NRES, base=BASE)

    x = jnp.ones((1, 16, 16, 3))
    rng = jax.random.key(0)
    init_params = tiny_vae.init(rng, x, rng)["params"]

    flat_init = jax.tree_util.tree_leaves_with_path(init_params)
    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    paths_init = {jax.tree_util.keystr(p): l.shape for p, l in flat_init}
    paths_conv = {jax.tree_util.keystr(p): l.shape for p, l in flat_conv}
    assert paths_init == paths_conv, (
        set(paths_init) ^ set(paths_conv) or
        {k: (paths_init[k], paths_conv[k]) for k in paths_init
         if paths_init[k] != paths_conv[k]}
    )

    # And the converted params actually run.
    out = tiny_vae.apply({"params": converted}, x, rng)
    recon, moments = out
    assert recon.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_bf16_decode_close_to_f32():
    """The sampling path runs the decoder in bf16 (decode share profiled at
    48-61% of the CFG pipeline, PERF.md). GroupNorm keeps f32 params and
    f32 mean/var reductions but normalizes/stores in the module dtype —
    same decision as models/layers.py:GroupNorm32. Decoded images must stay
    within a small fraction of the [-1,1] range of the f32 decode, and the
    SAME f32 param tree must be loadable by both dtypes."""
    f32 = AutoencoderKL(base_channels=BASE, channel_mults=MULTS,
                        num_res_blocks=NRES, latent_channels=LAT)
    b16 = AutoencoderKL(base_channels=BASE, channel_mults=MULTS,
                        num_res_blocks=NRES, latent_channels=LAT,
                        dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3),
                    jnp.float32)
    variables = f32.init(rng, x, rng)
    z = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, LAT),
                    jnp.float32)
    out32 = f32.apply(variables, z, method=f32.decode)
    out16 = b16.apply(variables, z, method=b16.decode)
    assert out32.dtype == out16.dtype == jnp.float32  # conv_out is f32
    diff = float(jnp.abs(out32 - out16).max())
    # tanh-free decoder output is roughly unit-scale at init; 0.1 absolute
    # is ~1-2% of the dynamic range after the caller's [-1,1]->uint8 map.
    assert diff < 0.1, diff
