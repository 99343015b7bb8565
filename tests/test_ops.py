"""Op-pack tests: flash attention vs XLA reference (fwd + grads),
fused bias+leaky-relu (values, grad, double-backward), upfirdn2d vs a naive
reference implementation (values, grads, resampling shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

import vaw_tpu.ops.flash_attention as fa
from vaw_tpu.ops.attention import _xla_attention, multi_head_attention
from vaw_tpu.ops.fused_act import fused_leaky_relu
from vaw_tpu.ops.upfirdn2d import (
    blur,
    downsample2d,
    make_kernel,
    upfirdn2d,
    upsample2d,
)


# ------------------------------------------------------------------- #
# flash attention
# ------------------------------------------------------------------- #


@pytest.fixture
def small_blocks(monkeypatch):
    monkeypatch.setattr(fa, "DEFAULT_BLOCK_Q", 32)
    monkeypatch.setattr(fa, "DEFAULT_BLOCK_K", 32)


def _rand_qkv(rng, b, t, h, d):
    ks = jax.random.split(rng, 3)
    return tuple(jax.random.normal(k, (b, t, h, d)) for k in ks)


def test_flash_matches_xla_forward(small_blocks):
    q, k, v = _rand_qkv(jax.random.key(0), 2, 64, 2, 8)
    out_flash = fa.flash_attention(q, k, v)
    out_ref = _xla_attention(q, k, v, 1.0 / np.sqrt(8))
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5)


def test_flash_query_padding(small_blocks):
    # seq_q = 48 pads to 64 with 32-blocks; seq_k stays 64.
    q, _, _ = _rand_qkv(jax.random.key(1), 2, 48, 2, 8)
    _, k, v = _rand_qkv(jax.random.key(2), 2, 64, 2, 8)
    out_flash = fa.flash_attention(q, k, v)
    out_ref = _xla_attention(q, k, v, 1.0 / np.sqrt(8))
    assert out_flash.shape == (2, 48, 2, 8)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5)


def test_flash_gradients_match_xla(small_blocks):
    q, k, v = _rand_qkv(jax.random.key(3), 1, 64, 2, 8)
    w = jax.random.normal(jax.random.key(4), (1, 64, 2, 8))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, 1.0 / np.sqrt(8)) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=f"d{name}")


def test_mha_routes_and_matches():
    """multi_head_attention with use_pallas=True == XLA path."""
    q, k, v = _rand_qkv(jax.random.key(5), 1, 64, 2, 8)
    np.testing.assert_allclose(
        multi_head_attention(q, k, v, use_pallas=True),
        multi_head_attention(q, k, v, use_pallas=False),
        atol=2e-5,
    )


# ------------------------------------------------------------------- #
# fused bias + leaky relu
# ------------------------------------------------------------------- #


def test_fused_leaky_relu_values():
    x = jnp.array([[-2.0, -0.5, 0.0, 1.0]])
    b = jnp.array([1.0, 0.0, -1.0, 0.5])
    out = fused_leaky_relu(x, b, 0.2, 2.0)
    y = np.array([-1.0, -0.5, -1.0, 1.5])
    expected = np.where(y >= 0, y, y * 0.2) * 2.0
    np.testing.assert_allclose(out[0], expected, rtol=1e-6)


def test_fused_leaky_relu_grad_and_double_backward():
    """First and second-order grads (the CUDA grad=1/grad=2 paths,
    reference: tools/op/fused_bias_act_kernel.cu:40-61)."""
    x = jnp.array([[-1.5, 0.5, 2.0, -0.1]])
    b = jnp.zeros(4)

    def f(x):
        return jnp.sum(fused_leaky_relu(x, b, 0.2, 2.0) ** 2)

    g = jax.grad(f)(x)
    # d/dx (s*m*x)^2 = 2*(s*m)^2*x with m in {1, 0.2}, s=2.
    m = np.where(np.asarray(x[0]) >= 0, 1.0, 0.2)
    np.testing.assert_allclose(g[0], 2 * (2.0 * m) ** 2 * np.asarray(x[0]),
                               rtol=1e-5)
    # Double backward: Hessian diagonal = 2*(s*m)^2.
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x)))(x)
    np.testing.assert_allclose(h[0], 2 * (2.0 * m) ** 2, rtol=1e-5)


def test_fused_leaky_relu_bias_grad():
    x = jax.random.normal(jax.random.key(0), (3, 4, 4, 8))
    b = jax.random.normal(jax.random.key(1), (8,))
    g = jax.grad(lambda b: jnp.sum(fused_leaky_relu(x, b)))(b)
    y = np.asarray(x) + np.asarray(b)
    expected = (np.where(y >= 0, 1.0, 0.2) * np.sqrt(2)).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(g, expected, rtol=1e-4)


# ------------------------------------------------------------------- #
# upfirdn2d
# ------------------------------------------------------------------- #


def _naive_upfirdn(x, k, up, down, pad0, pad1):
    """Direct re-derivation of the reference native algorithm
    (reference: tools/op/upfirdn2d.py:168-209) for a single [h, w] plane."""
    h, w = x.shape
    stuffed = np.zeros((h * up, w * up))
    stuffed[::up, ::up] = x
    p00, p01 = max(pad0, 0), max(pad1, 0)
    arr = np.pad(stuffed, ((p00, p01), (p00, p01)))
    c0, c1 = max(-pad0, 0), max(-pad1, 0)
    arr = arr[c0: arr.shape[0] - c1, c0: arr.shape[1] - c1]
    out = signal.convolve2d(arr, k, mode="valid")
    return out[::down, ::down]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 2)),
    (1, 1, (-1, 2)),
])
def test_upfirdn2d_matches_naive(up, down, pad):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 6, 6, 3).astype(np.float32)
    k = make_kernel([1, 3, 3, 1])
    out = np.asarray(upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad))
    for n in range(2):
        for c in range(3):
            expected = _naive_upfirdn(x[n, :, :, c], k, up, down, *pad)
            np.testing.assert_allclose(
                out[n, :, :, c], expected, atol=1e-5,
                err_msg=f"up={up} down={down} pad={pad}",
            )


def test_upsample_downsample_shapes_and_dc():
    x = jnp.ones((1, 8, 8, 2))
    up = upsample2d(x)
    assert up.shape == (1, 16, 16, 2)
    # DC preservation: constant input stays ~constant in the interior.
    np.testing.assert_allclose(np.asarray(up)[0, 4:12, 4:12, 0], 1.0,
                               rtol=1e-5)
    down = downsample2d(x)
    assert down.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(down)[0, 1:3, 1:3, 0], 1.0,
                               rtol=1e-5)
    b = blur(x)
    assert b.shape[1] >= 8


def test_upfirdn2d_differentiable_to_second_order():
    x = jax.random.normal(jax.random.key(0), (1, 6, 6, 2))
    k = make_kernel([1, 2, 1])

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=2, pad=(1, 1)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(h)).all()


def test_conv3x3_pallas_interpret_fwd_bwd():
    """Pallas implicit-GEMM conv (ops/conv2d.py): fwd + custom-vjp dgrad/
    wgrad vs lax.conv, in interpreter mode (semantics; the TPU timing
    lives in probes/_conv_probe.py)."""
    import functools

    from jax.experimental import pallas as pl

    import vaw_tpu.ops.conv2d as c2

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 16, 8, 24), jnp.float32)
        w = jnp.asarray(rs.randn(3, 3, 24, 16) * 0.1, jnp.float32)
        g = jnp.asarray(rs.randn(2, 16, 8, 16), jnp.float32)

        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(c2.conv3x3(x, w)),
                                   np.asarray(ref), atol=2e-5, rtol=1e-5)

        def loss(conv):
            return lambda x, w: jnp.sum(conv(x, w) * g)

        ref_conv = lambda x, w: jax.lax.conv_general_dilated(  # noqa: E731
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        dx_p, dw_p = jax.grad(loss(c2.conv3x3), argnums=(0, 1))(x, w)
        dx_r, dw_r = jax.grad(loss(ref_conv), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r),
                                   atol=2e-4, rtol=1e-4)
    finally:
        pl.pallas_call = orig


def test_packed_qkv_attention_matches_unpacked():
    """multi_head_attention_packed (fused-projection entry) must be
    numerically identical to split + multi_head_attention on both paths
    (flash interpret + xla math), including gradients."""
    import jax
    import jax.numpy as jnp
    from vaw_tpu.ops.attention import (
        multi_head_attention, multi_head_attention_packed,
    )

    rs = np.random.RandomState(3)
    b, t, h, d = 2, 64, 4, 16
    qkv = jnp.asarray(rs.randn(b, t, 3, h, d), jnp.float32)

    for use_pallas in (False, True):
        ref = multi_head_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
            use_pallas=use_pallas)
        out = multi_head_attention_packed(qkv, use_pallas=use_pallas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        def loss_p(a, up=use_pallas):
            return jnp.sum(multi_head_attention_packed(a, use_pallas=up) ** 2)

        def loss_u(a, up=use_pallas):
            return jnp.sum(multi_head_attention(
                a[:, :, 0], a[:, :, 1], a[:, :, 2], use_pallas=up) ** 2)

        gp = jax.grad(loss_p)(qkv)
        gu = jax.grad(loss_u)(qkv)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gu),
                                   atol=3e-4, rtol=3e-4)


def test_packed5_zero_copy_flash_matches_math():
    """The zero-copy packed kernel (_flash_p5: q/k/v as BlockSpec views of
    one [b,3,h,d,t] buffer, dqkv as one output) must match the math path
    at its gating shape (t == 256) for both outputs and grads."""
    import jax
    import jax.numpy as jnp
    from vaw_tpu.ops.attention import (
        multi_head_attention, multi_head_attention_packed,
    )
    from vaw_tpu.ops.flash_attention import _packed5_supported

    rs = np.random.RandomState(7)
    b, t, h, d = 2, 256, 8, 16
    assert _packed5_supported(b, h, d, t)
    qkv = jnp.asarray(rs.randn(b, t, 3, h, d) * 0.3, jnp.float32)

    ref = multi_head_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                               use_pallas=False)
    out = multi_head_attention_packed(qkv, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_p(a):
        return jnp.sum(multi_head_attention_packed(a, use_pallas=True) ** 2)

    def loss_u(a):
        return jnp.sum(multi_head_attention(
            a[:, :, 0], a[:, :, 1], a[:, :, 2], use_pallas=False) ** 2)

    gp = jax.grad(loss_p)(qkv)
    gu = jax.grad(loss_u)(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gu),
                               atol=5e-4, rtol=5e-4)

    # d_major_out layout contract: [b, h*d, t] == transpose of the default
    dm = multi_head_attention_packed(qkv, use_pallas=True, d_major_out=True)
    np.testing.assert_allclose(
        np.asarray(dm),
        np.asarray(out).transpose(0, 2, 3, 1).reshape(b, h * d, t),
        atol=2e-5, rtol=2e-5)


def test_p6_tmajor_fused_flash_matches_math():
    """_flash_p6: the fully t-major kernel (raw [B,T,3HD] input, VMEM
    relayout) matches plain-math attention in value and qkv-gradient."""
    from vaw_tpu.ops.flash_attention import (
        flash_attention_fused, flash_fused_supported)

    b, t, h, d = 4, 256, 12, 64
    assert flash_fused_supported(b, h, d, t)
    key = jax.random.PRNGKey(7)
    f = jax.random.normal(key, (b, t, 3 * h * d), jnp.float32) * 0.5

    def ref(f):
        qkv = f.reshape(b, t, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bshd->bthd", p, v).reshape(b, t, h * d)

    out = flash_attention_fused(f, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(f)),
                               atol=5e-5, rtol=5e-5)
    g = jax.random.normal(jax.random.PRNGKey(8), (b, t, h * d))
    gp = jax.grad(lambda f: jnp.sum(flash_attention_fused(f, h) * g))(f)
    gu = jax.grad(lambda f: jnp.sum(ref(f) * g))(f)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gu),
                               atol=5e-4, rtol=5e-4)

    # bf16 I/O (the training dtype): f32 kernel math, bf16-bounded error
    fb = f.astype(jnp.bfloat16)
    ob = flash_attention_fused(fb, h)
    assert ob.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ob, np.float32),
        np.asarray(ref(fb.astype(jnp.float32))), atol=2e-2, rtol=2e-2)


def test_p6_fallback_routes_unsupported_shapes():
    """multi_head_attention_fused must fall back to the packed path (same
    math) for shapes the t-major kernel doesn't gate in (odd t, hd not a
    lane multiple)."""
    from vaw_tpu.ops.attention import multi_head_attention_fused
    from vaw_tpu.ops.flash_attention import flash_fused_supported

    for (b, t, h, d) in [(2, 257, 8, 16), (2, 128, 6, 16)]:
        assert not flash_fused_supported(b, h, d, t)
        f = jnp.asarray(
            np.random.RandomState(0).randn(b, t, 3 * h * d) * 0.3,
            jnp.float32)
        out = multi_head_attention_fused(f, h)
        qkv = f.reshape(b, t, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
        r = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(r.reshape(b, t, h * d)),
                                   atol=2e-5, rtol=2e-5)


def test_pallas_conv_param_tree_matches_xla(monkeypatch):
    """VAW_PALLAS_CONV must be a pure routing flag: the param tree (names
    AND shapes) of a UNet must be identical whether the 3x3 convs route to
    the Pallas kernel or to nn.Conv — otherwise checkpoints written in one
    mode fail to load in the other. Flax auto-names submodules by class
    __name__, so PallasConv3x3 aliases its class name to "Conv"
    (models/unet.py)."""
    from vaw_tpu.models.unet import create_unet_model

    def tree(flag):
        monkeypatch.setenv("VAW_PALLAS_CONV", flag)
        m = create_unet_model(image_size=32, num_channels=32,
                              num_res_blocks=1, in_channels=3,
                              class_cond=False)
        shapes = jax.eval_shape(
            m.init, jax.random.key(0), jnp.ones((1, 32, 32, 3)),
            jnp.ones((1,)))
        return {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(shapes)
        }

    assert tree("0") == tree("1")


def test_fused_upsample_conv_matches_unfused():
    """The phase-conv rewrite of nearest-2x + SAME 3x3 conv must be exact
    up to fp reassociation of the kernel-tap sums — values AND gradients
    (it replaces the conv in every decoder up path; reference:
    models/unet.py:81-110, :143-256)."""
    from vaw_tpu.ops.upsample_conv import (
        nearest2x_conv3x3, nearest2x_conv3x3_reference)

    rs = np.random.RandomState(0)
    for (h, w, cin, cout) in [(5, 7, 3, 4), (8, 8, 16, 8), (1, 1, 2, 2)]:
        x = jnp.asarray(rs.randn(2, h, w, cin), jnp.float32)
        k = jnp.asarray(rs.randn(3, 3, cin, cout) * 0.1, jnp.float32)
        a = nearest2x_conv3x3(x, k)
        b = nearest2x_conv3x3_reference(x, k)
        assert a.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    x = jnp.asarray(rs.randn(2, 6, 6, 3), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, 5) * 0.1, jnp.float32)
    for arg in (0, 1):
        ga = jax.grad(lambda *a: jnp.sum(nearest2x_conv3x3(*a) ** 2),
                      argnums=arg)(x, k)
        gb = jax.grad(
            lambda *a: jnp.sum(nearest2x_conv3x3_reference(*a) ** 2),
            argnums=arg)(x, k)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_fused_upsample_conv_module_param_tree(monkeypatch):
    """FusedUpsampleConv must keep the swapped-out nn.Conv's param tree
    (auto-index name, kernel/bias names, shapes) and agree numerically
    with the VAW_FUSED_UPSAMPLE=0 fallback."""
    from vaw_tpu.models.unet import ResBlock

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8), jnp.float32)
    emb = jnp.ones((2, 16))
    m = ResBlock(out_channels=8, up=True)
    v = m.init(jax.random.key(0), x, emb)
    assert sorted(v["params"].keys()) == [
        "Conv_0", "Conv_1", "Dense_0", "GroupNorm32_0", "GroupNorm32_1"]
    assert v["params"]["Conv_0"]["kernel"].shape == (3, 3, 8, 8)
    monkeypatch.setenv("VAW_FUSED_UPSAMPLE", "1")  # opt-in since round 5
    fused = m.apply(v, x, emb)
    monkeypatch.setenv("VAW_FUSED_UPSAMPLE", "0")
    unfused = m.apply(v, x, emb)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=1e-5, atol=1e-5)
