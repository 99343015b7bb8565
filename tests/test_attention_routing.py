"""Attention routing + guidance fast-path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vaw_tpu.ops.attention import _flash_eligible, multi_head_attention
from vaw_tpu.samplers.guidance import IntervalCFG


def _qkv(b=2, t=256, h=2, d=64, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    return mk(), mk(), mk()


def test_flash_eligibility_gate():
    q, k, v = _qkv(t=256)
    assert _flash_eligible(q, k)
    # ViT's 1026 tokens (cls+time): padded + masked inside the kernel
    q2 = jnp.zeros((2, 1026, 2, 64))
    assert _flash_eligible(q2, q2)
    # DiT-XL's head_dim 72 is sublane-aligned (72 % 8 == 0)
    q3 = jnp.zeros((2, 256, 2, 72))
    assert _flash_eligible(q3, q3)
    # non-sublane-aligned head dims and very long K fall back to XLA
    q4 = jnp.zeros((2, 256, 2, 60))
    assert not _flash_eligible(q4, q4)
    q5 = jnp.zeros((2, 8192, 2, 64))
    assert not _flash_eligible(q5, q5)


def test_flash_masked_tail_matches_xla():
    """Non-divisible K sequence (1026-style): the padded+masked kernel must
    match full attention."""
    rs = np.random.RandomState(3)
    t = 300  # pads to 512 with block_k 256... (min(256,300)=256 -> 512)
    q = jnp.asarray(rs.randn(2, t, 2, 64), jnp.float32)
    k = jnp.asarray(rs.randn(2, t, 2, 64), jnp.float32)
    v = jnp.asarray(rs.randn(2, t, 2, 64), jnp.float32)
    a = multi_head_attention(q, k, v, use_pallas=False)
    b = multi_head_attention(q, k, v, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_flash_masked_tail_gradients_match_xla():
    rs = np.random.RandomState(4)
    t = 130
    q = jnp.asarray(rs.randn(2, t, 2, 64), jnp.float32)
    k = jnp.asarray(rs.randn(2, t, 2, 64), jnp.float32)
    v = jnp.asarray(rs.randn(2, t, 2, 64), jnp.float32)

    def loss(fn_flag):
        def f(q, k, v):
            return jnp.sum(
                multi_head_attention(q, k, v, use_pallas=fn_flag) ** 2
            )
        return f

    ga = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_router_explicit_pallas_matches_xla():
    q, k, v = _qkv()
    a = multi_head_attention(q, k, v, use_pallas=False)
    b = multi_head_attention(q, k, v, use_pallas=True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_interval_cfg_scale_one_skips_doubling():
    calls = []

    def model_fn(x, t, y=None):
        calls.append(x.shape[0])
        return x * 2.0

    cfg = IntervalCFG(model_fn, num_classes=10, guidance_scale=1.0,
                      class_cond=True)
    x = jnp.ones((4, 8, 8, 3))
    t = jnp.ones((4,))
    y = jnp.zeros((4,), jnp.int32)
    out = cfg(x, t, y=y)
    assert calls == [4], "scale-1 guidance must not double the batch"
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def test_interval_cfg_scale_one_matches_doubled_path():
    """The fast path must be numerically identical to the doubled path with
    g == 1 (uncond + 1*(cond-uncond) == cond) for a label-dependent model."""
    table = np.random.RandomState(0).randn(11, 1).astype(np.float32)

    def model_fn(x, t, y=None):
        bias = jnp.asarray(table)[y][:, :, None, None]
        return x + bias

    x = jnp.ones((4, 8, 8, 1))
    t = jnp.ones((4,))
    y = jnp.asarray([1, 2, 3, 4], jnp.int32)
    fast = IntervalCFG(model_fn, 10, 1.0, class_cond=True)(x, t, y=y)
    slow = IntervalCFG(model_fn, 10, 3.0, class_cond=True)(x, t, y=y, g=1.0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-6, atol=1e-6)


def test_packed_kill_switch_honored_on_fused_fallback(monkeypatch):
    """VAW_PACKED_QKV=0 must disable the packed layout on EVERY route —
    including the (default-on) fused t-major entry's fallback for shapes
    the Pallas kernel rejects. Regression test for the routing hole where
    disabling packed while fused stayed on silently re-entered the packed
    path."""
    from vaw_tpu.ops import attention as att

    called = []
    orig = att.multi_head_attention_packed

    def spy(*a, **kw):
        called.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(att, "multi_head_attention_packed", spy)
    qkv = jnp.asarray(
        np.random.RandomState(0).randn(2, 12, 3 * 4 * 8), jnp.float32)

    monkeypatch.setenv("VAW_PACKED_QKV", "1")
    out_packed = att.multi_head_attention_fused(qkv, num_heads=4)
    assert called, "packed enabled: fallback must route through packed"

    called.clear()
    monkeypatch.setenv("VAW_PACKED_QKV", "0")
    out_split = att.multi_head_attention_fused(qkv, num_heads=4)
    assert not called, "VAW_PACKED_QKV=0: fused fallback must NOT use packed"
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_split),
                               rtol=1e-6, atol=1e-6)
