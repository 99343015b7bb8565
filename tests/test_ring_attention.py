"""Ring (sequence-parallel) attention vs full attention on the virtual CPU
mesh. The reference has no sequence parallelism (SURVEY.md section 5); the
TPU extension must be numerically identical to full attention."""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vaw_tpu.parallel.ring_attention import ring_attention


def _full_attention(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32))


def _make(b=2, t=64, h=4, d=16, devs=4, seed=0):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:devs]), ("sp",))
    return q, k, v, mesh


def test_ring_attention_matches_full():
    q, k, v, mesh = _make()
    scale = 1.0 / math.sqrt(q.shape[-1])
    out = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh)
    )(q, k, v)
    ref = _full_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_sharded_inputs_stay_sharded():
    q, k, v, mesh = _make()
    spec = NamedSharding(mesh, P(None, "sp", None, None))
    q, k, v = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    assert out.sharding.spec == P(None, "sp", None, None)


def test_ring_attention_gradients_match_full():
    q, k, v, mesh = _make(t=32, devs=4)
    scale = 1.0 / math.sqrt(q.shape[-1])

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(_full_attention(q, k, v, scale) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ring_attention_two_devices_bf16():
    q, k, v, _ = _make(t=32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(qb, kb, vb)
    ref = _full_attention(q, k, v, 1.0 / math.sqrt(q.shape[-1]))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )
