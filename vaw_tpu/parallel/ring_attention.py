"""Ring attention: sequence-parallel attention over an 'sp' mesh axis.

The reference never shards the sequence — its attention is always full and
single-device (SURVEY.md section 5 "Long-context": absent by design, max
~1026 image tokens). This module is the documented TPU extension path:
queries/keys/values are sharded over the sequence axis, and K/V chunks
rotate around the ring via `jax.lax.ppermute` while each device accumulates
its queries' attention with a running (online) log-sum-exp softmax — the
same numerics as flash attention, distributed over ICI. After S steps every
device has attended its local queries to the full sequence without any
device ever holding the full K/V.

Communication: S-1 ppermutes of the local K/V chunk (2 * T/S * D floats per
hop), fully overlappable with the chunk matmuls on real meshes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["ring_attention"]


def _chunk_attention(q, k, v, m_i, l_i, acc, scale):
    """One online-softmax accumulation step over a K/V chunk.
    q: [B,H,Tq,D], k/v: [B,H,Tc,D]; carries m_i/l_i: [B,H,Tq], acc like q."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m_new = jnp.maximum(m_i, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_i - m_new)
    p = jnp.exp(s - m_new[..., None])
    acc = acc * alpha[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    l_i = l_i * alpha + jnp.sum(p, axis=-1)
    return m_new, l_i, acc


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   scale: Optional[float] = None):
    """Sequence-parallel MHA. q/k/v: [B, T, H, D] with T sharded over
    `axis`; returns [B, T, H, D] sharded the same way. f32 accumulation,
    online softmax (flash numerics)."""
    b, t, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0, (t, n_dev)

    def body(q_loc, k_loc, v_loc):
        # local shapes: [B, T/S, H, D] -> head-major [B, H, T/S, D]
        ql = q_loc.transpose(0, 2, 1, 3).astype(jnp.float32)
        kl = k_loc.transpose(0, 2, 1, 3)
        vl = v_loc.transpose(0, 2, 1, 3)
        m_i = jnp.full(ql.shape[:-1], -1e30, jnp.float32)
        l_i = jnp.zeros(ql.shape[:-1], jnp.float32)
        acc = jnp.zeros_like(ql)
        # The softmax statistics become device-varying after the first chunk
        # (acc already is — it derives from the sharded q); mark the initial
        # zeros for the shard_map VMA type system.
        try:
            m_i = jax.lax.pcast(m_i, (axis,), to="varying")
            l_i = jax.lax.pcast(l_i, (axis,), to="varying")
        except (AttributeError, TypeError):
            pass  # older jax without VMA tracking

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, _):
            kl, vl, m_i, l_i, acc = carry
            m_i, l_i, acc = _chunk_attention(
                ql, kl.astype(jnp.float32), vl, m_i, l_i, acc, scale
            )
            kl = jax.lax.ppermute(kl, axis, perm)
            vl = jax.lax.ppermute(vl, axis, perm)
            return (kl, vl, m_i, l_i, acc), None

        (kl, vl, m_i, l_i, acc), _ = jax.lax.scan(
            step, (kl, vl, m_i, l_i, acc), None, length=n_dev
        )
        out = acc / l_i[..., None]
        return out.transpose(0, 2, 1, 3).astype(q_loc.dtype)

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
