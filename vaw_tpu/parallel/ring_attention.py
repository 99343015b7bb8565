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

__all__ = ["ring_attention", "ring_attention_local"]


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


def ring_attention_local(q_loc, k_loc, v_loc, axis: str,
                         scale: Optional[float] = None):
    """Ring attention body for use INSIDE an already-active shard_map whose
    `axis` shards the token dim: local q/k/v [B, Tl, H, D] -> local out.
    This is what model integrations call (e.g. the sequence-parallel DiT,
    parallel/sp_dit.py); `ring_attention` below wraps it in its own
    shard_map for standalone use."""
    if scale is None:
        scale = 1.0 / math.sqrt(q_loc.shape[-1])
    n_dev = jax.lax.psum(1, axis)
    return _ring_body(q_loc, k_loc, v_loc, axis, scale, n_dev)


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
        return _ring_body(q_loc, k_loc, v_loc, axis, scale, n_dev)

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)


def _ring_body(q_loc, k_loc, v_loc, axis, scale, n_dev):
        # local shapes: [B, T/S, H, D] -> head-major [B, H, T/S, D]
        ql = q_loc.transpose(0, 2, 1, 3).astype(jnp.float32)
        kl = k_loc.transpose(0, 2, 1, 3)
        vl = v_loc.transpose(0, 2, 1, 3)
        # Derive the softmax statistics from ql so they inherit its varying
        # manual axes (ALL mesh axes ql varies over — 'sp' alone on a 1D
        # mesh, ('data','sp') when composed with dp); fresh constants would
        # fail the shard_map VMA carry check after the first ppermute.
        m_i = ql[..., 0] * 0.0 - 1e30
        l_i = ql[..., 0] * 0.0
        acc = ql * 0.0

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
