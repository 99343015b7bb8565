"""Compare attention implementations fwd+bwd on the real TPU at DiT-B shape."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

B, T, H, D = 128, 256, 12, 64
scale = 1.0 / np.sqrt(D)
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)


def xla_attn(q, k, v):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def headmajor_attn(q, k, v):
    qf = q.transpose(0, 2, 1, 3)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * scale, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), vf,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.transpose(0, 2, 1, 3)


def flash(q, k, v):
    from vaw_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, scale=scale)


def bench(name, fn, n=20):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    f = jax.jit(fn)
    # numerics check vs xla reference
    ref = jax.jit(xla_attn)(q, k, v)
    got = f(q, k, v)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    out = g(q, k, v)
    float(jnp.sum(out[0].astype(jnp.float32)))  # close timing with readback
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(q, k, v)
    float(jnp.sum(out[0].astype(jnp.float32)))
    dt_g = (time.perf_counter() - t0) / n
    o = f(q, k, v)
    float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(q, k, v)
    float(jnp.sum(o.astype(jnp.float32)))
    dt_f = (time.perf_counter() - t0) / n
    print(f"{name:12s} fwd {dt_f*1e3:7.2f} ms   fwd+bwd(grad) {dt_g*1e3:7.2f} ms   max|err| {err:.4f}",
          flush=True)


bench("xla", xla_attn)
bench("headmajor", headmajor_attn)
bench("flash", flash)
