"""Full DiTBlock fwd+bwd probe: qkv split/layout variants on the real TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import flax.linen as nn
import jax
import jax.numpy as jnp

B, T, D, H = 128, 256, 768, 12
HD = D // H
scale = 1.0 / np.sqrt(HD)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, T, D), jnp.bfloat16)
c = jnp.asarray(rs.randn(B, D), jnp.bfloat16)


def xla_attn(q, k, v):  # [B,T,H,D] bqhd layout
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def hm_attn(q, k, v):  # [B,H,T,D] head-major layout
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


class Block(nn.Module):
    variant: str = "current"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * D, dtype=self.dtype)(nn.silu(c))
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp) = jnp.split(
            mod, 6, axis=-1)
        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=jnp.float32)
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=jnp.float32)
        h = (norm1(x).astype(self.dtype) * (1 + sc_msa[:, None])
             + sh_msa[:, None])
        n, t, d = h.shape
        v_ = self.variant
        if v_ == "current":
            qkv = nn.Dense(3 * d, dtype=self.dtype)(h)
            qkv = qkv.reshape(n, t, 3, H, HD)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = xla_attn(q, k, v).reshape(n, t, d)
        elif v_ == "split":
            qkv = nn.Dense(3 * d, dtype=self.dtype)(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t, H, HD)
            k = k.reshape(n, t, H, HD)
            v = v.reshape(n, t, H, HD)
            a = xla_attn(q, k, v).reshape(n, t, d)
        elif v_ == "headmajor":
            qkv = nn.Dense(3 * d, dtype=self.dtype)(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t, H, HD).transpose(0, 2, 1, 3)
            k = k.reshape(n, t, H, HD).transpose(0, 2, 1, 3)
            v = v.reshape(n, t, H, HD).transpose(0, 2, 1, 3)
            a = hm_attn(q, k, v).transpose(0, 2, 1, 3).reshape(n, t, d)
        elif v_ == "flash":
            from vaw_tpu.ops.flash_attention import flash_attention

            qkv = nn.Dense(3 * d, dtype=self.dtype)(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t, H, HD)
            k = k.reshape(n, t, H, HD)
            v = v.reshape(n, t, H, HD)
            a = flash_attention(q, k, v, scale=scale).reshape(n, t, d)
        a = nn.Dense(d, dtype=self.dtype)(a)
        x = x + g_msa[:, None] * a
        m = (norm2(x).astype(self.dtype) * (1 + sc_mlp[:, None])
             + sh_mlp[:, None])
        m = nn.Dense(4 * d, dtype=self.dtype)(m)
        m = nn.gelu(m, approximate=True)
        m = nn.Dense(d, dtype=self.dtype)(m)
        return x + g_mlp[:, None] * m


def bench(variant, n=20):
    model = Block(variant=variant)
    params = model.init(jax.random.key(0), x, c)

    def loss(p, x, c):
        return jnp.sum(model.apply(p, x, c).astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    out = g(params, x, c)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(params, x, c)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(f"{variant:10s} block fwd+bwd {dt*1e3:7.2f} ms  (x12 = "
          f"{dt*12*1e3:6.1f} ms)", flush=True)


for v in ("current", "split", "headmajor", "flash"):
    bench(v)
