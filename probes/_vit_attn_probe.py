"""Masked-tail flash vs XLA at ViT shape (T=1026) on the real TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from vaw_tpu.ops.attention import multi_head_attention

B, T, H, D = 64, 1026, 6, 64
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)

for flag, name in ((False, "xla"), (True, "flash-masked")):
    def loss(q, k, v, flag=flag):
        return jnp.sum(
            multi_head_attention(q, k, v, use_pallas=flag).astype(jnp.float32)
        )

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    out = g(q, k, v)
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(q, k, v)
    float(jnp.sum(out[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:14s} fwd+bwd {dt*1e3:7.2f} ms", flush=True)
