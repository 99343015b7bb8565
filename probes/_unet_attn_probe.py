"""Flash vs XLA attention at ADM-64 UNet shapes (fwd+bwd), v5e."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from vaw_tpu.ops.attention import multi_head_attention
from vaw_tpu.ops.flash_attention import flash_attention
from vaw_tpu.ops import attention as attn_mod

def bench(fn, q, k, v, n=30):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    o = g(q, k, v)
    float(jnp.sum(o[0][0, 0, 0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        o = g(q, k, v)
    float(jnp.sum(o[0][0, 0, 0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / n * 1e3

for (b, t, h, d) in [(64, 1024, 6, 64), (64, 256, 9, 64), (64, 64, 12, 64)]:
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, t, h, d), jnp.bfloat16)
    import math
    scale = 1.0 / math.sqrt(d)
    xla = bench(lambda q, k, v: attn_mod._xla_attention(q, k, v, scale),
                q, k, v)
    try:
        fl = bench(lambda q, k, v: flash_attention(q, k, v), q, k, v)
    except Exception as e:
        fl = float("nan"); print("flash failed:", repr(e)[:80])
    print(f"b{b} T{t} h{h} d{d}: xla-path {xla:.2f} ms  flash {fl:.2f} ms",
          flush=True)
