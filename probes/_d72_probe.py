import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Flash kernel at DiT-XL head_dim=72 on the real TPU (eligibility check)."""
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from vaw_tpu.ops.attention import multi_head_attention

B, T, H, D = 16, 256, 16, 72
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, T, H, D), jnp.bfloat16)
ref = multi_head_attention(q, k, v, use_pallas=False)
got = multi_head_attention(q, k, v, use_pallas=True)
err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
print("fwd max err:", err, flush=True)
g = jax.jit(jax.grad(lambda q,k,v: jnp.sum(multi_head_attention(q,k,v,use_pallas=True).astype(jnp.float32)), argnums=(0,1,2)))
out = g(q,k,v)
print("bwd ok:", float(jnp.sum(out[0].astype(jnp.float32))), flush=True)
