import jax, jax.numpy as jnp
from vaw_tpu.ops.flash_attention import flash_attention_fused
b, t, h, d = 160, 256, 12, 64
f = jax.random.normal(jax.random.PRNGKey(0), (b, t, 3*h*d), jnp.bfloat16)
out = jax.jit(lambda f: flash_attention_fused(f, h))(f)
out.block_until_ready()
print("fwd ok", out.shape, out.dtype)
g = jax.jit(jax.grad(lambda f: jnp.sum(flash_attention_fused(f, h).astype(jnp.float32)**2)))(f)
g.block_until_ready()
print("bwd ok", g.shape)
