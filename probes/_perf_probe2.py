import time, jax, jax.numpy as jnp, numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vaw_tpu.models.dit import DiT_B

def timed(f, *args, n=15):
    r = f(*args); float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter()-t0)/n

model = DiT_B(image_size=32, patch_size=2, in_channels=4, class_dropout_prob=0.1, num_classes=1000, learn_sigma=False, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
for batch in (128, 256, 512):
    x = jnp.asarray(rs.randn(batch,32,32,4), jnp.float32)
    t = jnp.asarray(rs.rand(batch)*1000, jnp.float32)
    y = jnp.asarray(rs.randint(0,1000,(batch,)), jnp.int32)
    variables = model.init({'params': jax.random.key(0)}, x, t, y)
    def loss_fn(p, x, t, y):
        out, _ = model.apply({'params': p}, x, t, y)
        return jnp.mean(out.astype(jnp.float32)**2)
    grad = jax.jit(jax.grad(loss_fn))
    dt = timed(grad, variables['params'], x, t, y)
    print(f"batch {batch}: fwd+bwd {dt*1000:.1f} ms -> {batch/dt:.0f} img/s")
