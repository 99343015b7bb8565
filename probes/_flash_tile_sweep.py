"""Sweep the flash-attention score-tile budget (VAW_FLASH_TILE_BYTES) at
the flagship DiT-B/2 shape (bh = batch*heads = 1920, T = 256, d = 64).

The default 2MB budget yields block_b = 8 -> a 240-step sequential grid at
this shape; larger tiles cut grid overhead and batch the VPU exp work.
Each sweep point re-execs this script (the constant binds at import).

Usage: python probes/_flash_tile_sweep.py            # run the sweep
       VAW_FLASH_TILE_BYTES=N python probes/_flash_tile_sweep.py one
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one():
    from vaw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vaw_tpu.ops.flash_attention import flash_attention

    b, h, t, d = 160, 12, 256, 64
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, t, h, d), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def timed(fn, args, iters=30):
        def body(c, _):
            out = fn(c, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (jnp.sum(leaf.astype(jnp.float32)) * 1e-12).astype(c.dtype)
            return c.at[0, 0, 0, 0].add(bump), ()

        @jax.jit
        def run(c):
            cf, _ = jax.lax.scan(body, c, None, length=iters)
            return jnp.sum(cf.ravel()[:1])

        import time
        float(run(args[0]))
        t0 = time.perf_counter()
        float(run(args[0]))
        return (time.perf_counter() - t0) / iters * 1e3

    tf = timed(flash_attention, (q, k, v))
    tb = timed(grad, (q, k, v))
    tile = os.environ.get("VAW_FLASH_TILE_BYTES", "default(2MB)")
    print(f"tile={tile}: fwd {tf:6.3f} ms   grad {tb:6.3f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        one()
    else:
        for mb in (2, 4, 8, 16):
            env = dict(os.environ, VAW_FLASH_TILE_BYTES=str(mb << 20))
            subprocess.run([sys.executable, __file__, "one"], env=env,
                           check=False)
