"""XLA baseline timings for the ADM-64 hot convolutions (fwd / fwd+bwd).

The PERF.md round-2 anatomy attributes 286 ms of the 384 ms ADM-64 step to
conv fusions at ~54% MFU, dominated by the 64-px decoder ResBlock convs.
This probe isolates those shapes and times:
  (a) XLA conv_general_dilated (the nn.Conv path)          [baseline]
  (b) 9-tap "t9" matmul decomposition in pure XLA           [comparator]
  (c) the Pallas implicit-GEMM kernel (ops/conv2d.py)       [candidate]

Timing discipline: the axon tunnel returns from block_until_ready early;
every timing is closed by float() readback of a scalar depending on the
whole chain (see PERF.md "Measurement discipline").
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import functools
import time
import jax
import jax.numpy as jnp
import numpy as np

# The ADM-64 decoder hot shapes at batch 64 (NHWC, bf16 compute):
#   conv1 of the 64px decoder ResBlocks: 576->192 and 384->192
#   conv2 of every 64px block: 192->192
#   the 32px blocks for reference: 384->384
SHAPES = [
    (64, 64, 64, 576, 192),
    (64, 64, 64, 384, 192),
    (64, 64, 64, 192, 192),
    (64, 32, 32, 768, 384),
    (64, 32, 32, 384, 384),
]

def conv_xla(x, w):
    # exactly the flax nn.Conv lowering under a bf16 policy (no
    # preferred_element_type — its transpose rule rejects mixed dtypes)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

def conv_t9(x, w):
    """One big matmul [.., Cin] x [Cin, 9*Cout] on padded pixels, then 9
    shifted adds — trades conv lowering for matmul + HBM round-trip of t9."""
    n, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * c, co) if False else w.transpose(2, 0, 1, 3).reshape(c, 9 * co)
    t9 = (xp.reshape(-1, c) @ wf).reshape(n, h + 2, wd + 2, 9, co)
    out = jnp.zeros((n, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            out = out + t9[:, dy:dy + h, dx:dx + wd, dy * 3 + dx]
    return out.astype(x.dtype)

def time_fn(fn, args, iters=20):
    """Chain `iters` invocations INSIDE one jit (per-dispatch tunnel
    overhead is 1-3 ms — it would dominate the small isolated ops here);
    each iteration bumps one input element by a value derived from the
    previous output so the scan is data-dependent, then the single timed
    dispatch is closed by a float() readback."""
    x0, rest = args[0], args[1:]

    def body(x, _):
        out = fn(x, *rest)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # the bump must consume the WHOLE output — a single-element read
        # lets XLA slice the conv down to one window (measured 333 "TF")
        bump = (jnp.sum(leaf.astype(jnp.float32)) * 1e-12).astype(x.dtype)
        return x.at[(0,) * x.ndim].add(bump), ()

    @jax.jit
    def run(x):
        xf, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(xf.ravel()[:1])

    float(run(x0))  # compile + warm, closed by readback
    t0 = time.perf_counter()
    float(run(x0))
    return (time.perf_counter() - t0) / iters * 1e3

def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rs = np.random.RandomState(0)
    for (n, h, wd, ci, co) in SHAPES:
        x = jnp.asarray(rs.randn(n, h, wd, ci), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, ci, co) * 0.02, jnp.bfloat16)
        g = jnp.asarray(rs.randn(n, h, wd, co), jnp.bfloat16)
        gflop_fwd = 2 * n * h * wd * 9 * ci * co / 1e9

        def loss_of(conv):
            def f(x, w):
                return (conv(x, w).astype(jnp.float32) * g.astype(jnp.float32)).sum()
            return f

        variants = {"xla": conv_xla, "t9": conv_t9}
        if which in ("pallas", "all"):
            try:
                # conv3x3 (custom_vjp) — bwd must hit the Pallas dgrad/wgrad
                # kernels, not attempt AD through pallas_call.
                from vaw_tpu.ops.conv2d import conv3x3
                variants["pallas"] = conv3x3
                variants["pallas16"] = functools.partial(conv3x3, tile_h=16)
            except Exception as e:
                print(f"pallas unavailable: {e}")
        print(f"shape N{n} {h}x{wd} {ci}->{co}  ({gflop_fwd:.0f} GF fwd)")
        for name, conv in variants.items():
            if which not in (name, "all"):
                continue
            try:
                t_f = time_fn(conv, (x, w))
                print(f"  {name:7s} fwd {t_f:7.2f} ms "
                      f"({gflop_fwd / t_f:6.1f} TF)", flush=True)
            except Exception as e:
                print(f"  {name:7s} fwd FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            try:
                vjp = jax.grad(loss_of(conv), argnums=(0, 1))
                t_b = time_fn(vjp, (x, w))
                print(f"  {name:7s} bwd {t_b:7.2f} ms "
                      f"({2 * gflop_fwd / t_b:6.1f} TF)", flush=True)
            except Exception as e:
                print(f"  {name:7s} bwd FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

if __name__ == "__main__":
    main()
