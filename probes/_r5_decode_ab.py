"""Round-5 decode A/B: settle the VAW_FUSED_UPSAMPLE default with repeated
measurements (VERDICT r4 next-4/5).

The round-3 sweep gave contradictory one-shot signals: the decode-only
probe (5-run average + profiler device time) showed fused LOSING by ~10%
(492 vs 444 ms device time), while the single-trial pipeline leg showed
fused WINNING (in-pipeline decode 1419 vs 1716 ms wall). Wall timings over
the axon tunnel carry host-transfer noise; this probe measures both
settings in ONE process, N trials each, and reports mean/min plus profiler
device time so the default can be set on device-time evidence.

Legs per setting (fused=1/0):
  a) decode-only wall (N=6, batch 128, 32x32x4 -> 256px), device ms via trace
  b) decode + uint8 + full host readback (the sampler's real tail), N=4
"""
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vaw_tpu.models.vae import AutoencoderKL
from vaw_tpu.utils.profiling import summarize_xplane

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

vae = AutoencoderKL(dtype=jnp.bfloat16)
zi = jnp.zeros((2, 32, 32, 4), jnp.float32)
vvars = jax.jit(vae.init)(jax.random.key(1), zi, jax.random.key(2))
z = jnp.asarray(np.random.RandomState(0).randn(batch, 32, 32, 4), jnp.float32)
print("init done", flush=True)


def measure(fused: bool):
    os.environ["VAW_FUSED_UPSAMPLE"] = "1" if fused else "0"
    tag = "fused" if fused else "unfused"

    # Fresh function identities so each setting traces its own program.
    def _decode(z):
        return vae.apply(vvars, z, method=vae.decode)

    decode = jax.jit(_decode)

    def _decode_u8(z):
        img = vae.apply(vvars, z, method=vae.decode)
        img = jnp.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(jnp.uint8)
        return img

    decode_u8 = jax.jit(_decode_u8)

    out = decode(z)
    float(out.sum())  # compile + settle
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = decode(z)
        float(out.sum())
        walls.append(time.perf_counter() - t0)
    wall_ms = [w * 1e3 for w in walls]

    # Device time from the profiler (immune to tunnel noise).
    outdir = tempfile.mkdtemp(prefix=f"vae_ab_{tag}")
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = decode(z)
        float(out.sum())
    dev_ms = None
    cats = {}
    xp = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    if xp:
        summ = summarize_xplane(xp[0])
        dev_ms = summ["busy_ms"] / 3
        cats = {k: round(v / 3, 1) for k, v in summ["categories"].items()
                if v / 3 >= 1.0}

    # Full tail: decode + uint8 + complete host readback.
    arr = np.asarray(decode_u8(z))  # compile
    tails = []
    for _ in range(4):
        t0 = time.perf_counter()
        arr = np.asarray(decode_u8(z))
        tails.append(time.perf_counter() - t0)
    tail_ms = [t * 1e3 for t in tails]

    print(f"[{tag}] decode wall ms: mean={np.mean(wall_ms):.0f} "
          f"min={np.min(wall_ms):.0f} all={[round(w) for w in wall_ms]}",
          flush=True)
    print(f"[{tag}] device ms/decode: "
          f"{dev_ms:.0f}" if dev_ms is not None else f"[{tag}] no trace",
          flush=True)
    print(f"[{tag}] categories: {cats}", flush=True)
    print(f"[{tag}] decode+u8+readback ms: mean={np.mean(tail_ms):.0f} "
          f"min={np.min(tail_ms):.0f} all={[round(t) for t in tail_ms]}",
          flush=True)
    assert arr.shape == (batch, 256, 256, 3) and arr.dtype == np.uint8
    return np.min(wall_ms), dev_ms, np.min(tail_ms)


f_wall, f_dev, f_tail = measure(True)
u_wall, u_dev, u_tail = measure(False)
print(f"[verdict] fused/unfused wall={f_wall / u_wall:.3f} "
      f"dev={f_dev / u_dev if (f_dev and u_dev) else float('nan'):.3f} "
      f"tail={f_tail / u_tail:.3f}  (<1.0 means fused faster)", flush=True)
