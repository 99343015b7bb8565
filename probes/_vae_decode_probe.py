"""VAE decoder anatomy: where do the decode milliseconds go?

The p6 sampling refresh made decode 48-61% of the full pipeline
(PERF.md); rough FLOP math (~280 GF/img) against the measured time says
~17 TF/s — 10% of the chip's matmul ceiling. Find out why."""
import sys, os, glob, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from vaw_tpu.models.vae import AutoencoderKL
from vaw_tpu.utils.profiling import summarize_xplane

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
vae = AutoencoderKL(dtype=jnp.bfloat16)
zi = jnp.zeros((2, 32, 32, 4), jnp.float32)
vvars = jax.jit(vae.init)(jax.random.key(1), zi, jax.random.key(2))
print("init done", flush=True)
z = jnp.asarray(np.random.RandomState(0).randn(batch, 32, 32, 4), jnp.float32)

@jax.jit
def decode(z):
    return vae.apply(vvars, z, method=vae.decode)

out = decode(z); float(out.sum())
print("compile done", flush=True)
n, t0 = 5, time.perf_counter()
for _ in range(n):
    out = decode(z)
s = float(out.sum())
dt = (time.perf_counter() - t0) / n
print(f"decode batch {batch}: {dt*1e3:.0f} ms -> {batch/dt:.1f} imgs/s")



outdir = tempfile.mkdtemp(prefix="vae_trace")
with jax.profiler.trace(outdir):
    for _ in range(3):
        out = decode(z)
    float(out.sum())
xp = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
if xp:
    summ = summarize_xplane(xp[0])
    print("categories (ms per decode):")
    for name, ms in sorted(summ["categories"].items(), key=lambda kv: -kv[1]):
        print(f"  {ms/3:8.2f}  {name}")
    print("top ops (ms per decode):")
    for name, ms in summ["ops"][:20]:
        print(f"  {ms/3:8.2f}  {name}")
