"""Full latent eval sampling pipeline at the reference protocol
(VERDICT r2 next-6): EDM 18-step Heun with guidance_scale > 1 (CFG
batch-doubling ACTIVE) + VAE decode + uint8 + host gather, DiT-B/2
latent ImageNet-256 shapes (reference protocol: main.py:112-131 — 50k
samples, 18 steps, CFG flag).

Usage: python probes/_sampling_pipeline_bench.py [batch] [guidance]
Reports imgs/s per stage and the projected 50k-sample wall time.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import time
import jax
import jax.numpy as jnp
import numpy as np

from vaw_tpu.models.dit import DiT_B
from vaw_tpu.samplers.driver import Sampler
from vaw_tpu.utils.config import TrainConfig

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
guidance = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5

cfg = TrainConfig(
    model="DiT-B", image_size=32, in_chans=4, patch_size=2,
    num_classes=1000, class_cond=True, batch_size=batch,
    model_mode="diffusion", solver="heun", discretization="edm",
    sample_steps=18, guidance_scale=guidance, sample_size=batch,
)
model = DiT_B(image_size=32, patch_size=2, in_channels=4,
              class_dropout_prob=0.1, num_classes=1000, learn_sigma=False,
              dtype=jnp.bfloat16)
rng = jax.random.key(0)
x = jnp.zeros((2, 32, 32, 4), jnp.float32)
variables = model.init({"params": rng}, x, jnp.zeros((2,), jnp.float32),
                       jnp.zeros((2,), jnp.int32))
params = variables["params"]

def model_fn(p, x, t, **kw):
    out, _ = model.apply({"params": p}, x, t, train=False, **kw)
    return out

# --- denoiser-only leg (no VAE) ---------------------------------------
sampler = Sampler(cfg, model_fn, diffusion=None, vae_decode_fn=None,
                  params=params)
t0 = None
for trial in range(2):  # first call compiles
    rng2 = jax.random.fold_in(rng, trial)
    t0 = time.perf_counter()
    samples, labels = sampler.sample(rng2, batch, batch, 32, 1000,
                                     progress_bar=False)
    np.asarray(samples[:1])
    dt_latent = time.perf_counter() - t0
print(f"[latent-only] guidance={guidance} batch={batch} "
      f"{dt_latent*1e3:.0f} ms -> {batch/dt_latent:.1f} imgs/s", flush=True)

# --- with VAE decode ---------------------------------------------------
try:
    from vaw_tpu.data.vae import load_vae_decoder

    vae_decode = load_vae_decoder(cfg.vae)
    sampler_vae = Sampler(cfg, model_fn, diffusion=None,
                          vae_decode_fn=vae_decode, params=params)
    for trial in range(2):
        rng2 = jax.random.fold_in(rng, 10 + trial)
        t0 = time.perf_counter()
        samples, labels = sampler_vae.sample(rng2, batch, batch, 32, 1000,
                                             progress_bar=False)
        np.asarray(samples[:1])
        dt_full = time.perf_counter() - t0
    print(f"[latent+vae]  guidance={guidance} batch={batch} "
          f"{dt_full*1e3:.0f} ms -> {batch/dt_full:.1f} imgs/s  "
          f"(vae share {100*(dt_full-dt_latent)/dt_full:.0f}%)", flush=True)
    proj = 50_000 / (batch / dt_full) / 60
    print(f"[50k projection] {proj:.1f} min on one chip", flush=True)
except Exception as e:  # noqa: BLE001 — VAE weights absent in zero-egress
    print(f"[latent+vae] checkpoint absent ({e}); timing decode with "
          f"RANDOM weights (cost is weight-independent)", flush=True)
    from vaw_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    zi = jnp.zeros((2, 32, 32, 4), jnp.float32)
    vvars = vae.init(jax.random.key(1), zi, jax.random.key(2))

    @jax.jit
    def vae_decode(z):
        return vae.apply(vvars, z, method=vae.decode)

    sampler_vae = Sampler(cfg, model_fn, diffusion=None,
                          vae_decode_fn=vae_decode, params=params)
    for trial in range(2):
        rng2 = jax.random.fold_in(rng, 10 + trial)
        t0 = time.perf_counter()
        samples, labels = sampler_vae.sample(rng2, batch, batch, 32, 1000,
                                             progress_bar=False)
        np.asarray(samples[:1])
        dt_full = time.perf_counter() - t0
    print(f"[latent+vae]  guidance={guidance} batch={batch} "
          f"{dt_full*1e3:.0f} ms -> {batch/dt_full:.1f} imgs/s  "
          f"(vae share {100*(dt_full-dt_latent)/dt_full:.0f}%)", flush=True)
    proj = 50_000 / (batch / dt_full) / 60
    print(f"[50k projection] {proj:.1f} min on one chip", flush=True)
