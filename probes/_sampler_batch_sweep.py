"""EDM sampler batch sweep: larger sampling batches -> better fwd MFU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from vaw_tpu.models.dit import DiT_B
from vaw_tpu.samplers.driver import Sampler
from vaw_tpu.utils.config import TrainConfig

cfg = TrainConfig(
    model="DiT-B", image_size=32, in_chans=4, patch_size=2,
    num_classes=1000, class_cond=True, solver="heun",
    discretization="edm", sample_steps=18, guidance_scale=1.0,
)
model = DiT_B(image_size=32, patch_size=2, in_channels=4,
              class_dropout_prob=0.1, num_classes=1000, learn_sigma=False,
              dtype=jnp.bfloat16)
rng = jax.random.key(0)
x = jnp.zeros((2, 32, 32, 4), jnp.float32)
variables = model.init({"params": rng}, x, jnp.zeros((2,)),
                       jnp.zeros((2,), jnp.int32))

def model_fn(params, x, t, y=None):
    out, _ = model.apply(params, x, t, y)
    return out

sampler = Sampler(cfg, model_fn, params=variables)
for batch in (128, 256, 512):
    arr, labels = sampler.sample(jax.random.key(1), batch, batch, 32, 1000)
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        arr, labels = sampler.sample(jax.random.key(2 + i), batch, batch,
                                     32, 1000)
    dt = (time.perf_counter() - t0) / n
    print(f"batch {batch}: {dt*1e3:.1f} ms/batch -> {batch/dt:.1f} imgs/s",
          flush=True)
