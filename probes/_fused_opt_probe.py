"""Measure the fused AdamW+EMA effect + fresh step anatomy on the real TPU.

Runs the bench config (DiT-B/2 latent, batch 128, bf16) three ways:
  A. round-1 path (optax pipeline + grad_norm metric)
  B. fused optimizer, grad_norm on
  C. fused optimizer, grad_norm off   <- new bench configuration
then traces C and prints the xplane category/op breakdown.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT_B
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

BATCH = 128


def build(fused, log_gn):
    cfg = TrainConfig(model="DiT-B", image_size=32, in_chans=4, patch_size=2,
                      num_classes=1000, class_cond=True, batch_size=BATCH,
                      weight_type="lambda", mean_type="EPSILON",
                      path_type="cosine", drop_label_prob=0.1, amp=True,
                      lr=1e-4, betas=(0.9, 0.95), fused_optimizer=fused,
                      log_grad_norm=log_gn)
    model = DiT_B(image_size=32, patch_size=2, in_channels=4,
                  class_dropout_prob=0.1, num_classes=1000,
                  learn_sigma=False, dtype=jnp.bfloat16)
    sched = make_schedule(get_named_beta_schedule("cosine", 1000))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type="lambda")
    mesh = make_mesh()
    tr = Trainer(cfg, model, proc, mesh)
    rs = np.random.RandomState(0)
    hb = {"image": rs.randn(BATCH, 32, 32, 4).astype(np.float32),
          "label": rs.randint(0, 1000, (BATCH,)).astype(np.int32)}
    state = tr.init_state(jax.random.key(0), hb)
    return tr, state, shard_batch(mesh, hb)


def measure(label, fused, log_gn, n=20):
    tr, state, db = build(fused, log_gn)
    for _ in range(3):
        state, m = tr.step(state, db)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = tr.step(state, db)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms/step  {BATCH/dt:.1f} imgs/s",
          flush=True)
    return tr, state, db


measure("A optax+gn   ", fused=False, log_gn=True)
measure("B fused+gn   ", fused=True, log_gn=True)
tr, state, db = measure("C fused-no-gn", fused=True, log_gn=False)

os.system("rm -rf /tmp/dittrace2")
with jax.profiler.trace("/tmp/dittrace2"):
    for _ in range(5):
        state, m = tr.step(state, db)
    float(m["loss"])
pbs = glob.glob("/tmp/dittrace2/**/*.xplane.pb", recursive=True)
from vaw_tpu.utils.profiling import summarize_xplane

r = summarize_xplane(pbs[0], top=30)
print(f"busy {r['busy_ms']/5:.1f} ms/step", flush=True)
print("categories (ms/step):")
for c, d in r["categories"].items():
    if d / 5 > 0.3:
        print(f"  {d/5:8.2f}  {c}")
print("top ops (ms/step):")
for name, d in r["ops"]:
    print(f"  {d/5:7.3f}  {name[:110]}")
