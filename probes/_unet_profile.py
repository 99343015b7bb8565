"""Profile ADM-64 UNet train step on the real TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import os

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.registry import build_model
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

batch = 64
cfg = TrainConfig(model="ADM-64", image_size=64, in_chans=3,
                  num_classes=1000, class_cond=True, batch_size=batch,
                  weight_type="lambda", mean_type="EPSILON",
                  path_type="cosine", amp=True, lr=1e-4)
model = build_model(cfg)
sched = make_schedule(get_named_beta_schedule("cosine", 1000))
proc = GaussianDiffusion(schedule=sched,
                         model_mean_type=ModelMeanType.EPSILON,
                         weight_type="lambda")
mesh = make_mesh()
tr = Trainer(cfg, model, proc, mesh)
rs = np.random.RandomState(0)
hb = {"image": rs.randn(batch, 64, 64, 3).astype(np.float32),
      "label": rs.randint(0, 1000, (batch,)).astype(np.int32)}
state = tr.init_state(jax.random.key(0), hb)
db = shard_batch(mesh, hb)
for _ in range(3):
    state, m = tr.step(state, db)
float(m["loss"])
print("warm; tracing...", flush=True)
os.system("rm -rf /tmp/unettrace")
with jax.profiler.trace("/tmp/unettrace"):
    for _ in range(5):
        state, m = tr.step(state, db)
    float(m["loss"])
pbs = glob.glob("/tmp/unettrace/**/*.xplane.pb", recursive=True)
print("trace:", pbs, flush=True)

from vaw_tpu.utils.profiling import summarize_xplane

r = summarize_xplane(pbs[0], top=25)
print(f"busy {r['busy_ms']/5:.1f} ms/step")
print("categories (ms/step):")
for c, d in r["categories"].items():
    if d / 5 > 0.5:
        print(f"  {d/5:8.2f}  {c}")
print("top ops (ms/step):")
for name, d in r["ops"]:
    print(f"  {d/5:7.3f}  {name[:100]}")
