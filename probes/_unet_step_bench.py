"""ADM-64 full train-step throughput, optionally with the Pallas conv path.

Usage: [VAW_PALLAS_CONV=1] python probes/_unet_step_bench.py [batch]

The BASELINE.md target-1 workload (ADM-64 UNet, class-cond ImageNet-64
shapes). Timing closed by float() readback (axon tunnel discipline,
PERF.md)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import time
import jax
import numpy as np

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.registry import build_model
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bf16_moments = os.environ.get("VAW_BF16_MOMENTS", "0") == "1"
cfg = TrainConfig(model="ADM-64", image_size=64, in_chans=3,
                  num_classes=1000, class_cond=True, batch_size=batch,
                  weight_type="lambda", mean_type="EPSILON",
                  path_type="cosine", amp=True, lr=1e-4,
                  log_grad_norm=False, opt_bf16_moments=bf16_moments)
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
n = 10
t0 = time.perf_counter()
for _ in range(n):
    state, m = tr.step(state, db)
float(m["loss"])
dt = (time.perf_counter() - t0) / n
print(f"pallas_conv={os.environ.get('VAW_PALLAS_CONV', '0')} "
      f"bf16_moments={int(bf16_moments)} batch={batch} "
      f"{dt*1e3:.1f} ms/step  {batch/dt:.1f} imgs/s/chip", flush=True)
