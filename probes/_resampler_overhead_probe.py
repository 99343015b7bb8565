"""Step-time overhead of --time_sampler loss-second-moment at batch 256
(VERDICT r2 next-7): the vectorized ring-buffer update (core/weighting.py)
folded into the donated train step vs the uniform sampler.

Usage: python probes/_resampler_overhead_probe.py [batch]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import time
import jax
import jax.numpy as jnp
import numpy as np

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT_B
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256

for sampler_name in ("uniform", "loss-second-moment"):
    cfg = TrainConfig(
        model="DiT-B", image_size=32, in_chans=4, patch_size=2,
        num_classes=1000, class_cond=True, batch_size=batch,
        weight_type="lambda", mean_type="EPSILON", path_type="cosine",
        drop_label_prob=0.1, amp=True, lr=1e-4, log_grad_norm=False,
        time_sampler=sampler_name,
    )
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
    hb = {"image": rs.randn(batch, 32, 32, 4).astype(np.float32),
          "label": rs.randint(0, 1000, (batch,)).astype(np.int32)}
    state = tr.init_state(jax.random.key(0), hb)
    db = shard_batch(mesh, hb)
    for _ in range(3):
        state, m = tr.step(state, db)
    float(m["loss"])
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = tr.step(state, db)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{sampler_name:20s} batch={batch} {dt*1e3:7.1f} ms/step "
          f"{batch/dt:7.1f} imgs/s", flush=True)
