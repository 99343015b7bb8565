"""Post-d-major sweep: DiT-B/2 batches 128/256, ADM-64 remat batch 128."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

mesh = make_mesh()
sched = make_schedule(get_named_beta_schedule("cosine", 1000))
proc = GaussianDiffusion(schedule=sched,
                         model_mean_type=ModelMeanType.EPSILON,
                         weight_type="lambda")
rs = np.random.RandomState(0)


def measure(tag, model, batch, image_size, chans, classes, n=15):
    cfg = TrainConfig(model=tag, image_size=image_size, in_chans=chans,
                      num_classes=classes, class_cond=True,
                      batch_size=batch, weight_type="lambda",
                      mean_type="EPSILON", path_type="cosine",
                      drop_label_prob=0.1, amp=True, lr=1e-4,
                      betas=(0.9, 0.95))
    tr = Trainer(cfg, model, proc, mesh)
    hb = {"image": rs.randn(batch, image_size, image_size, chans).astype(
            np.float32),
          "label": rs.randint(0, classes, (batch,)).astype(np.int32)}
    state = tr.init_state(jax.random.key(0), hb)
    db = shard_batch(mesh, hb)
    try:
        for _ in range(3):
            state, m = tr.step(state, db)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = tr.step(state, db)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:16s} batch {batch:4d}: {dt*1e3:7.1f} ms/step -> "
              f"{batch/dt:7.0f} imgs/s", flush=True)
    except Exception as e:
        print(f"{tag:16s} batch {batch:4d}: FAILED {type(e).__name__}",
              flush=True)
    del state, tr


from vaw_tpu.models.dit import DiT_B

for batch in (128, 256):
    model = DiT_B(image_size=32, patch_size=2, in_channels=4,
                  class_dropout_prob=0.1, num_classes=1000,
                  learn_sigma=False, dtype=jnp.bfloat16)
    measure("DiT-B/2", model, batch, 32, 4, 1000)

from vaw_tpu.models.registry import build_model

model = build_model(TrainConfig(
    model="ADM-64", image_size=64, in_chans=3, num_classes=1000,
    class_cond=True, amp=True, use_checkpoint=True,
))
measure("ADM-64-remat", model, 128, 64, 3, 1000)
