import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""ViT-B and U-ViT-S train-step throughput (pixel-space backbones)."""
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.registry import build_model
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

mesh = make_mesh()
sched = make_schedule(get_named_beta_schedule("cosine", 1000))
proc = GaussianDiffusion(schedule=sched,
                         model_mean_type=ModelMeanType.EPSILON,
                         weight_type="lambda")
rs = np.random.RandomState(0)


def run(name, image_size, patch, batch, classes=1000):
    cfg = TrainConfig(model=name, image_size=image_size, in_chans=3,
                      patch_size=patch, num_classes=classes, class_cond=True,
                      batch_size=batch, weight_type="lambda",
                      mean_type="EPSILON", path_type="cosine",
                      drop_label_prob=0.1, amp=True)
    model = build_model(cfg)
    tr = Trainer(cfg, model, proc, mesh)
    hb = {"image": rs.randn(batch, image_size, image_size, 3).astype(
            np.float32),
          "label": rs.randint(0, classes, (batch,)).astype(np.int32)}
    try:
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
        print(f"{name} {image_size}px/p{patch} batch {batch}: "
              f"{dt*1e3:.1f} ms/step -> {batch/dt:.0f} imgs/s", flush=True)
    except Exception as e:
        open(f"/tmp/{name}_err.txt", "w").write(str(e))
        print(f"{name}: FAILED (/tmp/{name}_err.txt)", flush=True)
    del tr


run("ViT-B", 64, 4, 128)
run("U-ViT-S", 32, 2, 128, classes=10)
