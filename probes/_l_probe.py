import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""DiT-L/2 (d=64) and DiT-XL with XLA attention: isolate the XL failure."""
import time

import numpy as np

from vaw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT_L, DiT_XL
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

mesh = make_mesh()
sched = make_schedule(get_named_beta_schedule("cosine", 1000))
proc = GaussianDiffusion(schedule=sched,
                         model_mean_type=ModelMeanType.EPSILON,
                         weight_type="lambda")
rs = np.random.RandomState(0)


def run(tag, ctor, batch, flash_env=None):
    if flash_env is not None:
        os.environ["VAW_DISABLE_FLASH"] = flash_env
    cfg = TrainConfig(model=tag, image_size=32, in_chans=4,
                      num_classes=1000, class_cond=True, batch_size=batch,
                      weight_type="lambda", mean_type="EPSILON",
                      path_type="cosine", drop_label_prob=0.1, amp=True)
    model = ctor(image_size=32, patch_size=2, in_channels=4,
                 class_dropout_prob=0.1, num_classes=1000,
                 learn_sigma=False, dtype=jnp.bfloat16)
    tr = Trainer(cfg, model, proc, mesh)
    hb = {"image": rs.randn(batch, 32, 32, 4).astype(np.float32),
          "label": rs.randint(0, 1000, (batch,)).astype(np.int32)}
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
        print(f"{tag} batch {batch} (flash_disabled={flash_env}): "
              f"{dt*1e3:.1f} ms/step -> {batch/dt:.0f} imgs/s", flush=True)
    except Exception as e:
        print(f"{tag} batch {batch} (flash_disabled={flash_env}): FAILED "
              f"{type(e).__name__}", flush=True)
    if flash_env is not None:
        os.environ.pop("VAW_DISABLE_FLASH", None)
    del tr


run("DiT-L", DiT_L, 128)
run("DiT-XL", DiT_XL, 64, flash_env="1")
