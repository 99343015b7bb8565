import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""DiT-L/XL train-step throughput: full remat vs 'dots' selective remat
(save MXU outputs, recompute elementwise only) vs no remat where it fits.
PERF.md round-2 recorded DiT-L 193 / DiT-XL 122 imgs/s with full remat."""
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

CASES = []
for name, ctor, batch in (("DiT-L", DiT_L, 128), ("DiT-XL", DiT_XL, 64)):
    for remat, policy in ((True, "full"), (True, "dots"), (False, "full")):
        CASES.append((name, ctor, batch, remat, policy))

for name, ctor, batch, remat, policy in CASES:
    cfg = TrainConfig(model=name, image_size=32, in_chans=4,
                      num_classes=1000, class_cond=True, batch_size=batch,
                      weight_type="lambda", mean_type="EPSILON",
                      path_type="cosine", drop_label_prob=0.1, amp=True)
    model = ctor(image_size=32, patch_size=2, in_channels=4,
                 class_dropout_prob=0.1, num_classes=1000,
                 learn_sigma=False, dtype=jnp.bfloat16,
                 use_checkpoint=remat, remat_policy=policy)
    tr = Trainer(cfg, model, proc, mesh)
    hb = {"image": rs.randn(batch, 32, 32, 4).astype(np.float32),
          "label": rs.randint(0, 1000, (batch,)).astype(np.int32)}
    tag = f"{name} batch {batch} remat={remat} policy={policy}"
    try:
        t0 = time.perf_counter()
        state = tr.init_state(jax.random.key(0), hb)
        db = shard_batch(mesh, hb)
        state, m = tr.step(state, db)
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        for _ in range(2):
            state, m = tr.step(state, db)
        float(m["loss"])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = tr.step(state, db)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt*1e3:.1f} ms/step -> {batch/dt:.0f} imgs/s "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:2000]}",
              flush=True)
    del tr, state
