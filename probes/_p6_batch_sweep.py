"""Flagship batch re-sweep at the p6 (t-major fused flash) operating point.

p6 removed ~12.5 ms/step of data formatting; the per-image optimum may
have moved from 160 (the p5 sweep result, PERF.md round 3)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from vaw_tpu.core import (GaussianDiffusion, ModelMeanType,
                          get_named_beta_schedule, make_schedule)
from vaw_tpu.models.dit import DiT_B
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

for batch in [144, 160, 224, 144, 160, 224]:
    cfg = TrainConfig(
        model="DiT-B", image_size=32, in_chans=4, patch_size=2,
        num_classes=1000, class_cond=True, batch_size=batch,
        weight_type="lambda", mean_type="EPSILON", path_type="cosine",
        drop_label_prob=0.1, amp=True, lr=1e-4, betas=(0.9, 0.95),
        log_grad_norm=False, opt_bf16_moments=True)
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
          "label": rs.randint(0, 1000, size=(batch,)).astype(np.int32)}
    state = tr.init_state(jax.random.key(0), hb)
    db = shard_batch(mesh, hb)
    for _ in range(3):
        state, metrics = tr.step(state, db)
    float(metrics["loss"])  # readback sync (axon tunnel)
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = tr.step(state, db)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"batch {batch}: {dt*1e3:.1f} ms/step, "
          f"{batch/dt:.1f} imgs/s (loss {loss:.4f})", flush=True)
