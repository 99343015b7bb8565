"""Batch-192 check for the short-step backbones (fixed-cost amortization)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from vaw_tpu.core import (GaussianDiffusion, ModelMeanType,
                          get_named_beta_schedule, make_schedule)
from vaw_tpu.models.registry import build_model
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

CASES = [
    ("ViT-B", dict(image_size=64, in_chans=3, patch_size=4, num_classes=1000)),
    ("U-ViT-S", dict(image_size=32, in_chans=3, patch_size=2, num_classes=0,
                     class_cond=False)),
    ("MM-DiT-S", dict(image_size=32, in_chans=4, patch_size=2,
                      num_classes=1000)),
]
for name, over in CASES:
    batch = 192
    kw = dict(model=name, class_cond=True, batch_size=batch,
              weight_type="lambda", mean_type="EPSILON", path_type="cosine",
              drop_label_prob=0.1, amp=True, lr=1e-4, log_grad_norm=False)
    kw.update(over)
    cfg = TrainConfig(**kw)
    model = build_model(cfg)
    sched = make_schedule(get_named_beta_schedule("cosine", 1000))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type="lambda")
    mesh = make_mesh()
    tr = Trainer(cfg, model, proc, mesh)
    rs = np.random.RandomState(0)
    hb = {"image": rs.randn(batch, cfg.image_size, cfg.image_size,
                            cfg.in_chans).astype(np.float32)}
    if cfg.class_cond and cfg.num_classes:
        hb["label"] = rs.randint(0, cfg.num_classes, (batch,)).astype(np.int32)
    state = tr.init_state(jax.random.key(0), hb)
    db = shard_batch(mesh, hb)
    for _ in range(3):
        state, m = tr.step(state, db)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(15):
        state, m = tr.step(state, db)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 15
    print(f"{name} batch {batch}: {dt*1e3:.1f} ms {batch/dt:.1f} imgs/s",
          flush=True)
    del state, db, tr
