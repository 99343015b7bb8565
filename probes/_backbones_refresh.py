"""Round-3 defaults (packed qkv + 8MB flash tile + bf16 moments) across
the non-flagship backbones, comparable to the round-2 PERF.md tables."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, numpy as np, jax.numpy as jnp
from vaw_tpu.core import (GaussianDiffusion, ModelMeanType,
                          get_named_beta_schedule, make_schedule)
from vaw_tpu.models.registry import build_model
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

RUNS = [
    ("ViT-B", dict(model="ViT-B", image_size=32, in_chans=4, patch_size=2,
                   num_classes=1000), 128),
    ("U-ViT-S", dict(model="U-ViT-S", image_size=32, in_chans=3,
                     patch_size=2, num_classes=10), 128),
    ("MM-DiT-S", dict(model="MM-DiT-S", image_size=32, in_chans=4,
                      patch_size=2, num_classes=1000), 192),
]
for name, kw, batch in RUNS:
    cfg = TrainConfig(class_cond=True, batch_size=batch,
        weight_type="lambda", mean_type="EPSILON", path_type="cosine",
        drop_label_prob=0.1, amp=True, lr=1e-4, log_grad_norm=False,
        opt_bf16_moments=True, **kw)
    model = build_model(cfg)
    sched = make_schedule(get_named_beta_schedule("cosine", 1000))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type="lambda")
    mesh = make_mesh()
    tr = Trainer(cfg, model, proc, mesh)
    rs = np.random.RandomState(0)
    hb = {"image": rs.randn(batch, cfg.image_size, cfg.image_size,
                            cfg.in_chans).astype(np.float32),
          "label": rs.randint(0, cfg.num_classes, (batch,)).astype(np.int32)}
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
    print(f"{name:10s} batch={batch} {dt*1e3:7.1f} ms/step "
          f"{batch/dt:7.1f} imgs/s", flush=True)
