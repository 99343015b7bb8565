"""ADM-64 UNet: cost analysis + batch/remat variants, one run.

Variants: A batch64 (bench config, fused opt), B batch96 no-remat,
C batch128 + remat. Prints XLA-counted FLOPs for A -> conv MFU math.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
from vaw_tpu.core import (GaussianDiffusion, ModelMeanType,
                          get_named_beta_schedule, make_schedule)
from vaw_tpu.models.registry import build_model
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig


def run(batch, use_checkpoint, analyze=False):
    cfg = TrainConfig(model="ADM-64", image_size=64, in_chans=3,
                      num_classes=1000, class_cond=True, batch_size=batch,
                      weight_type="lambda", mean_type="EPSILON",
                      path_type="cosine", amp=True, lr=1e-4,
                      log_grad_norm=False, use_checkpoint=use_checkpoint)
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
    if analyze:
        rng = jax.random.key(7)
        try:
            c = jax.jit(tr._train_step, donate_argnums=(0,)).lower(
                state, db, rng).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            print(f"  XLA flops/step: {ca.get('flops', 0)/1e12:.2f} TF",
                  flush=True)
        except Exception as e:
            print("  cost analysis failed:", repr(e)[:120], flush=True)
    for _ in range(3):
        state, m = tr.step(state, db)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m = tr.step(state, db)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"batch={batch} remat={use_checkpoint}: {dt*1e3:.1f} ms/step "
          f"{batch/dt:.1f} imgs/s", flush=True)
    del state, db, tr
    return dt


run(64, False, analyze=False)
run(96, False)
run(128, True)
