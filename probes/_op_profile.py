"""Aggregated per-op-type device time of the flagship step (round-3
defaults). Strips layer indices so the 12 DiTBlocks collapse into one row.
Usage: python probes/_op_profile.py [batch]"""
import sys, os, re, glob, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vaw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, numpy as np, jax.numpy as jnp
from collections import Counter
from vaw_tpu.core import (GaussianDiffusion, ModelMeanType,
                          get_named_beta_schedule, make_schedule)
from vaw_tpu.models.dit import DiT_B
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig
from vaw_tpu.utils.profiling import summarize_xplane

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 160
cfg = TrainConfig(model="DiT-B", image_size=32, in_chans=4, patch_size=2,
    num_classes=1000, class_cond=True, batch_size=batch,
    weight_type="lambda", mean_type="EPSILON", path_type="cosine",
    drop_label_prob=0.1, amp=True, lr=1e-4, betas=(0.9, 0.95),
    log_grad_norm=False, opt_bf16_moments=True)
model = DiT_B(image_size=32, patch_size=2, in_channels=4,
    class_dropout_prob=0.1, num_classes=1000, learn_sigma=False,
    dtype=jnp.bfloat16)
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
outdir = tempfile.mkdtemp()
with jax.profiler.trace(outdir):
    for _ in range(3):
        state, m = tr.step(state, db)
    float(m["loss"])
xp = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
s = summarize_xplane(xp[0], top=4000)
agg = Counter()
for name, ms in s["ops"]:
    n = re.sub(r"_\d+", "", name).replace("jit(_train_step)/", "")
    agg[n] += ms / 3
print("busy", round(s["busy_ms"] / 3, 1), "attr",
      round(sum(agg.values()), 1), flush=True)
for name, ms in agg.most_common(30):
    print(f"{ms:7.2f}  {name[:120]}", flush=True)
