#!/usr/bin/env bash
# One-shot round-4 TPU agenda (run the moment the axon tunnel is up).
# 1. round-3 A/B sweep (fused upsample phase-conv, packed QKV, CFG pipeline)
# 2. bench.py — the new multi-metric driver artifact
# 3. on-hardware end-to-end CLI training: ADM-32 on the procedural Shapes
#    dataset (CIFAR stand-in; zero-egress), with periodic sampling and a
#    pixel-space FID proxy across checkpoints (VERDICT r3 next-3)
# Logs land in /tmp/r4_tpu; fold results into PERF.md/BASELINE.md after.
set -u
cd "$(dirname "$0")/.."
out=/tmp/r4_tpu
mkdir -p "$out"

# Bench FIRST: if the tunnel is only briefly up, the multi-metric bench
# capture (the round's official record, VERDICT r3 next-1) must not be
# starved by ~40 min of sweep legs.
echo "=== 1. multi-metric bench ==="
# bench.py's own worst case is ~30 min of backend-retry before the four
# legs even start (each with a 20-60s compile); 3000s would SIGTERM it
# mid-benchmark on a slow tunnel and leave an empty bench.json.
timeout 5400 python bench.py > "$out/bench.json" 2> "$out/bench.log"
cat "$out/bench.json"

echo "=== 2. round-3 A/B sweep ==="
bash probes/_round3_tpu_sweep.sh 2>&1 | tail -40

echo "=== 3. e2e train on chip: ADM-32 / Shapes ==="
# --ema_decay 0.99: in-train sampling uses EMA params (reference
# semantics); at the default 0.9999 a 3000-step demo's EMA is still 74%
# random init (0.9999^3000) and every grid scores worse than noise on the
# FID proxy — measured round 5. 0.99^3000 ~ 0, so grids track the model.
logdir="$out/e2e"
timeout 7200 python -u main.py \
  --dataset Shapes --model ADM-32 --image_size 32 --in_chans 3 \
  --num_classes 10 --class_cond True --batch_size 128 \
  --total_steps 3000 --warmup_steps 100 --lr 2e-4 \
  --sample_freq 500 --sample_steps 50 --diffusion_steps 1000 \
  --save_step 3000 --eval False --amp True --solver ddim \
  --logdir "$logdir" --weight_type lambda --mean_type EPSILON \
  --sample_size 64 --num_samples 64 --ema_decay 0.99 \
  > "$out/e2e_train.log" 2>&1
echo "train rc=$?; tail:"; tail -5 "$out/e2e_train.log"

run=$(ls -d "$logdir"/2* 2>/dev/null | tail -1)
echo "=== FID proxy across sample grids ($run) ==="
for png in "$run"/sample/*.png; do
  python - "$png" <<'PYEOF'
import sys, numpy as np
from PIL import Image
sys.path.insert(0, "probes")
from _fid_proxy import pool_features
from vaw_tpu.evals.fid import compute_statistics
from vaw_tpu.data.datasets import ShapesDataset
png = sys.argv[1]
g = np.asarray(Image.open(png).convert("RGB")).astype(np.float32)/127.5 - 1
# grid -> individual 32x32 tiles (make_grid layout: pad=2 border + gaps,
# vaw_tpu/utils/logging.py:111-127)
s, pad = 32, 2
h, w, _ = g.shape
tiles = [g[r:r+s, c:c+s] for r in range(pad, h - s + 1, s + pad)
         for c in range(pad, w - s + 1, s + pad)]
imgs = np.stack(tiles)
ref = ShapesDataset(image_size=32, seed=1, flip=False).get_batch(
    np.arange(2048))["image"]
fid = compute_statistics(pool_features(ref)).frechet_distance(
    compute_statistics(pool_features(imgs)))
print(f"{png}: fid_proxy={fid:.3f} tiles={len(imgs)}")
PYEOF
done
echo "=== round-4 TPU agenda done; logs in $out ==="
