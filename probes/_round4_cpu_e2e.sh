#!/usr/bin/env bash
# CPU-fallback end-to-end evidence run (VERDICT r3 next-3 fallback): if the
# axon tunnel stays down all round, this drives the REAL CLI train loop on
# the 8-device virtual CPU mesh — DiT-S on the procedural Shapes dataset —
# long enough for the loss to trend and the pixel-space FID proxy to
# improve across sample grids. Artifacts (metrics CSV, grids, proxy table)
# get committed as the round's e2e evidence. Prefer _round4_on_tpu.sh when
# the chip is reachable.
set -u
cd "$(dirname "$0")/.."
out=/tmp/r4_cpu_e2e
mkdir -p "$out"
logdir="$out/logs"

# Single CPU device: the virtual-mesh sharding evidence already lives in
# the dryrun; this run's purpose is the full CLI loop with a trending
# metric, and on the 1-core box batch 64 over an 8-shard mesh ran at
# 13-17 s/step (~5 h) — batch 32 single-device is ~2x faster per step.
# --ema_decay 0.99: sampling uses EMA params; at the default 0.9999 an
# 800-step run's EMA is 92% random init (0.9999^800) and the grids score
# worse than noise on the FID proxy (measured round 5 on-chip).
VAW_PLATFORM=cpu \
timeout 10800 python -u main.py \
  --dataset Shapes --model DiT-S --image_size 16 --patch_size 2 \
  --in_chans 3 --num_classes 10 --class_cond True --batch_size 32 \
  --total_steps 800 --warmup_steps 50 --lr 3e-4 \
  --sample_freq 200 --sample_steps 50 --diffusion_steps 1000 \
  --save_step 800 --eval False --amp False --solver ddim \
  --logdir "$logdir" --weight_type lambda --mean_type EPSILON \
  --sample_size 64 --num_samples 64 --ema_decay 0.99 \
  > "$out/train.log" 2>&1
echo "train rc=$?; tail:"; tail -3 "$out/train.log"

run=$(ls -d "$logdir"/2* 2>/dev/null | tail -1)
echo "=== FID proxy across sample grids ($run) ===" | tee "$out/fid_proxy.txt"
for png in "$run"/sample/*.png; do
  VAW_PLATFORM=cpu python - "$png" <<'PYEOF' | tee -a /tmp/r4_cpu_e2e/fid_proxy.txt
import sys
import numpy as np
from PIL import Image
sys.path.insert(0, "probes")
from _fid_proxy import pool_features
from vaw_tpu.evals.fid import compute_statistics
from vaw_tpu.data.datasets import ShapesDataset
png = sys.argv[1]
g = np.asarray(Image.open(png).convert("RGB")).astype(np.float32) / 127.5 - 1
# grid -> individual 16x16 tiles (make_grid layout: pad=2 border + gaps,
# vaw_tpu/utils/logging.py)
s, pad = 16, 2
h, w, _ = g.shape
tiles = [g[r:r + s, c:c + s] for r in range(pad, h - s + 1, s + pad)
         for c in range(pad, w - s + 1, s + pad)]
imgs = np.stack(tiles)
ref = ShapesDataset(image_size=16, seed=1, flip=False).get_batch(
    np.arange(2048))["image"]
fid = compute_statistics(pool_features(ref)).frechet_distance(
    compute_statistics(pool_features(imgs)))
print(f"{png.rsplit('/', 1)[-1]}: fid_proxy={fid:.3f} tiles={len(imgs)}")
PYEOF
done
echo "=== CPU e2e done; artifacts in $run, proxy in $out/fid_proxy.txt ==="
