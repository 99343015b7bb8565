#!/usr/bin/env bash
# On-chip e2e for the loss-aware timestep importance sampler — the one
# trainer capability with unit tests but no e2e artifact (reference defines
# it and leaves it unwired: tools/resample.py:132-162; here first-class via
# --time_sampler loss-second-moment). DiT-S/2 on Shapes-32, 2000 steps:
# the resampler warms up (all 1000 t-rows need history_per_term=10 hits,
# ~200 steps at batch 128), then training continues under the learned
# importance distribution with 1/(T p_t) loss de-biasing. Artifacts land in
# /tmp/r5_lsm for committing to evidence/r5_tpu_e2e_lsm/.
set -u
cd "$(dirname "$0")/.."
out=/tmp/r5_lsm
mkdir -p "$out"

timeout 3600 python -u main.py \
  --dataset Shapes --model DiT-S --image_size 32 --patch_size 2 \
  --in_chans 3 --num_classes 10 --class_cond True --batch_size 128 \
  --total_steps 2000 --warmup_steps 100 --lr 2e-4 \
  --sample_freq 500 --sample_steps 50 --diffusion_steps 1000 \
  --save_step 2000 --eval False --amp True --solver ddim \
  --weight_type lambda --mean_type EPSILON \
  --sample_size 64 --num_samples 64 --ema_decay 0.99 \
  --time_sampler loss-second-moment \
  --logdir "$out/logs" \
  > "$out/train.log" 2>&1
echo "train rc=$?; tail:"; tail -3 "$out/train.log"

run=$(ls -d "$out"/logs/2* 2>/dev/null | tail -1)
echo "--- progress head+tail ---"
head -2 "$run/progress.csv"; tail -2 "$run/progress.csv"

echo "--- fid proxy per grid ---"
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
print(f"{png.rsplit('/', 1)[-1]}: fid_proxy={fid:.3f} tiles={len(imgs)}")
PYEOF
done | tee "$out/fid_proxy.txt"

echo "--- resampler state from the Orbax checkpoint (new process) ---"
ckpt=$(ls -d "$run"/checkpoint/* | tail -1)
python probes/_lsm_inspect.py "$ckpt" | tee "$out/lsm_state.txt"
echo "=== lsm e2e done; artifacts in $out (run dir $run) ==="
