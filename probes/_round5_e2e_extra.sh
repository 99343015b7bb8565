#!/usr/bin/env bash
# Round-5 CPU e2e extension (VERDICT r4 next-6): the two capability
# surfaces no e2e artifact has exercised — REPA align training and
# classifier-guided sampling — both through the real CLI. Run AFTER
# probes/_round4_cpu_e2e.sh (1-core box: serialize). Artifacts land in
# /tmp/r5_e2e_extra for committing to evidence/.
set -u
cd "$(dirname "$0")/.."
out=/tmp/r5_e2e_extra
mkdir -p "$out"

echo "=== leg A: REPA (latent DiT-S + frozen mocov3-vit-s teacher) ==="
VAW_PLATFORM=cpu python probes/_make_repa_assets.py "$out" \
  > "$out/assets.log" 2>&1 || { tail -5 "$out/assets.log"; exit 1; }

VAW_PLATFORM=cpu VAW_ENCODER_DIR="$out/enc" \
timeout 10800 python -u main.py \
  --dataset Latent_Pixel --data_dir "$out/latents.h5" \
  --model DiT-S --image_size 16 --patch_size 2 --in_chans 4 \
  --num_classes 10 --class_cond True --batch_size 16 \
  --total_steps 300 --warmup_steps 50 --lr 3e-4 \
  --sample_freq 0 --sample_steps 50 --diffusion_steps 1000 --save_step 300 \
  --eval False --amp False --solver ddim \
  --logdir "$out/repa_logs" --weight_type lambda --mean_type EPSILON \
  --learn_align True --enc-type mocov3-vit-s --align_type cosine \
  --gamma 0.5 --encoder_depth 4 --z_dims 384 \
  > "$out/repa_train.log" 2>&1
echo "repa train rc=$?; tail:"; tail -3 "$out/repa_train.log"
run=$(ls -d "$out"/repa_logs/2* 2>/dev/null | tail -1)
echo "--- align/mse trend (progress.csv head+tail) ---"
head -2 "$run/progress.csv"; tail -3 "$run/progress.csv"

echo "=== leg B: classifier-guided sampling (UNet + EncoderUNet) ==="
VAW_PLATFORM=cpu timeout 10800 python -u \
  probes/_round5_classifier_e2e.py "$out/clf" \
  > "$out/clf_e2e.log" 2>&1
echo "clf leg rc=$?; tail:"; tail -6 "$out/clf_e2e.log"
echo "=== r5 extra e2e done; artifacts in $out ==="
