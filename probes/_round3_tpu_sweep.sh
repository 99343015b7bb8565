#!/usr/bin/env bash
# One-shot round-3 TPU measurement sweep (run when the axon tunnel is up).
# Measures everything the fused upsample phase-conv + attention-routing
# changes touch, A/B'd against their kill switches. Results land in
# /tmp/r3_sweep/*.log; summarize into PERF.md afterwards.
set -u
cd "$(dirname "$0")/.."
out=/tmp/r3_sweep
mkdir -p "$out"

run() { # name, env, cmd...
  name=$1; envs=$2; shift 2
  echo "=== $name [$envs] ==="
  env $envs timeout 580 python -u "$@" >"$out/$name.log" 2>&1
  echo "rc=$? tail:"; grep -v -i warning "$out/$name.log" | tail -6
}

# 1. flagship sanity (unchanged path — regression check)
run bench           "" bench.py

# 2. VAE decode: fused phase-conv vs unfused
run vae_fused       "" probes/_vae_decode_probe.py 128
run vae_unfused     "VAW_FUSED_UPSAMPLE=0" probes/_vae_decode_probe.py 128

# 3. ADM-64 train step: fused upsample decoder convs vs not
run adm64_fused     "" probes/_unet_step_bench.py 64
run adm64_unfused   "VAW_FUSED_UPSAMPLE=0" probes/_unet_step_bench.py 64

# 4. ADM-64: packed-QKV fallback A/B at the sub-256-token levels
#    (review finding: 5D lane slices vs split path below _FLASH_MIN_SEQ)
run adm64_nopacked  "VAW_PACKED_QKV=0 VAW_FUSED_TMAJOR=0" probes/_unet_step_bench.py 64

# 5. full sampling pipeline at the reference protocol (CFG 1.5 + decode)
run pipeline_fused  "" probes/_sampling_pipeline_bench.py
run pipeline_unfused "VAW_FUSED_UPSAMPLE=0" probes/_sampling_pipeline_bench.py

echo "=== sweep done; logs in $out ==="
