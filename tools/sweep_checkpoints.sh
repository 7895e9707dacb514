#!/bin/bash
# Rank trained checkpoints on the in-environment synthetic accuracy protocol
# (apps/evaluate.py --dataset synthetic; the stand-in for the reference's
# evaluation_scripts — no public dataset ships in this environment).
#
# Usage:
#   tools/sweep_checkpoints.sh [ckpt ...]        # default: checkpoints/*.msgpack
#   PLATFORM=cpu tools/sweep_checkpoints.sh      # force CPU (tunnel down)
#   SEEDS="7 11" FRAMES=48 tools/sweep_checkpoints.sh
set -u
cd "$(dirname "$0")/.."

SEEDS=${SEEDS:-"7 11"}
FRAMES=${FRAMES:-48}
SIZE=${SIZE:-"192 256"}
PLATFORM=${PLATFORM:-}

ENVPRE=(env JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache)
DTYPE=()
if [ "$PLATFORM" = "cpu" ]; then
  ENVPRE=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
          JAX_PLATFORMS=cpu JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_cpu)
  DTYPE=(--compute_dtype float32)  # bf16 is emulated (slow) on CPU
fi

CKPTS=("$@")
if [ ${#CKPTS[@]} -eq 0 ]; then
  CKPTS=(checkpoints/*.msgpack)
fi

for ck in "${CKPTS[@]}"; do
  for seed in $SEEDS; do
    out=$("${ENVPRE[@]}" timeout 3000 python -m droid_slam_tpu.apps.evaluate \
      --dataset synthetic --datapath "seed:$seed" --frames "$FRAMES" \
      --image_size $SIZE --weights "$ck" "${DTYPE[@]}" 2>/dev/null | tail -2)
    kf=$(echo "$out" | grep -o "keyframes: [0-9]*" | grep -o "[0-9]*")
    ate=$(echo "$out" | grep -o "'ate_rmse': [0-9.]*" | grep -o "[0-9.]*$")
    echo "$ck seed=$seed kf=${kf:-?} ate=${ate:-FAIL}"
  done
done
