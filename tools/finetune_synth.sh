#!/bin/bash
# Low-lr constant-schedule fine-tune of the shipped synthetic weights.
#
# Why: the onecycle synth2 run peaked at step 5000 (ATE 0.168 on the
# 48-frame protocol) and degraded afterwards (rot_error 0.9 -> 1.2 by 8k);
# the next accuracy win is a short low-lr fine-tune from that checkpoint,
# now on the photometric-consistent renderer (per-plane fixed texture
# normalization). Run on the TPU (0.69 s/step); CPU is ~120 s/step.
#
# Usage: tools/finetune_synth.sh [extra train args]
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

exec python -m droid_slam_tpu.apps.train \
    --name synth3 --synthetic \
    --ckpt "${CKPT:-weights/droid_synth.msgpack}" \
    --schedule constant --lr "${LR:-2.5e-5}" \
    --steps "${STEPS:-2000}" --batch 8 --crop 96 128 --iters 8 \
    --ckpt_every 500 --state_every 500 \
    "$@"
