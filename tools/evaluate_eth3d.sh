#!/bin/bash
# Batch ETH3D-SLAM evaluation (reference tools/evaluate_eth3d.sh counterpart).
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
ETH3D_PATH=${ETH3D_PATH:-datasets/ETH3D-SLAM/training}

for seq in "$ETH3D_PATH"/*/; do
    python -m droid_slam_tpu.apps.evaluate --dataset eth3d \
        --datapath "$seq" "$@"
done
