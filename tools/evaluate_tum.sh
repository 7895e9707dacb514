#!/bin/bash
# Batch TUM-RGBD fr1 evaluation (reference tools/evaluate_tum.sh counterpart).
# Usage: tools/evaluate_tum.sh [--weights droid.pth] [extra evaluate args]
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
TUM_PATH=${TUM_PATH:-datasets/TUM-RGBD}

evalset=(
    rgbd_dataset_freiburg1_360
    rgbd_dataset_freiburg1_desk
    rgbd_dataset_freiburg1_desk2
    rgbd_dataset_freiburg1_floor
    rgbd_dataset_freiburg1_plant
    rgbd_dataset_freiburg1_room
    rgbd_dataset_freiburg1_rpy
    rgbd_dataset_freiburg1_teddy
    rgbd_dataset_freiburg1_xyz
)

for seq in "${evalset[@]}"; do
    python -m droid_slam_tpu.apps.evaluate --dataset tum \
        --datapath "$TUM_PATH/$seq" "$@"
done
