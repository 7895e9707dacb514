#!/bin/bash
# TartanAir validation-split scoring (reference tools/validate_tartanair.sh).
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
TARTANAIR_PATH=${TARTANAIR_PATH:-datasets/mono}

for seq in "$TARTANAIR_PATH"/*/; do
    python -m droid_slam_tpu.apps.evaluate --dataset tartanair \
        --datapath "$seq" "$@"
done
