#!/bin/bash
# Batch EuRoC MAV evaluation (reference tools/evaluate_euroc.sh counterpart).
# Ground truth: pass --gt <file> per sequence or rely on in-repo defaults.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
EUROC_PATH=${EUROC_PATH:-datasets/EuRoC}

evalset=(
    MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult
    V1_01_easy V1_02_medium V1_03_difficult
    V2_01_easy V2_02_medium V2_03_difficult
)

for seq in "${evalset[@]}"; do
    python -m droid_slam_tpu.apps.evaluate --dataset euroc \
        --datapath "$EUROC_PATH/$seq" "$@"
done
