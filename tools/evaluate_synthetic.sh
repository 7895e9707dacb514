#!/bin/bash
# In-environment accuracy protocol: SLAM over rendered exact-GT sequences.
# Usage: tools/evaluate_synthetic.sh [--weights weights/droid_synth.msgpack]
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
for seed in 7 11 23 42; do
    python -m droid_slam_tpu.apps.evaluate --dataset synthetic \
        --datapath "seed:$seed" "$@"
done
