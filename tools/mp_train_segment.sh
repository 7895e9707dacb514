#!/bin/bash
# End-to-end 2-process distributed training SEGMENT with restart (VERDICT r3
# item 8): prove checkpoints/logs/resume survive a multi-process session —
# not just one step (tests/test_parallel.py pins the collectives; this
# exercises the full apps/train.py loop: shared-seed graph draws, restart
# re-puts, process-0 checkpointing, orbax state save, --resume continuation).
#
# Runs on CPU (gloo), tiny shapes. Usage: tools/mp_train_segment.sh
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS PALLAS_AXON_REMOTE_COMPILE || true
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_cpu}
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=2"

PORT=${PORT:-$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("localhost", 0)); print(s.getsockname()[1]); s.close()
EOF
)}
NAME=${NAME:-mpseg}
COMMON=(--name "$NAME" --synthetic --ckpt weights/droid_synth.msgpack
        --schedule constant --lr 1e-5 --batch 4 --crop 64 64 --iters 2
        --n_frames 5 --ckpt_every 3 --state_every 3
        --coordinator "localhost:$PORT" --num_processes 2)

run_pair() {  # run_pair <steps> [extra args...]
  local steps=$1; shift
  python -m droid_slam_tpu.apps.train "${COMMON[@]}" --steps "$steps" "$@" \
      --process_id 1 > "/tmp/${NAME}_p1.log" 2>&1 &
  local p1=$!
  python -m droid_slam_tpu.apps.train "${COMMON[@]}" --steps "$steps" "$@" \
      --process_id 0 2>&1 | tee "/tmp/${NAME}_p0.log"
  wait "$p1"
}

echo "=== segment 1: steps 1-6 (fresh, from shipped weights) ==="
run_pair 6
test -f "checkpoints/${NAME}_000006.msgpack"
test -d "checkpoints/${NAME}_state_000006"

echo "=== segment 2: resume from state_000006, steps 7-9 ==="
run_pair 9 --resume "checkpoints/${NAME}_state_000006"
test -f "checkpoints/${NAME}_000009.msgpack"

echo "=== evaluate the resumed checkpoint vs the shipped weights ==="
for wts in "checkpoints/${NAME}_000009.msgpack" weights/droid_synth.msgpack; do
  out=$(timeout 3000 python -m droid_slam_tpu.apps.evaluate \
    --dataset synthetic --datapath seed:7 --frames 24 --image_size 96 128 \
    --weights "$wts" --compute_dtype float32 2>/dev/null | tail -2)
  ate=$(echo "$out" | grep -o "'ate_rmse': [0-9.]*" | grep -o "[0-9.]*$")
  echo "$wts ate=${ate:-FAIL}"
done
echo "MP_SEGMENT_DONE"
