#!/bin/bash
# 2-process distributed GLOBAL BA on a real tracked session (VERDICT r4
# item 5): the multi-HOST backend story of BASELINE north star 3. Tracks a
# synthetic sequence in each gloo process, then runs DroidBackend over the
# 4-device 2-process mesh and asserts parity + ATE vs the single-device
# backend. Runs on CPU (gloo). Usage: tools/mp_backend.sh
set -euo pipefail
cd "$(dirname "$0")/.."

unset PALLAS_AXON_POOL_IPS PALLAS_AXON_REMOTE_COMPILE || true
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_cpu}
# plain-script invocation puts tools/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

PORT=${PORT:-$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("localhost", 0)); print(s.getsockname()[1]); s.close()
EOF
)}

python tools/mp_backend.py 1 2 "$PORT" > /tmp/mp_backend_p1.log 2>&1 &
P1=$!
python tools/mp_backend.py 0 2 "$PORT" 2>&1 | tee /tmp/mp_backend_p0.log
wait "$P1"
grep -q MP_BACKEND_RUN_OK /tmp/mp_backend_p1.log
echo "MP_BACKEND_DONE"
