#!/bin/bash
# Second round-2 chain: runs after chain_campaign.sh (pid $1) exits.
# bigm2 = in-place capacity shapes; wide_speed + wide_acc re-measured
# because the trailing-GEMM math-mode fix (modes.Policy.trailing_mm)
# changes the corrected-mode BlockQR numbers.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID (chain 1) $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID exited $(date +%T) ==="
fi

for sec in bigm2 wide_speed wide_acc; do
  echo "=== section $sec start $(date +%T) ==="
  timeout 14000 python -u scripts/run_round2_data.py "$sec"
  echo "=== section $sec done exit=$? $(date +%T) ==="
done
echo "=== chain2 complete $(date +%T) ==="
