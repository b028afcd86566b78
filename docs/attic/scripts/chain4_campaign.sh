#!/bin/bash
# Fourth round-2 chain: re-measure perf_m + extras (their first runs were
# contended by a stale concurrent campaign process).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID (chain 3) $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID exited $(date +%T) ==="
fi

for sec in perf_m extras; do
  echo "=== section $sec start $(date +%T) ==="
  timeout 14000 python -u scripts/run_round2_data.py "$sec"
  echo "=== section $sec done exit=$? $(date +%T) ==="
done
echo "=== chain4 complete $(date +%T) ==="
