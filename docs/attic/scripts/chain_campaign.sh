#!/bin/bash
# Chain the remaining round-2 data sections after the in-flight wide_speed
# process (pid $1) exits.  Each section is its own process (a device OOM
# poisons a process; see CLAUDE.md) and is bounded by timeout.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID (wide_speed) $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID exited $(date +%T) ==="
fi

for sec in exponent perf_m extras wide_acc_reorth; do
  echo "=== section $sec start $(date +%T) ==="
  timeout 14000 python -u scripts/run_round2_data.py "$sec"
  echo "=== section $sec done exit=$? $(date +%T) ==="
done
echo "=== chain complete $(date +%T) ==="
