#!/bin/bash
# Round-4 chain 10: new-feature timing rows (AD backward, rank-revealing
# QR, batched vmap QR) — queued BEHIND chain9 (the verdict-ask campaign
# has strict priority for tunnel time).  Waits for chain9 to exit, then
# for a healthy probe, runs scripts/time_new_features.py, commits the
# extras.csv rows.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

C9PID=$(cat /tmp/chain9_r4.pid 2>/dev/null || echo 0)
while [ "$C9PID" != 0 ] && [ -d "/proc/$C9PID" ]; do
  sleep 600
done
echo "=== chain9 gone; waiting for healthy probe $(date +%T) ==="

probe() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe-ok', float(jnp.sum(x @ x)))
" 2>/dev/null | grep -q probe-ok
}

until probe; do
  echo "probe failed $(date +%T); retrying in 600 s"
  sleep 600
done

echo "=== [1/2] TPU compiled lane start $(date +%T) ==="
TSQR_TEST_PLATFORM=axon timeout 3600 \
  python -m pytest tests/test_tpu_compiled.py -q -x
echo "=== TPU lane done exit=$? $(date +%T) ==="

echo "=== [2/2] new-feature rows start $(date +%T) ==="
timeout 3600 python -u scripts/time_new_features.py
rc=$?
echo "=== new-feature rows done exit=$rc $(date +%T) ==="
git add data/extras.csv 2>/dev/null
if ! git diff --cached --quiet; then
  git commit -q -m "Campaign data: AD backward / qrcp / vmap timing rows

Measured on the real chip by scripts/chain10_r4.sh after the chain9
campaign completed.

No-Verification-Needed: data-only campaign artifacts (CSV rows)"
  echo "committed extras rows"
fi
echo "=== chain10_r4 complete $(date +%T) ==="
