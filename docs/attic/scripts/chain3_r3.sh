#!/bin/bash
# Round-3 chain 3: queued behind chain2's cond16 section (never touch
# the chip while a campaign section runs).  Order: highest verdict value
# first, longest/riskiest (tunnel-bound host streaming) last.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# /tmp/chain2_r3.pid recorded the wrong pid (4992; the live chain is
# 4994 with the cond16 python at 18899).  Wait on both observed pids,
# but only while the pid still belongs to the chain (guards against pid
# recycling), and give up waiting after a hard deadline so the queued
# measurements are never silently skipped.
DEADLINE=$(( $(date +%s) + 6*3600 ))
for p in 4994 18899; do
  while kill -0 "$p" 2>/dev/null \
        && grep -qa -e chain2_r3 -e run_round3_data /proc/$p/cmdline 2>/dev/null \
        && [ "$(date +%s)" -lt "$DEADLINE" ]; do
    sleep 60
  done
done
echo "=== chain2 done; chain3 starting $(date +%T) ==="

echo "=== retry_bigm3 start $(date +%T) ==="
bash scripts/retry_bigm3.sh
echo "=== retry_bigm3 done exit=$? $(date +%T) ==="

echo "=== ooc26_regen start $(date +%T) ==="
timeout 3600 python -u scripts/run_ooc_big.py --m 26 --regen
echo "=== ooc26_regen done exit=$? $(date +%T) ==="

echo "=== perfm16 start $(date +%T) ==="
timeout 10000 python -u scripts/run_round3_data.py perfm16
echo "=== perfm16 done exit=$? $(date +%T) ==="

echo "=== ooc26_host start $(date +%T) ==="
timeout 10000 python -u scripts/run_ooc_big.py --m 26
echo "=== ooc26_host done exit=$? $(date +%T) ==="

echo "=== chain3_r3 complete $(date +%T) ==="
