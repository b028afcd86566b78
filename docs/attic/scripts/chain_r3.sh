#!/bin/bash
# Round-3 measured-data chain: each section a fresh process (one OOM
# cannot eat the campaign), strictly sequential (single chip).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

for sec in robust ladder bigm3; do
  echo "=== section $sec start $(date +%T) ==="
  timeout 7200 python -u scripts/run_round3_data.py "$sec"
  echo "=== section $sec done exit=$? $(date +%T) ==="
done

echo "=== bw_experiments start $(date +%T) ==="
timeout 7200 python -u scripts/bw_experiments.py
echo "=== bw_experiments done exit=$? $(date +%T) ==="

echo "=== mfu start $(date +%T) ==="
timeout 10000 python -u scripts/run_round3_data.py mfu
echo "=== mfu done exit=$? $(date +%T) ==="

echo "=== ooc26 start $(date +%T) ==="
timeout 14000 python -u scripts/run_ooc_big.py --m 26
echo "=== ooc26 done exit=$? $(date +%T) ==="

echo "=== cond16 start $(date +%T) ==="
timeout 14000 python -u scripts/run_round3_data.py cond16
echo "=== cond16 done exit=$? $(date +%T) ==="

echo "=== chain_r3 complete $(date +%T) ==="
