#!/bin/bash
# Round-3 chain 5: post-campaign tail.  Waits for chain4_r3 (the
# recovery campaign) to exit — verifying the pid's cmdline identity so
# pid recycling can't fool the gate — then:
#   1. times the sb-leaf fused tree at 2^20x128 (verdict item-2 row),
#   2. regenerates the plots whose CSVs the campaign refreshed,
#   3. sanity-runs bench.py once before the driver's final run.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for chain4_r3 pid $WAIT_PID $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null \
        && grep -q chain4_r3 "/proc/$WAIT_PID/cmdline" 2>/dev/null; do
    sleep 60
  done
  echo "=== chain4_r3 exited $(date +%T) ==="
fi

echo "=== tree_sb timing start $(date +%T) ==="
timeout 2400 python -u scripts/time_tree_sb.py
echo "=== tree_sb timing done exit=$? $(date +%T) ==="

echo "=== plots start $(date +%T) ==="
timeout 600 python scripts/mk_cond_graph.py data/cond.csv data/cond.pdf
timeout 600 python scripts/mk_performance_graph.py data/perf_m.csv \
  data/performance.pdf data/bigm2.csv data/bigm3.csv
timeout 600 python scripts/mk_performance_graph.py data/perf_m16.csv \
  data/performance_m16.pdf
echo "=== plots done exit=$? $(date +%T) ==="

echo "=== bench sanity start $(date +%T) ==="
timeout 3600 python bench.py
echo "=== bench sanity done exit=$? $(date +%T) ==="

echo "=== chain5_r3 complete $(date +%T) ==="
