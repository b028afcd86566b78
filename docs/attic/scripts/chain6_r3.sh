#!/bin/bash
# Round-3 chain 6: re-measure the ladder decision boundary and the
# robust-family table after the tier-0 estimator tightening
# (_psd_norm2_bound: power-compounded inf-norms, ~7x -> ~1.5x overshoot
# — kappa ~2-13 inputs should now take the fast tier), then re-plot.
# Gated on chain5_r3 (cmdline-verified pid).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for chain5_r3 pid $WAIT_PID $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null \
        && grep -q chain5_r3 "/proc/$WAIT_PID/cmdline" 2>/dev/null; do
    sleep 60
  done
  echo "=== chain5_r3 exited $(date +%T) ==="
fi

echo "=== ladder(re-measure) start $(date +%T) ==="
timeout 7200 python -u scripts/run_round3_data.py ladder
echo "=== ladder done exit=$? $(date +%T) ==="

echo "=== robust(re-measure) start $(date +%T) ==="
timeout 7200 python -u scripts/run_round3_data.py robust
echo "=== robust done exit=$? $(date +%T) ==="

echo "=== ladder plot start $(date +%T) ==="
timeout 600 python scripts/mk_ladder_graph.py data/ladder.csv data/ladder.pdf
echo "=== ladder plot done exit=$? $(date +%T) ==="

echo "=== chain6_r3 complete $(date +%T) ==="
