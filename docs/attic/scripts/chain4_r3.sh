#!/bin/bash
# Round-3 chain 4: recovery chain after the tunnel wedged mid-cond16.
# Gate on a trivial-op probe (the wedge blocks even 256x256 matmuls),
# then run the remaining campaign: resumed cond16, capacity rows,
# regen + host routes to m=2^26, and the n=16 reference-protocol
# envelope.  Every section is process-isolated with its own timeout.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

probe() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe-ok', float(jnp.sum(x @ x)))
" 2>/dev/null | grep -q probe-ok
}

echo "=== waiting for tunnel recovery $(date +%T) ==="
until probe; do
  echo "probe failed $(date +%T); retrying in 300 s"
  sleep 300
done
echo "=== tunnel healthy $(date +%T) ==="

echo "=== cond16(resume) start $(date +%T) ==="
timeout 12000 python -u scripts/run_round3_data.py cond16
echo "=== cond16 done exit=$? $(date +%T) ==="

echo "=== retry_bigm3 start $(date +%T) ==="
bash scripts/retry_bigm3.sh
echo "=== retry_bigm3 done exit=$? $(date +%T) ==="

echo "=== ooc26_regen(bf16) start $(date +%T) ==="
timeout 3600 python -u scripts/run_ooc_big.py --m 26 --regen --mode bf16
echo "=== ooc26_regen(bf16) done exit=$? $(date +%T) ==="

echo "=== ooc26_regen(x6) start $(date +%T) ==="
timeout 3600 python -u scripts/run_ooc_big.py --m 26 --regen --mode bf16x6_cor
echo "=== ooc26_regen(x6) done exit=$? $(date +%T) ==="

echo "=== perfm16 start $(date +%T) ==="
timeout 10000 python -u scripts/run_round3_data.py perfm16
echo "=== perfm16 done exit=$? $(date +%T) ==="

echo "=== ooc26_host start $(date +%T) ==="
timeout 10000 python -u scripts/run_ooc_big.py --m 26
echo "=== ooc26_host done exit=$? $(date +%T) ==="

echo "=== chain4_r3 complete $(date +%T) ==="
