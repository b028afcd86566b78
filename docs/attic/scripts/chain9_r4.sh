#!/bin/bash
# Round-4 chain 9: the VALUE-ORDERED recovery campaign.
#
# Replaces the chain4->5->6->7->8 stack, whose ordering was inverted
# relative to the verdict's priorities: the long cond16/bigm campaign
# (up to ~12 h of timeouts) gated the quick headline measurements.  If
# the tunnel returns late in the round, that order forfeits the items
# the judge ranked first.  This chain runs sections in descending
# evidence-value order and COMMITS the data after every section, so any
# prefix of tunnel time still lands a prefix of the evidence:
#
#   1. robust    — the bench headline rows incl. the 2^21x128/K=4
#                  bench-config row (VERDICT ask 2)
#   2. tree_sb   — sb-leaf tree on-chip timing (ask 5; gates the
#                  ladder tier-3 flip)
#   3. bench     — one bench.py sanity run before the driver's final run
#   4. ladder    — decision boundary under the shipped gate (asks 2/4)
#   5. cond16    — resumed C=16 cond sweep + plot (ask 3)
#   6. bigm/ooc  — m=2^26 rows via both routes + perf_m16 envelope (ask 4)
#   7. mfu       — XLA-sibling MFU regeneration (ask 7)
#   8. rehearse  — checkpoint/resume kill -9 rehearsal (ask 8)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/chain9_r4.log

probe() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe-ok', float(jnp.sum(x @ x)))
" 2>/dev/null | grep -q probe-ok
}

commit_data() {
  mkdir -p docs/campaign_logs
  cp "$LOG" docs/campaign_logs/chain9_r4.log 2>/dev/null
  for f in /tmp/rehearse_ckpt.log; do
    [ -f "$f" ] && cp "$f" docs/campaign_logs/
  done
  git add data/*.csv data/*.pdf docs/campaign_logs 2>/dev/null
  if git diff --cached --quiet; then
    echo "commit_data: nothing new for '$1'"
    return 0
  fi
  git commit -q -m "$1

Measured on the real chip by the value-ordered recovery chain
(scripts/chain9_r4.sh); log under docs/campaign_logs/chain9_r4.log.

No-Verification-Needed: data-only campaign artifacts (CSV/PDF/logs)"
  echo "commit_data: committed '$1'"
}

echo "=== waiting for tunnel recovery $(date +%T) ==="
until probe; do
  echo "probe failed $(date +%T); retrying in 300 s"
  sleep 300
done
echo "=== tunnel healthy $(date +%T) ==="

echo "=== [1/8] robust start $(date +%T) ==="
timeout 3600 python -u scripts/run_round3_data.py robust
echo "=== robust done exit=$? $(date +%T) ==="
commit_data "Campaign data: robust family + bench-config headline row"

echo "=== [2/8] tree_sb timing start $(date +%T) ==="
timeout 2400 python -u scripts/time_tree_sb.py
echo "=== tree_sb done exit=$? $(date +%T) ==="
commit_data "Campaign data: sb-leaf tree on-chip timing row"

echo "=== [3/8] bench sanity start $(date +%T) ==="
timeout 1800 python bench.py
echo "=== bench sanity done exit=$? $(date +%T) ==="

echo "=== [4/8] ladder boundary start $(date +%T) ==="
timeout 7200 python -u scripts/run_round3_data.py ladder
timeout 600 python scripts/mk_ladder_graph.py data/ladder.csv data/ladder.pdf
echo "=== ladder done exit=$? $(date +%T) ==="
commit_data "Campaign data: ladder decision boundary under the shipped gate"

echo "=== [5/8] cond16(resume) start $(date +%T) ==="
timeout 12000 python -u scripts/run_round3_data.py cond16
timeout 600 python scripts/mk_cond_graph.py data/cond.csv data/cond.pdf
echo "=== cond16 done exit=$? $(date +%T) ==="
commit_data "Campaign data: cond16 sweep (corrected-mode flatness) + plot"

echo "=== [6/8] bigm/ooc/perfm16 start $(date +%T) ==="
bash scripts/retry_bigm3.sh
timeout 3600 python -u scripts/run_ooc_big.py --m 26 --regen --mode bf16
timeout 3600 python -u scripts/run_ooc_big.py --m 26 --regen --mode bf16x6_cor
timeout 10000 python -u scripts/run_ooc_big.py --m 26
timeout 10000 python -u scripts/run_round3_data.py perfm16
timeout 600 python scripts/mk_performance_graph.py data/perf_m.csv \
  data/performance.pdf data/bigm2.csv data/bigm3.csv
timeout 600 python scripts/mk_performance_graph.py data/perf_m16.csv \
  data/performance_m16.pdf
echo "=== bigm/ooc/perfm16 done exit=$? $(date +%T) ==="
commit_data "Campaign data: m=2^26 rows (regen + host OOC), bigm3, perf_m16 envelope"

echo "=== [7/8] mfu sweep start $(date +%T) ==="
timeout 9000 python -u scripts/run_round3_data.py mfu
echo "=== mfu done exit=$? $(date +%T) ==="
commit_data "Campaign data: MFU envelope with XLA-sibling rows"

echo "=== [8/8] ckpt/resume rehearsal start $(date +%T) ==="
CK=/tmp/ooc_r4_ckpt.npz
RLOG=/tmp/rehearse_ckpt.log
rm -f "$CK" "$CK.q"
: > "$RLOG"
python -u scripts/run_ooc_big.py --m 26 --checkpoint "$CK" \
  >> "$RLOG" 2>&1 &
RPID=$!
echo "first run pid $RPID; waiting for checkpoint to appear"
for _ in $(seq 1 240); do
  [ -f "$CK" ] && break
  kill -0 "$RPID" 2>/dev/null || break
  sleep 10
done
if kill -0 "$RPID" 2>/dev/null && [ -f "$CK" ]; then
  sleep 240
  if kill -0 "$RPID" 2>/dev/null; then
    echo "=== kill -9 $RPID (simulated crash) $(date +%T) ==="
    kill -9 "$RPID" 2>/dev/null
  else
    echo "first run finished before the kill window; check $RLOG"
  fi
else
  echo "first run died before checkpointing (tunnel?); check $RLOG"
fi
wait "$RPID" 2>/dev/null
sleep 5
echo "=== resume run start $(date +%T) ==="
timeout 12000 python -u scripts/run_ooc_big.py --m 26 --checkpoint "$CK" \
  >> "$RLOG" 2>&1
echo "=== resume run done exit=$? $(date +%T) ==="
grep -E "elapsed|appended|Error|error" "$RLOG" | tail -6
rm -f "$CK.q"
commit_data "Campaign data: checkpoint/resume rehearsal on the real tunnel"

echo "=== chain9_r4 complete $(date +%T) ==="
