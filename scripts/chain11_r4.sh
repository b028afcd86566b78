#!/bin/bash
# Round-4 chain 11: FLAPPING-TOLERANT evidence loop (supersedes chain9/10).
#
# The Aug 20 tunnel behavior is new: it recovers for short windows
# (~30 s .. minutes) and re-wedges — chain9 probed once at chain start,
# then let a section hang on a dead dispatch until its multi-ksec
# timeout, blind to any recovery window in between.  This loop:
#
#   * re-probes (75 s timeout) BEFORE every section launch and sleeps
#     between failed probes — a section is only ever launched into a
#     healthy tunnel;
#   * watches progress (log + data file mtimes) and kills a section
#     that has made none for `stall` seconds — a mid-section wedge
#     costs ~15 min, not the section timeout;
#   * keeps sections resumable where they support it (robust / ladder /
#     cond16 resume by completed row; the OOC scripts append), so
#     successive windows ACCUMULATE rows;
#   * rotates a twice-failed section to the back of the queue so one
#     expensive section cannot starve the rest, and drops it after 6
#     failures;
#   * commits data after every attempt (value-ordered queue, one commit
#     per section, chain9-style).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/chain11_r4.log

probe() {
  timeout 75 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe-ok', float(jnp.sum(x @ x)))
" 2>/dev/null | grep -q probe-ok
}

newest_mtime() {
  local t1 t2
  t1=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
  t2=$(ls -t data/*.tmp data/*.csv 2>/dev/null | head -1 \
       | xargs -r stat -c %Y 2>/dev/null || echo 0)
  if [ "$t1" -gt "$t2" ]; then echo "$t1"; else echo "$t2"; fi
}

commit_data() {
  mkdir -p docs/campaign_logs
  cp "$LOG" docs/campaign_logs/chain11_r4.log 2>/dev/null
  git add data/*.csv data/*.pdf docs/campaign_logs 2>/dev/null
  if git diff --cached --quiet 2>/dev/null; then
    return 0
  fi
  git commit -q -m "$1

Measured on the real chip by the flapping-tolerant recovery loop
(scripts/chain11_r4.sh); log under docs/campaign_logs/chain11_r4.log.

No-Verification-Needed: data-only campaign artifacts (CSV/PDF/logs)"
  echo "commit_data: committed '$1'"
}

run_watched() {  # stall_s total_s command-string
  local stall=$1 total=$2 cmd=$3
  ( exec timeout "$total" bash -c "$cmd" >> "$LOG" 2>&1 ) &
  local pid=$! start now last
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s); last=$(newest_mtime)
    if [ $((now - last)) -ge "$stall" ] \
       && [ $((now - start)) -ge "$stall" ]; then
      kill -TERM "$pid" 2>/dev/null
      sleep 10
      kill -KILL "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      echo "[watchdog] killed after $((now - last)) s without progress"
      return 142
    fi
  done
  wait "$pid"
}

declare -A CMD STALL TMO MSG FAILS
q=(robust tree_sb bench ladder cond16 bigm3 ooc_regen_b ooc_regen_c \
   ooc_host perfm16 plots mfu tpu_lane newfeat)

CMD[robust]="python -u scripts/run_round3_data.py robust"
STALL[robust]=900;  TMO[robust]=2700
MSG[robust]="Campaign data: robust family + bench-config headline row"

CMD[tree_sb]="python -u scripts/time_tree_sb.py"
STALL[tree_sb]=900; TMO[tree_sb]=1800
MSG[tree_sb]="Campaign data: sb-leaf tree on-chip timing row"

CMD[bench]="BENCH_PROBE_RETRIES=2 python bench.py"
STALL[bench]=900;   TMO[bench]=1500
MSG[bench]="Campaign: bench.py sanity run"

CMD[ladder]="python -u scripts/run_round3_data.py ladder && \
  timeout 600 python scripts/mk_ladder_graph.py data/ladder.csv data/ladder.pdf"
STALL[ladder]=900;  TMO[ladder]=5400
MSG[ladder]="Campaign data: ladder decision boundary under the shipped gate"

CMD[cond16]="python -u scripts/run_round3_data.py cond16 && \
  timeout 600 python scripts/mk_cond_graph.py data/cond.csv data/cond.pdf"
STALL[cond16]=1200; TMO[cond16]=10800
MSG[cond16]="Campaign data: cond16 sweep (corrected-mode flatness) + plot"

CMD[bigm3]="bash scripts/retry_bigm3.sh"
STALL[bigm3]=900;   TMO[bigm3]=3600
MSG[bigm3]="Campaign data: bigm3 capacity rows"

CMD[ooc_regen_b]="python -u scripts/run_ooc_big.py --m 26 --regen --mode bf16"
STALL[ooc_regen_b]=900; TMO[ooc_regen_b]=3600
MSG[ooc_regen_b]="Campaign data: m=2^26 matrix-free regen row (bf16)"

CMD[ooc_regen_c]="python -u scripts/run_ooc_big.py --m 26 --regen --mode bf16x6_cor"
STALL[ooc_regen_c]=900; TMO[ooc_regen_c]=3600
MSG[ooc_regen_c]="Campaign data: m=2^26 matrix-free regen row (corrected)"

CMD[ooc_host]="python -u scripts/run_ooc_big.py --m 26"
STALL[ooc_host]=1200; TMO[ooc_host]=10000
MSG[ooc_host]="Campaign data: m=2^26 host OOC row"

CMD[perfm16]="python -u scripts/run_round3_data.py perfm16"
STALL[perfm16]=1200; TMO[perfm16]=10000
MSG[perfm16]="Campaign data: perf_m16 reference envelope"

CMD[plots]="timeout 600 python scripts/mk_performance_graph.py data/perf_m.csv \
    data/performance.pdf data/bigm2.csv data/bigm3.csv; \
  timeout 600 python scripts/mk_performance_graph.py data/perf_m16.csv \
    data/performance_m16.pdf"
STALL[plots]=600;   TMO[plots]=1300
MSG[plots]="Campaign data: regenerated performance plots"

CMD[mfu]="python -u scripts/run_round3_data.py mfu"
STALL[mfu]=1200;    TMO[mfu]=7200
MSG[mfu]="Campaign data: MFU envelope with XLA-sibling rows"

CMD[tpu_lane]="TSQR_TEST_PLATFORM=axon python -m pytest tests/test_tpu_compiled.py -q -x"
STALL[tpu_lane]=1200; TMO[tpu_lane]=3600
MSG[tpu_lane]="Campaign: TPU compiled lane green (see chain11 log)"

CMD[newfeat]="python -u scripts/time_new_features.py"
STALL[newfeat]=900; TMO[newfeat]=3600
MSG[newfeat]="Campaign data: AD backward / qrcp / rand_cholqr / vmap timing rows"

for s in "${q[@]}"; do FAILS[$s]=0; done

while [ "${#q[@]}" -gt 0 ]; do
  s=${q[0]}
  until probe; do
    echo "probe failed $(date +%T); next section '$s'; retry in 120 s"
    sleep 120
  done
  echo "=== section $s start $(date +%T) (fails=${FAILS[$s]}) ==="
  run_watched "${STALL[$s]}" "${TMO[$s]}" "${CMD[$s]}"
  rc=$?
  echo "=== section $s exit=$rc $(date +%T) ==="
  commit_data "${MSG[$s]}"
  if [ "$rc" -eq 0 ]; then
    q=("${q[@]:1}")
  else
    FAILS[$s]=$((FAILS[$s] + 1))
    if [ "${FAILS[$s]}" -ge 6 ]; then
      echo "section $s dropped after ${FAILS[$s]} failures"
      q=("${q[@]:1}")
    elif [ $((FAILS[$s] % 2)) -eq 0 ]; then
      q=("${q[@]:1}" "$s")   # rotate to back every 2 failures
    fi
  fi
done
echo "=== chain11_r4 complete $(date +%T) ==="
