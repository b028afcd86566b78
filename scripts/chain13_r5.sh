#!/bin/bash
# Round-5 evidence campaign (supersedes chain11).  Changes vs chain11:
#
#   * CHIP LOCK: every section holds /tmp/tsqr_chip.lock (mkdir-atomic)
#     while it runs and waits while someone else (bench.py — the driver
#     benchmark takes priority) holds it.  The r04 bench OOM landed 40 s
#     after a campaign SIGKILL on the same chip (VERDICT r4 weak #1).
#   * PROCESS-GROUP KILLS: sections run under setsid and the watchdog
#     kills the whole group (ADVICE r4: TERM to `bash -c "a && b"` left
#     the wedged python child orphaned, still holding the TPU dispatch).
#   * Section queue reordered to VERDICT r5 ask priority.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/chain13_r5.log
LOCK=/tmp/tsqr_chip.lock

probe() {
  timeout 75 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe-ok', float(jnp.sum(x @ x)))
" 2>/dev/null | grep -q probe-ok
}

lock_acquire() {
  local waited=0
  while ! mkdir "$LOCK" 2>/dev/null; do
    # a lock older than 40 min is stale (bench.py bounds itself well
    # under that; a crashed section's lock must not wedge the chain)
    local age=$(( $(date +%s) - $(stat -c %Y "$LOCK" 2>/dev/null || date +%s) ))
    if [ "$age" -ge 2400 ]; then
      echo "lock stale (${age}s) — breaking it"
      rm -rf "$LOCK"
      continue
    fi
    if [ $((waited % 120)) -eq 0 ]; then
      echo "chip lock held ($(cat "$LOCK/owner" 2>/dev/null)) — waiting"
    fi
    sleep 15; waited=$((waited + 15))
  done
  echo "chain12 pid=$$" > "$LOCK/owner"
}

lock_release() { rm -rf "$LOCK"; }

newest_mtime() {
  local t1 t2
  t1=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
  t2=$(ls -t data/*.tmp data/*.csv 2>/dev/null | head -1 \
       | xargs -r stat -c %Y 2>/dev/null || echo 0)
  if [ "$t1" -gt "$t2" ]; then echo "$t1"; else echo "$t2"; fi
}

commit_data() {
  mkdir -p docs/campaign_logs
  cp "$LOG" docs/campaign_logs/chain13_r5.log 2>/dev/null
  git add data/*.csv data/*.pdf docs/campaign_logs 2>/dev/null
  if git diff --cached --quiet 2>/dev/null; then
    return 0
  fi
  git commit -q -m "$1

Measured on the real chip by the round-5 campaign loop
(scripts/chain13_r5.sh); log under docs/campaign_logs/chain13_r5.log.

No-Verification-Needed: data-only campaign artifacts (CSV/PDF/logs)"
  echo "commit_data: committed '$1'"
}

run_watched() {  # stall_s total_s command-string
  local stall=$1 total=$2 cmd=$3
  ( exec setsid timeout -k 20 "$total" bash -c "$cmd" >> "$LOG" 2>&1 ) &
  local pid=$! start now last
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s); last=$(newest_mtime)
    if [ $((now - last)) -ge "$stall" ] \
       && [ $((now - start)) -ge "$stall" ]; then
      kill -TERM -- "-$pid" 2>/dev/null || kill -TERM "$pid" 2>/dev/null
      sleep 10
      kill -KILL -- "-$pid" 2>/dev/null || kill -KILL "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      echo "[watchdog] killed group after $((now - last)) s without progress"
      return 142
    fi
  done
  wait "$pid"
}

declare -A CMD STALL TMO MSG FAILS
q=(packed16 newfeat2 bigm3 bench2 mfu tpu_lane)

CMD[packed16]="python -u scripts/time_perfm16_packed.py"
STALL[packed16]=1200; TMO[packed16]=9000
MSG[packed16]="Campaign data: sublane-packed n=16 envelope rows"

CMD[newfeat2]="python -u scripts/time_new_features.py"
STALL[newfeat2]=900; TMO[newfeat2]=2400
MSG[newfeat2]="Campaign data: cca consumer timing row (smaller-program variant)"

CMD[bigm3]="bash scripts/retry_bigm3.sh"
STALL[bigm3]=900;   TMO[bigm3]=3600
MSG[bigm3]="Campaign data: bigm3 capacity rows (retry)"

CMD[bench2]="BENCH_PROBE_RETRIES=2 BENCH_SKIP_LOCK=1 python bench.py"
STALL[bench2]=900;  TMO[bench2]=2400
MSG[bench2]="Campaign: bench.py run exercising the K=3 upgrade path"

CMD[mfu]="python -u scripts/run_round3_data.py mfu"
STALL[mfu]=1200;    TMO[mfu]=7200
MSG[mfu]="Campaign data: MFU envelope with XLA-sibling rows"

CMD[tpu_lane]="TSQR_TEST_PLATFORM=axon python -m pytest tests/test_tpu_compiled.py -q"
STALL[tpu_lane]=1500; TMO[tpu_lane]=5400
MSG[tpu_lane]="Campaign: TPU compiled lane green (see chain13 log)"

for s in "${q[@]}"; do FAILS[$s]=0; done

while [ "${#q[@]}" -gt 0 ]; do
  s=${q[0]}
  until probe; do
    echo "probe failed $(date +%T); next section '$s'; retry in 120 s"
    sleep 120
  done
  lock_acquire
  echo "=== section $s start $(date +%T) (fails=${FAILS[$s]}) ==="
  run_watched "${STALL[$s]}" "${TMO[$s]}" "${CMD[$s]}"
  rc=$?
  echo "=== section $s exit=$rc $(date +%T) ==="
  lock_release
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
echo "=== chain13_r5 complete $(date +%T) ==="
