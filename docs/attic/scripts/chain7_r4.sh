#!/bin/bash
# Round-4 chain 7: gated on chain6_r3 (cmdline-verified pid).
#   1. regenerate data/mfu.csv — the sweep now falls back to the XLA
#      sibling where the fused kernels delegate (n=2048 corrected modes),
#      closing the envelope's error-comment holes (VERDICT r3 ask #7).
#   2. checkpoint/resume rehearsal against the REAL tunnel (ask #8):
#      launch the checkpointed m=2^26 host OOC route, kill -9 the process
#      mid-pass, rerun the same command, and let it resume to completion.
#      The resumed run's orthogonality/residual must match the plain
#      host_streamed row (chain4) — metrics accumulators live in the
#      checkpoint; Q is a disk-backed memmap so pre-kill chunks survive.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for chain6_r3 pid $WAIT_PID $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null \
        && grep -q chain6_r3 "/proc/$WAIT_PID/cmdline" 2>/dev/null; do
    sleep 60
  done
  echo "=== chain6_r3 exited $(date +%T) ==="
fi

echo "=== mfu sweep start $(date +%T) ==="
timeout 9000 python -u scripts/run_round3_data.py mfu
echo "=== mfu sweep done exit=$? $(date +%T) ==="

echo "=== ckpt/resume rehearsal start $(date +%T) ==="
CK=/tmp/ooc_r4_ckpt.npz
LOG=/tmp/rehearse_ckpt.log
rm -f "$CK" "$CK.q"
: > "$LOG"
python -u scripts/run_ooc_big.py --m 26 --checkpoint "$CK" \
  >> "$LOG" 2>&1 &
RPID=$!
echo "first run pid $RPID; waiting for checkpoint to appear"
# wait (bounded) for the checkpoint file, then let several more chunks
# land so the kill strikes genuinely mid-pass
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
    echo "first run finished before the kill window — rehearsing" \
         "resume-from-complete is meaningless; check $LOG"
  fi
else
  echo "first run died before checkpointing (tunnel?); check $LOG"
fi
wait "$RPID" 2>/dev/null
sleep 5
echo "=== resume run start $(date +%T) ==="
timeout 12000 python -u scripts/run_ooc_big.py --m 26 --checkpoint "$CK" \
  >> "$LOG" 2>&1
echo "=== resume run done exit=$? $(date +%T) ==="
grep -E "elapsed|appended|Error|error" "$LOG" | tail -6
rm -f "$CK.q"

echo "=== chain7_r4 complete $(date +%T) ==="
