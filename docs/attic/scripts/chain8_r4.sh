#!/bin/bash
# Round-4 chain 8: data-preservation tail.  Waits for chain7_r4 (the
# last measurement chain) to exit — verifying the pid's cmdline identity
# so pid recycling can't fool the gate — then commits every campaign
# artifact (CSVs, PDFs, chain logs) so the measured evidence survives
# even if no interactive session is alive when the chains finish.
# Code changes are deliberately NOT committed here: only data.
set -u
cd /root/repo

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for chain7_r4 pid $WAIT_PID $(date +%T) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null \
        && grep -q chain7_r4 "/proc/$WAIT_PID/cmdline" 2>/dev/null; do
    sleep 60
  done
  echo "=== chain7_r4 exited $(date +%T) ==="
fi

# snapshot the chain logs next to the data they produced
mkdir -p docs/campaign_logs
for f in /tmp/chain4_r3.log /tmp/chain5_r3.log /tmp/chain6_r3.log \
         /tmp/chain7_r4.log /tmp/rehearse_ckpt.log; do
  [ -f "$f" ] && cp "$f" docs/campaign_logs/
done

git add data/*.csv data/*.pdf docs/campaign_logs 2>/dev/null
if git diff --cached --quiet; then
  echo "no campaign data to commit"
  exit 0
fi
git commit -m "$(cat <<'EOF'
Campaign data: round-4 recovery chains (cond16, bigm3, perf_m16, sb-tree, ladder, mfu)

Measured rows and regenerated plots from the post-outage recovery
chains, committed by the chain tail so the evidence lands even without
a live session.  Chain logs preserved under docs/campaign_logs.

No-Verification-Needed: data-only campaign artifacts (CSV/PDF/logs)
EOF
)"
echo "=== chain8_r4 complete $(date +%T) ==="
