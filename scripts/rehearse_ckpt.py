#!/usr/bin/env python
"""Checkpoint/resume kill -9 rehearsal ON THE REAL TUNNEL (VERDICT r3
ask 8 / r4 ask 6): prove that a host-OOC factorization killed dead
mid-stream (SIGKILL — no atexit, no flushing) resumes from its
per-chunk checkpoint and completes with correct metrics.

Protocol:
  1. launch `run_ooc_big.py --m 23 --chunk 2^20 --checkpoint <tmp>` as a
     child process;
  2. wait for the checkpoint file to appear (first chunk committed) plus
     a grace period so several chunks land, then SIGKILL the child BY
     PID (never by pattern);
  3. re-run the identical command to completion — the resumed process
     skips completed Q chunks and appends an
     `ooc_cholqr1[host_ckpt_resumed]` row to data/bigm2.csv.

m=2^23 x 128 bf16 keeps the rehearsal short (~2 GB A, ~6 GB tunnel
traffic) while spanning 8 chunks at chunk=2^20 — enough that the kill
lands strictly mid-stream.  The CPU-side fault-injection path
(`qr_out_of_core(_fault_after=...)`, tests/test_ooc_auto.py) already
pins the resume algebra; THIS run pins the real-process, real-tunnel
behavior.
"""

import os
import pathlib
import signal
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
CK = "/tmp/ooc_rehearsal_ck"
CMD = [sys.executable, "-u", str(ROOT / "scripts" / "run_ooc_big.py"),
       "--m", "23", "--chunk", str(1 << 20), "--checkpoint", CK]


def main() -> None:
    for p in (CK, CK + ".q"):
        try:
            os.remove(p)
        except OSError:
            pass

    print("rehearsal: launching victim process...", flush=True)
    child = subprocess.Popen(CMD, stdout=sys.stdout, stderr=sys.stderr)
    t0 = time.monotonic()
    try:
        while not pathlib.Path(CK).exists():
            if child.poll() is not None:
                print(f"rehearsal: victim exited rc={child.returncode} "
                      "before the first checkpoint — aborting", flush=True)
                sys.exit(1)
            if time.monotonic() - t0 > 1200:
                print("rehearsal: no checkpoint after 20 min — aborting",
                      flush=True)
                child.kill()
                sys.exit(1)
            time.sleep(2)
        # let a few more chunks land so the kill is strictly mid-stream
        time.sleep(20)
        if child.poll() is None:
            print("rehearsal: SIGKILL to victim pid "
                  f"{child.pid} at t={time.monotonic()-t0:.0f}s", flush=True)
            os.kill(child.pid, signal.SIGKILL)
        else:
            print("rehearsal: victim finished before the kill — matrix "
                  "too small for this tunnel; still exercising resume "
                  "path check", flush=True)
    finally:
        child.wait()

    if not pathlib.Path(CK).exists():
        print("rehearsal: checkpoint vanished after kill — FAIL", flush=True)
        sys.exit(1)
    print("rehearsal: checkpoint survives the SIGKILL; resuming...",
          flush=True)
    rc = subprocess.run(CMD, timeout=6000).returncode
    if rc != 0:
        print(f"rehearsal: resume run failed rc={rc}", flush=True)
        sys.exit(rc)
    ok = not pathlib.Path(CK).exists()  # removed on completion
    print(f"rehearsal: resume completed; checkpoint cleaned up: {ok} — "
          "see the host_ckpt_resumed row in data/bigm2.csv", flush=True)
    try:
        os.remove(CK + ".q")
    except OSError:
        pass


if __name__ == "__main__":
    main()
