#!/usr/bin/env python
"""Repair the sub-resolution rows of data/perf_m16.csv (round 5).

The small-m end of the n=16 envelope was measured with loop caps 8-64
against the tunnel's ~30 ms dispatch: the chain-minus-null subtraction
landed inside dispatch jitter, and the worst rows were clamped to the
old 1e-9 s floor — fabricated numbers implying hundreds of TFLOP/s at
512 x 16.  `timing.time_fn_amortized` now NaNs below-resolution
measurements (resolution_nan=True) and `_auto` scales loops to 4096,
which makes even microsecond-class kernels measurable (4096 x ~5 us
~= 20 ms active >> ~1-2 ms jitter).  This script rewrites the CSV:

 * rows with elapsed <= 1e-8 are DROPPED (clamp fabrications);
 * tree (fp32 / bf16x6_cor), golden (jnp.linalg.qr) and packed
   (`*/sbpack`) rows with elapsed < 2e-3 are RE-MEASURED with the
   fixed timer, one subprocess per m (a wedge or OOM costs one m);
 * plain `bf16x6_cor[cholqr2]` sub-resolution rows are dropped, not
   re-measured: cholqr now auto-packs at n <= 64, so a re-measure
   would silently be the sbpack path under the unpacked label — the
   measurable large-m unpacked rows stay as the before/after evidence;
 * sublane-packed labels are ADDED for m = 2^9..2^15
   (scripts/time_perfm16_packed.py covers 2^16 and up).

Chip-lock aware: holds /tmp/tsqr_chip.lock per subprocess batch so the
chain13 campaign and this repair never share the chip.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OUT = ROOT / "data" / "perf_m16.csv"
LOCK = pathlib.Path("/tmp/tsqr_chip.lock")
N = 16

TREE_LABELS = ("fp32", "bf16x6_cor")
GOLDEN = "jnp.linalg.qr"
PACKED = [("bf16x6_cor", "cholqr2", "bf16x6_cor[cholqr2/sbpack]"),
          ("fp32", "cholqr2", "fp32[cholqr2/sbpack]"),
          ("bf16", "cholqr1", "bf16[cholqr1/sbpack]")]
PACKED_LABELS = {lbl: (mode, meth) for mode, meth, lbl in PACKED}

CHILD = r'''
import json, sys
sys.path.insert(0, sys.argv[1])
spec = json.loads(sys.argv[2])
import jax, jax.numpy as jnp
from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr, tsqr as tsqr_mod
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.utils import timing

n = 16
for m, labels in spec["jobs"]:
  a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)
  for label in labels:
    try:
        if label in ("fp32", "bf16x6_cor"):   # Householder-tree BlockQR
            policy = modes.resolve(label)
            leaf = min(m, 2048)
            fn = lambda x: blockqr.qr(x, policy, panel_width=16,
                                      leaf_rows=leaf)
            t, loops = timing.time_fn_amortized_auto(
                fn, a, reps=3, max_loops=4096, resolution_nan=True)
            fl = flops_mod.blockqr_flops(m, n, 16, leaf,
                                         tsqr_mod.DEFAULT_FANIN, False)
            wmem = tsqr_mod.working_memory_elems(m, n, leaf,
                                                 tsqr_mod.DEFAULT_FANIN) * 4
        elif label == "jnp.linalg.qr":
            t, loops = timing.time_fn_amortized_auto(
                jnp.linalg.qr, a, reps=2, max_loops=4096,
                resolution_nan=True)
            fl, wmem = flops_mod.qr_flops(m, n), 0
        else:                                  # packed fastqr labels
            mode, method = spec["packed"][label]
            fn = lambda x: cholqr.fastqr(x, mode, method=method)
            t, loops = timing.time_fn_amortized_auto(
                fn, a, reps=3, max_loops=4096, resolution_nan=True)
            fl, wmem = flops_mod.qr_flops(m, n), 0
        if t != t:
            print(f"SKIP {m} {label}: below resolution at 4096 loops",
                  flush=True)
            continue
        print("ROW %d,16,float32,%s,0,%.6e,%.4f,%d"
              % (m, label, t, fl / t / 1e12, wmem), flush=True)
    except Exception as e:
        print(f"ERR {m} {label}: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
'''


def lock_acquire():
    waited = 0
    while True:
        try:
            LOCK.mkdir()
            (LOCK / "owner").write_text(f"fix_perfm16 pid={os.getpid()}\n")
            return
        except FileExistsError:
            age = time.time() - LOCK.stat().st_mtime if LOCK.exists() else 0
            if age >= 2400:
                print(f"lock stale ({age:.0f}s) — breaking", flush=True)
                subprocess.run(["rm", "-rf", str(LOCK)])
                continue
            if waited % 120 == 0:
                print("chip lock held — waiting", flush=True)
            time.sleep(15)
            waited += 15


def lock_release():
    subprocess.run(["rm", "-rf", str(LOCK)])


def main() -> None:
    lines = OUT.read_text().splitlines()
    header, body = lines[0], lines[1:]
    keep, replace_keys, dropped_packed = [], set(), set()
    by_key = {}
    for ln in body:
        if not ln.strip() or ln.startswith("#"):
            keep.append(("comment", ln))
            continue
        p = ln.split(",")
        try:
            m, label, elapsed = int(p[0]), p[3], float(p[5])
        except (ValueError, IndexError):
            # stray continuation lines from multi-line error messages a
            # previous campaign wrote raw into the CSV: drop them (the
            # one-line "# error" head above them is kept)
            print(f"drop junk line: {ln!r}", flush=True)
            continue
        key = (m, label)
        if elapsed <= 1e-8:
            print(f"drop fabricated: {ln}", flush=True)
            if label in PACKED_LABELS:
                dropped_packed.add(key)
            continue
        if elapsed < 2e-3 and label == "bf16x6_cor[cholqr2]":
            print(f"drop jitter-band unpacked (superseded by sbpack): {ln}",
                  flush=True)
            continue
        if elapsed < 2e-3 and (label in TREE_LABELS or label == GOLDEN
                               or label in PACKED_LABELS):
            replace_keys.add(key)
        keep.append(("row", ln))
        by_key[key] = ln

    # sbpack coverage below 2^16 (time_perfm16_packed covers 2^16 up)
    want_new = set(dropped_packed)
    for k in range(9, 16):
        for lbl in PACKED_LABELS:
            if ((1 << k), lbl) not in by_key:
                want_new.add(((1 << k), lbl))
    # dropped fabricated tree/golden rows need a fresh measurement too
    have = set(by_key)
    for k in range(9, 25):  # tree+golden measured HBM-resident to 2^24
        m = 1 << k
        for lbl in (*TREE_LABELS, GOLDEN):
            if (m, lbl) not in have:
                want_new.add((m, lbl))

    todo = {}
    for m, lbl in sorted(replace_keys | want_new):
        todo.setdefault(m, []).append(lbl)

    if "--dry" in sys.argv:
        for m, labels in sorted(todo.items()):
            print(f"would measure m=2^{m.bit_length()-1}: {labels}")
        return

    # batch several m per subprocess (the ~40 s backend init dominates
    # tiny-shape children); cap the per-batch element budget so a wedge
    # or OOM costs one bounded batch
    batches, cur, cur_elems = [], [], 0
    for m, labels in sorted(todo.items()):
        if cur and cur_elems + m * N > (1 << 25):
            batches.append(cur)
            cur, cur_elems = [], 0
        cur.append([m, labels])
        cur_elems += m * N
    if cur:
        batches.append(cur)

    results = {}
    for jobs in batches:
        spec = {"jobs": jobs, "packed": PACKED_LABELS}
        names = [f"2^{m.bit_length()-1}" for m, _ in jobs]
        print(f"=== batch m={names}", flush=True)
        lock_acquire()
        try:
            res = subprocess.run(
                [sys.executable, "-u", "-c", CHILD, str(ROOT),
                 json.dumps(spec)],
                capture_output=True, text=True, timeout=2100,
                env=dict(os.environ))
        except subprocess.TimeoutExpired:
            print(f"batch {names}: child timeout — keeping old rows",
                  flush=True)
            continue
        finally:
            lock_release()
        for ln in res.stdout.splitlines():
            if ln.startswith("ROW "):
                row = ln[4:]
                results[(int(row.split(",")[0]), row.split(",")[3])] = row
                print("  " + row, flush=True)
            elif ln.startswith(("SKIP", "ERR")):
                print("  " + ln, flush=True)
        if res.returncode != 0:
            print(f"batch {names}: child rc={res.returncode} "
                  f"stderr tail: {res.stderr.strip()[-300:]}", flush=True)

    out_lines = [header]
    emitted = set()
    for kind, ln in keep:
        if kind == "comment":
            out_lines.append(ln)
            continue
        p = ln.split(",")
        key = (int(p[0]), p[3])
        if key in results:
            out_lines.append(results[key])
        else:
            out_lines.append(ln)
        emitted.add(key)
    for key in sorted(k for k in results if k not in emitted):
        out_lines.append(results[key])

    tmp = OUT.with_suffix(".csv.tmp")
    tmp.write_text("\n".join(out_lines) + "\n")
    tmp.replace(OUT)
    print(f"rewrote {OUT}: {len(out_lines)-1} lines, "
          f"{len(results)} fresh measurements", flush=True)


if __name__ == "__main__":
    main()
