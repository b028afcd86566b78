#!/usr/bin/env python
"""Round-3 measured-data campaign on the real TPU chip.

Each section is independently runnable/restartable (the tunnel wedges
occasionally); CSV rows flush as they land.  Sections:

  cond16   cond.csv at the reference's C=16 trials (test.cu:81-234) —
           round 2 used 4; variance columns were statistically thin.
  mfu      regenerate mfu.csv with the K-concat kernels, auto-scaled
           timing loops, the physics flag column, and the new robust
           compact pipeline rows.
  robust   data/robust.csv — the robust-headline family at 2^22 x 128
           (cholqr1 / cholqr2 fast / cholqr3 safe / cholqr3 compact /
           the qr_auto_fused ladder) with measured in-program gate cost.
  ladder   data/ladder.csv — the auto-driver decision boundary: for
           latms kappa = 2^0..2^15, which tier the ladder lands in,
           orthogonality, residual, elapsed time (VERDICT r2 item 8).
  bigm3    re-measure the capacity rows with the round-3 kernels,
           including the ROBUST capacity config (cholqr3 compact
           inplace at M=2^24 x 128 f32).
  perfm16  reference-protocol envelope: n=16 panels, m=2^9..2^26
           (mk_performance_graph.py's exact axis) -> data/perf_m16.csv.

Run: python scripts/run_round3_data.py <section>
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from tsqr_tpu.utils.status import exc_note  # noqa: E402

DATA = ROOT / "data"
MODES = ["fp32", "bf16_nocor", "bf16x3_cor", "bf16x6_cor"]
KW = dict(panel_width=128, leaf_rows=2048)


def _tmp_csv(name):
    """Tmp path for regenerating data/<name> without risking committed
    evidence: sections write here and call _swap_csv(name) on
    completion.  A timeout kill mid-section (the tunnel's wedge mode is
    a hang, and it half-truncated cond.csv in round 3) or an all-error
    run leaves the previously committed file untouched."""
    return DATA / (name + ".tmp")


def _done_keys(name):
    """First-column keys already present in <name>.tmp — lets a section
    RESUME after a flapping-tunnel kill: completed rows persist in the
    tmp across attempts and only the missing items re-run."""
    tmp = _tmp_csv(name)
    done = set()
    if tmp.exists():
        for ln in tmp.read_text().splitlines()[1:]:
            if ln.strip() and not ln.lstrip().startswith("#"):
                done.add(ln.split(",")[0])
    return done


def _data_rows(lines):
    return [ln for ln in lines[1:]
            if ln.strip() and not ln.lstrip().startswith("#")]


def _swap_csv(name):
    """Publish data/<name>.tmp by MERGING over the committed file, keyed
    on the first column: fresh tmp rows win on key collision, committed
    rows without a fresh replacement are KEPT.  (The previous wholesale
    os.replace let a mostly-failed section shrink a committed multi-row
    evidence file to one row — ADVICE r4.)  No-op if the tmp holds no
    data rows."""
    tmp = _tmp_csv(name)
    try:
        tmp_lines = tmp.read_text().splitlines()
    except OSError:
        return
    fresh = _data_rows(tmp_lines)
    if not fresh:
        tmp.unlink()
        print(f"{name}: produced no data rows — keeping the committed "
              "file", file=sys.stderr, flush=True)
        return
    target = DATA / name
    old = _data_rows(target.read_text().splitlines()) \
        if target.exists() else []
    fresh_keys = {ln.split(",")[0] for ln in fresh}
    kept = [ln for ln in old if ln.split(",")[0] not in fresh_keys]
    header = tmp_lines[0]
    target.write_text("\n".join([header] + fresh + kept) + "\n")
    tmp.unlink()
    print(f"{name}: merged {len(fresh)} fresh rows over {len(kept)} kept "
          "committed rows", file=sys.stderr, flush=True)


def cond16():
    """RESUMABLE: the tunnel wedged 63 rows into the first run (process
    blocked 40 min on a device response, CPU clock frozen) — completed
    (mode, reorth, cond) combos already in data/cond.csv are kept and
    skipped, so a restart only pays for the missing rows."""
    from tsqr_tpu.harness import cond as cond_mod

    path = DATA / "cond.csv"
    done, kept = set(), []
    if path.exists():
        for line in path.read_text().splitlines():
            if not line or line.startswith("#") or line.startswith("m,n,"):
                continue
            p = line.split(",")
            # m,n,condition,measured_condition,type,compute_mode,reorth,...
            done.add((p[5], int(p[6]), float(p[2])))
            kept.append(line)
    print(f"cond16: resuming with {len(kept)} rows done", file=sys.stderr,
          flush=True)
    with open(path, "w") as f:
        print(cond_mod.CSV_HEADER, file=f, flush=True)
        for line in kept:
            print(line, file=f, flush=True)
        for mode in MODES + ["golden"]:
            name = "jnp.linalg.qr" if mode == "golden" else mode
            for reorth in (False, True):
                if mode == "golden" and reorth:
                    continue
                for cond in [2.0 ** k for k in range(2, 16)]:
                    if (name, int(reorth), cond) in done:
                        continue
                    try:
                        row = cond_mod.cond_row(1 << 15, 1 << 7, cond, mode,
                                                reorth, trials=16, **KW)
                    except Exception as e:
                        print(f"# error cond={cond} mode={mode}: "
                              f"{exc_note(e)}", file=f, flush=True)
                        continue
                    print(cond_mod.format_row(row), file=f, flush=True)
                    print(f"cond16 {name} reorth={int(reorth)} "
                          f"kappa={cond:.0f} done", file=sys.stderr,
                          flush=True)


def mfu():
    from tsqr_tpu.harness import mfu as mfu_mod

    with open(_tmp_csv("mfu.csv"), "w") as f:
        mfu_mod.sweep(out=f)
    _swap_csv("mfu.csv")


class _AlreadyDone(BaseException):
    pass


def robust():
    import jax
    import jax.numpy as jnp
    from tsqr_tpu.core import auto, cholqr
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import timing, validation

    m, n = 1 << 22, 128
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32,
                           -1, 1)
    useful = flops_mod.qr_flops(m, n)

    done = _done_keys("robust.csv")

    def row(f, item, fn):
        if item in done:
            return
        try:
            q, r = jax.jit(fn)(a)
            orth = validation.orthogonality_accurate(q)
            del q, r
            t, loops = timing.time_fn_amortized_auto(fn, a, reps=3)
            f.write(f"{item},{m},{n},{t:.6e},{useful/t/1e12:.3f},"
                    f"{orth:.3e},loops={loops}\n")
        except Exception as e:
            f.write(f"# error {item}: {exc_note(e)}\n")
        f.flush()

    with open(_tmp_csv("robust.csv"), "a" if done else "w") as f:
        if not done:
            f.write("item,m,n,elapsed_time,useful_tflops,orthogonality,"
                    "note\n")
        row(f, "cholqr1_fused[x6]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr1_fused"))
        row(f, "cholqr2_fused[x6/fast]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr2_fused", variant="fast"))
        row(f, "cholqr3_fused[x6/safe]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr3_fused"))
        row(f, "cholqr3_fused[x6/compact]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr3_fused", variant="compact"))
        # the PREDICTIVE ladder (cond program: the dus chain mis-measures
        # it — use the distinct-inputs chain).  2^20 x K=6 is the largest
        # proven-fit config: the serialize barrier still lets XLA overlap
        # ~2 calls, so K inputs + 2 calls' temps must fit HBM (2^21 x K=4
        # measured OOM).
        want = {"ladder[pred/x6]", "cholqr1_fused[x6/distinct]"} - done
        try:
            if want:
                m_l, k_l = 1 << 20, 6
                keys = jax.random.split(jax.random.PRNGKey(0), k_l)
                xs = tuple(jax.random.uniform(kk, (m_l, n), jnp.float32,
                                              -1, 1) for kk in keys)
                ufl = flops_mod.qr_flops(m_l, n)
            if "ladder[pred/x6]" in want:
                lfn = lambda x: auto.qr_auto_fused(  # noqa: E731
                    x, "bf16x6_cor", fast_method="cholqr1_fused",
                    mid_method="cholqr3_fused", mid_variant="compact")
                q, r = jax.jit(lfn)(xs[0])
                orth = validation.orthogonality_accurate(q)
                del q, r
                t = timing.time_fn_distinct(lfn, xs, reps=3)
                f.write(f"ladder[pred/x6],{m_l},{n},{t:.6e},"
                        f"{ufl/t/1e12:.3f},{orth:.3e},distinct_k={k_l}\n")
                f.flush()
            if "cholqr1_fused[x6/distinct]" in want:
                # bare tier-1 method under the SAME harness: the ladder's
                # measured overhead is the difference
                bfn = lambda x: cholqr.fastqr(  # noqa: E731
                    x, "bf16x6_cor", method="cholqr1_fused")
                t_b = timing.time_fn_distinct(bfn, xs, reps=3)
                f.write(f"cholqr1_fused[x6/distinct],{m_l},{n},{t_b:.6e},"
                        f"{ufl/t_b/1e12:.3f},,distinct_k={k_l}\n")
        except Exception as e:
            f.write(f"# error ladder[pred/x6]: {exc_note(e)}\n")
        f.flush()

    # the bench.py headline config (2^21 x 128, K=4) — in a FRESH
    # subprocess (an OOM there must not poison this section's process),
    # appended last so the row maps 1:1 to what BENCH_r04 measures
    import subprocess
    code = f"""
import sys
sys.path.insert(0, {str(ROOT)!r})
import jax, jax.numpy as jnp
from tsqr_tpu.core import auto
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.utils import timing, validation
m_l, n, k_l = 1 << 21, 128, 4
keys = jax.random.split(jax.random.PRNGKey(0), k_l)
xs = tuple(jax.random.uniform(kk, (m_l, n), jnp.float32, -1, 1)
           for kk in keys)
lfn = lambda x: auto.qr_auto_fused(x, "bf16x6_cor",
                                   fast_method="cholqr1_fused",
                                   mid_method="cholqr3_fused",
                                   mid_variant="compact")
q, r = jax.jit(lfn)(xs[0])
orth = validation.orthogonality_accurate(q)
del q, r
t = timing.time_fn_distinct(lfn, xs, reps=3)
ufl = flops_mod.qr_flops(m_l, n)
print(f"ROW ladder[pred/x6/bench],{{m_l}},{{n}},{{t:.6e}},"
      f"{{ufl/t/1e12:.3f}},{{orth:.3e}},distinct_k={{k_l}}", flush=True)
"""
    with open(_tmp_csv("robust.csv"), "a") as f:
        try:
            if "ladder[pred/x6/bench]" in done:
                raise _AlreadyDone
            res = subprocess.run([sys.executable, "-u", "-c", code],
                                 capture_output=True, text=True,
                                 timeout=1800, env=dict(os.environ))
            rows = [ln[4:] for ln in res.stdout.splitlines()
                    if ln.startswith("ROW ")]
            if not rows:
                raise RuntimeError(f"exit={res.returncode} "
                                   f"stderr={res.stderr.strip()[-300:]}")
            f.write(rows[-1] + "\n")
            print(f"robust bench-config: {rows[-1]}", file=sys.stderr,
                  flush=True)
        except _AlreadyDone:
            pass
        except Exception as e:
            f.write(f"# error ladder[pred/x6/bench]: {exc_note(e)}\n")
        f.flush()
    _swap_csv("robust.csv")


def ladder():
    """Decision boundary of the PREDICTIVE ladder (VERDICT r2 item 8).

    For latms inputs across kappa, records the tier-0 kappa^2 estimate
    (the power-compounded PSD norm bound driving the tier-1 gate —
    auto._psd_norm2_bound), the tier the ladder actually took (the
    program's own return_info tag — ground truth, not a host
    reconstruction), and the end-to-end ladder accuracy + time per
    kappa."""
    import jax
    import numpy as np
    from tsqr_tpu.core import auto
    from tsqr_tpu.utils import latms, timing, validation

    m, n = 1 << 20, 128
    mode = "bf16x6_cor"

    def fn(x):
        return auto.qr_auto_fused(x, mode, fast_method="cholqr1_fused",
                                  mid_method="cholqr3_fused",
                                  mid_variant="compact")

    def fn_info(x):
        return auto.qr_auto_fused(x, mode, fast_method="cholqr1_fused",
                                  mid_method="cholqr3_fused",
                                  mid_variant="compact", return_info=True)

    done = _done_keys("ladder.csv")
    with open(_tmp_csv("ladder.csv"), "a" if done else "w") as f:
        if not done:
            f.write("kappa_target,kappa_measured,m,n,kappa2_est,tier,"
                    "orthogonality,residual,elapsed_time\n")
        # through kappa=2^20 ~ 1e6: rungs past the robust tier's ~1e4
        # ceiling land on tier 3 (iterated shifted CholQR, design range
        # to the f32 limit ~1e7) — the committed table must show all
        # four tiers occupied at their design kappa ranges (VERDICT r4
        # ask 3)
        for k in range(0, 21, 2):
            if str(2 ** k) in done:
                continue
            try:
                xs, meas = [], 0.0
                for j in range(3):  # distinct draws for the timing chain
                    key = jax.random.PRNGKey(100 + k + 1000 * j)
                    x, mj = latms.rand_matrix_with_cond(key, m, n,
                                                        float(2 ** k))
                    xs.append(x)
                    meas = max(meas, mj)
                a = xs[0]
                q, r, info = fn_info(a)
                k2 = float(info["kappa2_est"][0, 0])
                tier = {1: "fast", 2: "robust", 3: "iter", 4: "householder"}[
                    int(info["tier"][0, 0])]
                orth = validation.orthogonality_accurate(q)
                resid = float(validation.residual_device_chunked(a, q, r))
                del q, r
                # cond program: the distinct-inputs chain is the only
                # sound amortized timing (see timing.time_fn_distinct)
                t = timing.time_fn_distinct(fn, tuple(xs), reps=2)
                f.write(f"{2**k},{meas:.6g},{m},{n},{k2:.4g},{tier},"
                        f"{orth:.3e},{resid:.3e},{t:.6e}\n")
                del a, xs
            except Exception as e:
                f.write(f"# error kappa=2^{k}: {exc_note(e)}\n")
            f.flush()
    _swap_csv("ladder.csv")


def bigm3():
    import gc
    import jax
    import jax.numpy as jnp
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import timing, validation

    n = 128

    def row(f, item, m, make_fn, io_dtype, inplace):
        try:
            a = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                                   jnp.float32, -1, 1).astype(io_dtype)
            fn = make_fn()
            if inplace:
                # donated input: time by regenerating per rep
                import time as _time
                q, r = fn(a)  # a consumed
                orth = validation.orthogonality_accurate(q)
                del q, r
                gc.collect()
                best = float("inf")
                for rep in range(3):
                    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                                           jnp.float32, -1,
                                           1).astype(io_dtype)
                    float(jnp.sum(a[..., :1]))
                    t0 = _time.perf_counter()
                    q, r = fn(a)
                    float(jnp.sum(q[..., :1]) + jnp.sum(r[..., :1]))
                    best = min(best, _time.perf_counter() - t0)
                    del q, r
                    gc.collect()
                t = best - 0.030  # one dispatch round trip
            else:
                q, r = fn(a)
                orth = validation.orthogonality_accurate(q)
                del q, r
                gc.collect()
                t, _ = timing.time_fn_amortized_auto(fn, a, reps=3,
                                                     max_loops=8)
                del a
                gc.collect()
            useful = flops_mod.qr_flops(m, n)
            f.write(f"{m},{n},{item},{t:.6e},{useful/t/1e12:.3f},"
                    f"{orth:.3e}\n")
        except Exception as e:
            f.write(f"# error {item} m={m}: {exc_note(e)}\n")
        f.flush()
        gc.collect()

    with open(_tmp_csv("bigm3.csv"), "w") as f:
        f.write("m,n,mode_method,elapsed_time,tflops,orthogonality\n")
        row(f, "bf16x6_cor/cholqr3_fused[compact+inplace]", 1 << 24,
            lambda: (lambda x: cholqr.fastqr_inplace(
                x, "bf16x6_cor", method="cholqr3_fused",
                variant="compact")), jnp.float32, True)
        row(f, "bf16/cholqr1_fused[inplace]", 1 << 25,
            lambda: (lambda x: cholqr.fastqr_inplace(
                x, "bf16", method="cholqr1_fused", variant="compact")),
            jnp.bfloat16, True)
        row(f, "bf16x6_cor/cholqr1_fused", 1 << 23,
            lambda: (lambda x: cholqr.fastqr(
                x, "bf16x6_cor", method="cholqr1_fused")), jnp.float32,
            False)
    _swap_csv("bigm3.csv")


def perfm16():
    """Reference-protocol m envelope: n=16 panels, m = 2^9 .. 2^26 —
    the EXACT axis of mk_performance_graph.py:40-49 / BASELINE.md
    (the reference benchmarks m x 16 panels; at n=16 even m=2^26 f32 is
    4.3 GB and stays HBM-resident, so the whole envelope is measured
    on-chip with no streaming caveat).  Rows: Householder-tree BlockQR
    (reference semantics), fused-production CholQR2, jnp.linalg.qr
    golden.  Appends to data/perf_m16.csv."""
    import gc

    import jax
    import jax.numpy as jnp
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.harness import baseline, flops as flops_mod, speed
    from tsqr_tpu.utils import timing

    import subprocess

    n = 16
    ms = [1 << k for k in range(9, 27)]
    # m*n >= 2^29 elems in one process risks OOM-poisoning the whole
    # section (run_round2_data.py GRID_MAX_ELEMS) -> isolate per row
    big_template = """
import sys, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
from tsqr_tpu.core import cholqr
from tsqr_tpu.harness import flops as flops_mod
m, n = %(m)d, 16
fn = jax.jit(lambda x: cholqr.cholqr2(x, "bf16x6_cor"), donate_argnums=0)
best = float("inf")
for rep in range(3):
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32,
                           -1, 1)
    float(jnp.sum(a[..., :1]))
    t0 = time.perf_counter()
    q, r = fn(a)
    float(jnp.sum(q[..., :1].astype(jnp.float32))
          + jnp.sum(r[..., :1].astype(jnp.float32)))
    best = min(best, time.perf_counter() - t0)
    del q, r
t = best - 0.030
fl = flops_mod.qr_flops(m, n)
print("ROW %%d,16,float32,bf16x6_cor[cholqr2/donated],0,%%.6e,%%.4f,0"
      %% (m, t, fl / t / 1e12), flush=True)
"""
    with open(_tmp_csv("perf_m16.csv"), "w") as f:
        print(speed.CSV_HEADER, file=f, flush=True)
        for m in ms:
            if m * n >= 1 << 29:
                code = big_template % {"root": str(ROOT), "m": m}
                try:
                    res = subprocess.run(
                        [sys.executable, "-u", "-c", code],
                        capture_output=True, text=True, timeout=1800,
                        env=dict(os.environ))
                    rows = [ln[4:] for ln in res.stdout.splitlines()
                            if ln.startswith("ROW ")]
                    if not rows:
                        raise RuntimeError(
                            f"exit={res.returncode} "
                            f"stderr={res.stderr.strip()[-300:]}")
                    print(rows[-1], file=f, flush=True)
                    print(f"perfm16 big m=2^{m.bit_length()-1}: {rows[-1]}",
                          file=sys.stderr, flush=True)
                except Exception as e:
                    print(f"# error big m={m}: " + exc_note(e), file=f,
                          flush=True)
                continue
            if m <= 1 << 24:  # tree A+Q+working set beyond this
                for mode in ("fp32", "bf16x6_cor"):
                    try:
                        row = speed.speed_row(m, n, mode, trials=4,
                                              panel_width=16,
                                              leaf_rows=min(m, 2048))
                        print(speed.format_row(row), file=f, flush=True)
                        print(f"perfm16 tree m=2^{m.bit_length()-1} {mode}: "
                              f"{row['elapsed_time']*1e3:.2f} ms",
                              file=sys.stderr, flush=True)
                    except Exception as e:
                        print(f"# error tree m={m} {mode}: " + exc_note(e),
                              file=f, flush=True)
            try:
                a = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                                       jnp.float32, -1, 1)
                fn = lambda x: cholqr.fastqr(x, "bf16x6_cor",
                                             method="cholqr2")
                t, loops = timing.time_fn_amortized_auto(fn, a, reps=3)
                fl = flops_mod.qr_flops(m, n)
                print(f"{m},{n},float32,bf16x6_cor[cholqr2],0,"
                      f"{t:.6e},{fl/t/1e12:.4f},0", file=f, flush=True)
                print(f"perfm16 cholqr2 m=2^{m.bit_length()-1}: "
                      f"{t*1e3:.3f} ms", file=sys.stderr, flush=True)
                del a
            except Exception as e:
                print(f"# error cholqr2 m={m}: " + exc_note(e), file=f,
                      flush=True)
            try:
                row = baseline.baseline_speed_row(m, n, trials=2)
                print(speed.format_row(row), file=f, flush=True)
            except Exception as e:
                print(f"# error golden m={m}: " + exc_note(e), file=f,
                      flush=True)
            gc.collect()
    _swap_csv("perf_m16.csv")


SECTIONS = {"cond16": cond16, "mfu": mfu, "robust": robust,
            "ladder": ladder, "bigm3": bigm3, "perfm16": perfm16}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which not in SECTIONS:
        print(f"usage: {sys.argv[0]} {{{','.join(SECTIONS)}}}",
              file=sys.stderr)
        sys.exit(2)
    from tsqr_tpu.utils import status
    status.print_banner(file=sys.stderr)
    SECTIONS[which]()
