#!/usr/bin/env python
"""Round-2 measured-data campaign on the real TPU chip.

Each section is independently runnable/restartable (the tunnel wedges
occasionally); CSV rows flush as they land (≙ the reference harness's
crash-resume behavior, test.cu:228).

Sections:
  wide_acc        accuracy over the reference wide-n grid
                  m=2^10..2^15 x n=2^10..2^m (≙ main.cu:96-100)
  wide_acc_reorth same, reorthogonalized
  wide_speed      speed over the same grid + jnp.linalg.qr golden rows
  bigm            m=2^23 (corrected, fp32 IO) and m=2^24 (bf16 IO) rows
  mfu             the MFU table (harness/mfu.py)
  cond            full reference cond config m=2^15 n=2^7 kappa=2^2..2^15
                  incl. golden rows (≙ main.cu:104-112)
  exponent        per-tree-level exponent histograms, bf16 vs fp16-range
                  clamp (≙ EVALUATE_EXPONENT_DISTRIBUTION, tsqr.cu:26)

Run: python scripts/run_round2_data.py <section>
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from tsqr_tpu.utils.status import exc_note  # noqa: E402

DATA = ROOT / "data"
DATA.mkdir(exist_ok=True)

MODES = ["fp32", "bf16_nocor", "bf16x3_cor", "bf16x6_cor"]
WIDE_MS = [1 << k for k in range(10, 16)]
WIDE_NS = [1 << k for k in range(10, 16)]
KW = dict(panel_width=128, leaf_rows=2048)


def _trials(m, n):
    mn = m * n
    if mn <= 1 << 24:
        return 16  # reference C (test.cu C=16)
    if mn <= 1 << 27:
        return 8
    return 4


# Largest grid config that fits the 15.75 GB chip: A + Q + R + tree
# working ~ 4*(2mn + 2n^2 + mn) bytes; m*n = 2^30 (m=n=2^15 fp32) OOMed
# AND poisoned the backend — every subsequent allocation in the process
# failed RESOURCE_EXHAUSTED (measured, round-2 campaign).  2^29 ran fine.
GRID_MAX_ELEMS = 1 << 29
GOLDEN_MAX_ELEMS = 1 << 28  # jnp.linalg.qr's working set is larger


def _bailout(e, state):
    """Two consecutive RESOURCE_EXHAUSTED errors => the process is
    poisoned (see above); abort the section so the next one starts in a
    fresh backend."""
    if "RESOURCE_EXHAUSTED" in str(e):
        state["re"] = state.get("re", 0) + 1
        if state["re"] >= 2:
            print("bailing out: backend poisoned by repeated "
                  "RESOURCE_EXHAUSTED", file=sys.stderr, flush=True)
            return True
    else:
        state["re"] = 0
    return False


def wide_acc(reorth=False):
    from tsqr_tpu.harness import accuracy

    name = "accuracy_wide_reorth.csv" if reorth else "accuracy_wide.csv"
    # reorth rows: representative subset (the cond sweep measures reorth
    # exhaustively at the reference's own reorth config; here the point
    # is the CGS2 effect across the wide grid, not a second full grid)
    modes_ = ["fp32", "bf16x6_cor"] if reorth else MODES
    ns_ = [1 << 10, 1 << 12, 1 << 14] if reorth else WIDE_NS
    state = {}
    with open(DATA / name, "w") as f:
        print(accuracy.CSV_HEADER, file=f, flush=True)
        for mode in modes_:
            for m in WIDE_MS:
                for n in ns_:
                    if n > m or m * n > GRID_MAX_ELEMS:
                        continue
                    try:
                        # device metrics: the tunnel moves ~26 MB/s, so
                        # host-fp64 metrics cost minutes per config at
                        # wide n; the on-device Kahan metrics are
                        # calibrated against host fp64 (validation.py)
                        row = accuracy.accuracy_row(
                            m, n, mode, reorth=reorth,
                            trials=_trials(m, n), metrics="device", **KW)
                    except Exception as e:
                        print(f"# error m={m} n={n} mode={mode}: " + exc_note(e),
                              file=f, flush=True)
                        if _bailout(e, state):
                            return
                        continue
                    state["re"] = 0
                    print(accuracy.format_row(row), file=f, flush=True)
                    print(f"acc m={m} n={n} {mode} reorth={reorth}: "
                          f"res={row['residual']:.2e} "
                          f"orth={row['orthogonality']:.2e}",
                          file=sys.stderr, flush=True)


def wide_speed():
    from tsqr_tpu.harness import baseline, speed

    state = {}
    with open(DATA / "speed_wide.csv", "w") as f:
        print(speed.CSV_HEADER, file=f, flush=True)
        for mode in MODES:
            for m in WIDE_MS:
                for n in WIDE_NS:
                    if n > m or m * n > GRID_MAX_ELEMS:
                        continue
                    try:
                        row = speed.speed_row(m, n, mode, trials=4, **KW)
                    except Exception as e:
                        print(f"# error m={m} n={n} mode={mode}: " + exc_note(e),
                              file=f, flush=True)
                        if _bailout(e, state):
                            return
                        continue
                    state["re"] = 0
                    print(speed.format_row(row), file=f, flush=True)
                    print(f"speed m={m} n={n} {mode}: "
                          f"{row['elapsed_time']*1e3:.1f} ms "
                          f"{row['tflops']:.2f} TF", file=sys.stderr,
                          flush=True)
        # golden rows (≙ cusolver_speed, test.cu:497-593)
        for m in WIDE_MS:
            for n in WIDE_NS:
                if n > m or m * n > GOLDEN_MAX_ELEMS:
                    continue
                try:
                    row = baseline.baseline_speed_row(m, n, trials=2)
                except Exception as e:
                    print(f"# error golden m={m} n={n}: " + exc_note(e),
                          file=f, flush=True)
                    if _bailout(e, state):
                        return
                    continue
                state["re"] = 0
                print(speed.format_row(row), file=f, flush=True)
                print(f"golden m={m} n={n}: "
                      f"{row['elapsed_time']*1e3:.1f} ms", file=sys.stderr,
                      flush=True)


def wide_speed_prod():
    """The production-path wide grid: BlockQR with fused-CholQR panels
    (panel_width=1024) in the corrected mode — the configuration a TPU
    user would actually deploy at wide n, vs the reference-semantics
    tree-panel rows of wide_speed.  compute_mode is labeled with the
    panel method so the rows coexist in one CSV."""
    from tsqr_tpu.harness import speed

    state = {}
    with open(DATA / "speed_wide_prod.csv", "w") as f:
        print(speed.CSV_HEADER, file=f, flush=True)
        for mode in ("bf16x6_cor", "bf16x3_cor"):
            for m in WIDE_MS:
                for n in WIDE_NS:
                    if n > m or m * n > GRID_MAX_ELEMS:
                        continue
                    try:
                        row = speed.speed_row(m, n, mode, trials=4,
                                              panel_width=1024,
                                              panel_method="cholqr2_fused",
                                              leaf_rows=2048)
                    except Exception as e:
                        print(f"# error m={m} n={n} mode={mode}: "
                              + exc_note(e), file=f, flush=True)
                        if _bailout(e, state):
                            return
                        continue
                    state["re"] = 0
                    row["compute_mode"] += "[cholqr2_fused/pw1024]"
                    print(speed.format_row(row), file=f, flush=True)
                    print(f"prod m={m} n={n} {mode}: "
                          f"{row['elapsed_time']*1e3:.1f} ms "
                          f"{row['tflops']:.2f} TF", file=sys.stderr,
                          flush=True)


def bigm():
    """The m >= 2^23 rows (BASELINE target shape M=2^24 x N=128)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import timing, validation

    n = 128
    rows = []

    def gen(m, dtype):
        # quarter-wise generation bounds the u32-bits transient
        parts = []
        for i in range(4):
            k = jax.random.PRNGKey(1000 + i)
            parts.append(jax.random.uniform(
                k, (m // 4, n), jnp.float32, -1, 1).astype(dtype))
        return jnp.concatenate(parts, axis=0)

    with open(DATA / "bigm.csv", "w") as f:
        print("m,n,compute_mode,method,elapsed_time,tflops,orthogonality,"
              "residual", file=f, flush=True)
        configs = [
            # "compact" never materializes Q1: peak A+Q = 8.6 GB at 2^23 f32
            (1 << 23, "bf16x6_cor", "cholqr2_fused", "compact", jnp.float32),
            (1 << 24, "bf16", "cholqr1_fused", "safe", jnp.bfloat16),
            (1 << 24, "bf16", "cholqr2_fused", "safe", jnp.bfloat16),
        ]
        for m, mode, method, variant, dtype in configs:
            try:
                a = gen(m, dtype)

                def fn(x):
                    return cholqr.fastqr(x, mode, method=method,
                                         variant=variant)

                q, r = jax.jit(fn)(a)
                orth = float(validation.orthogonality_accurate(q))
                res = float(validation.residual_device_chunked(a, q, r))
                del q, r
                t = timing.time_fn_amortized(fn, a, loops=4, reps=3)
                fl = flops_mod.qr_flops(m, n)
                row = (f"{m},{n},{mode},{method}[{variant}],{t:.6e},"
                       f"{fl/t/1e12:.3f},{orth:.3e},{res:.3e}")
                print(row, file=f, flush=True)
                print("bigm: " + row, file=sys.stderr, flush=True)
                del a
                import gc
                gc.collect()
            except Exception as e:
                print(f"# error m={m} {mode}/{method}: " + exc_note(e), file=f,
                      flush=True)


def bigm2():
    """Capacity shapes unlocked by the in-place (aliased) pipelines:
    Q overwrites A's donated buffer, so peak HBM is ~A alone.

    * m=2^24 x 128 f32 IO, bf16x6_cor turbo — the BASELINE.json target
      shape at fp32-grade orthogonality (A+Q = 17 GB would not fit; A
      alone = 8.6 GB does).
    * m=2^25 x 128 bf16 — one power of two past round-2's bigm.csv,
      approaching the reference's m=2^26 axis (mk_performance_graph.py).
    """
    import time

    import jax
    import jax.numpy as jnp
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import validation

    n = 128
    SEED = 1234

    def part_key(i):
        return jax.random.fold_in(jax.random.PRNGKey(SEED), i)

    def gen_inplace(m, dtype, n_parts):
        """Build A in its final buffer via in-place DUS on a fori_loop
        carry — never holds a second m x n transient."""
        part = m // n_parts

        @jax.jit
        def g():
            def body(i, buf):
                x = jax.random.uniform(part_key(i), (part, n),
                                       jnp.float32, -1, 1)
                return jax.lax.dynamic_update_slice(
                    buf, x.astype(dtype), (i * part, 0))
            return jax.lax.fori_loop(0, n_parts, body,
                                     jnp.zeros((m, n), dtype))
        return g()

    def time_inplace(fn, q0, loops=4, reps=3):
        """Each donated call consumes the previous call's Q (same shape/
        dtype as A): buffers recycle, dispatches pipeline."""
        q, best = q0, float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(loops):
                q, _ = fn(q)
            float(jnp.sum(q[:1, :1]))  # force the queued chain
            best = min(best, (time.perf_counter() - t0) / loops)
        return best

    configs = [
        (1 << 24, "bf16x6_cor", "cholqr2_fused", "turbo", jnp.float32, 8),
        (1 << 25, "bf16", "cholqr1_fused", "safe", jnp.bfloat16, 16),
    ]
    state = {}
    with open(DATA / "bigm2.csv", "w") as f:
        print("m,n,compute_mode,method,elapsed_time,tflops,orthogonality,"
              "residual", file=f, flush=True)
        for m, mode, method, variant, dtype, n_parts in configs:
            try:
                a = gen_inplace(m, dtype, n_parts)
                fn = lambda x, mo=mode, me=method, v=variant: \
                    cholqr.fastqr_inplace(x, mo, method=me, variant=v)
                q, r = fn(a)
                del a  # donated — already invalid
                orth = float(validation.orthogonality_accurate(q))
                part = m // n_parts

                def gen_chunk(i, dt=dtype):
                    x = jax.random.uniform(part_key(i), (part, n),
                                           jnp.float32, -1, 1)
                    return x.astype(dt)

                res = float(validation.residual_regen_chunked(
                    gen_chunk, q, r, part))
                t = time_inplace(fn, q)
                fl = flops_mod.qr_flops(m, n)
                row = (f"{m},{n},{mode},{method}[{variant}/inplace],"
                       f"{t:.6e},{fl/t/1e12:.3f},{orth:.3e},{res:.3e}")
                print(row, file=f, flush=True)
                print("bigm2: " + row, file=sys.stderr, flush=True)
                del q, r
                import gc
                gc.collect()
            except Exception as e:
                print(f"# error m={m} {mode}/{method}: " + exc_note(e),
                      file=f, flush=True)
                print("bigm2 error: " + exc_note(e), file=sys.stderr,
                      flush=True)
                if _bailout(e, state):
                    return
                continue
            state["re"] = 0


def mfu():
    from tsqr_tpu.harness import mfu as mfu_mod

    with open(DATA / "mfu.csv", "w") as f:
        mfu_mod.sweep(out=f)


def cond():
    from tsqr_tpu.harness import cond as cond_mod

    with open(DATA / "cond.csv", "w") as f:
        cond_mod.sweep(1 << 15, 1 << 7, [2.0 ** k for k in range(2, 16)],
                       MODES + ["golden"], reorths=(False, True),
                       trials=4, out=f, **KW)


def exponent():
    """Per-tree-level exponent histograms: pristine bf16 pipeline vs
    fp16-exponent-range clamped inputs (the reference's underflow study,
    validation.cu:214-237 + scripts/exponent_distribution/mk_graph.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsqr_tpu.core import tsqr as tsqr_mod
    from tsqr_tpu.utils import experimental, validation

    m, n = 1 << 18, 128
    # small-magnitude data exercises the underflow region like the
    # reference study (inputs scaled so fp16's 2^-14 floor bites)
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32,
                           -1, 1) * 1e-4

    with open(DATA / "exponent.csv", "w") as f:
        print("variant,level,exponent,count", file=f, flush=True)
        for variant, x in (("bf16", a),
                           ("fp16_range",
                            experimental.clamp_exponent_range(a, -14, 15))):
            q, r, level_qs = tsqr_mod.tsqr(x, "bf16", leaf_rows=2048,
                                           collect_level_q=True)
            for lvl, lq in enumerate(level_qs):
                hist = validation.exponent_distribution(np.asarray(lq))
                for e, c in sorted(hist.items()):
                    print(f"{variant},{lvl},{e},{c}", file=f, flush=True)
            orth = validation.orthogonality(np.asarray(q, np.float64))
            print(f"# {variant}: orthogonality={orth:.3e}", file=f,
                  flush=True)
            print(f"exponent[{variant}]: orth={orth:.3e}", file=sys.stderr,
                  flush=True)


def perf_m():
    """Time/TFLOPS vs m at n=128, m=2^10..2^23 — the reference performance
    plot's m axis (mk_performance_graph.py:40-49, m up to 2^26 there;
    2^23 is this chip's fp32 A+Q HBM limit for the tree path).  Rows for
    the Householder-tree BlockQR (reference semantics), the fused CholQR
    production path, and the jnp.linalg.qr golden."""
    import jax
    import jax.numpy as jnp
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.harness import baseline, flops as flops_mod, speed
    from tsqr_tpu.utils import timing

    n = 128
    ms = [1 << k for k in range(10, 24)]
    with open(DATA / "perf_m.csv", "w") as f:
        print(speed.CSV_HEADER, file=f, flush=True)
        for m in ms:
            for mode, label_kw in (("fp32", {}), ("bf16x6_cor", {})):
                if m > 1 << 22:
                    continue  # tree working set (A+Q+q0) OOMs at 2^23 f32
                try:
                    row = speed.speed_row(m, n, mode, trials=4, **KW)
                except Exception as e:
                    print(f"# error tree m={m} {mode}: " + exc_note(e),
                          file=f, flush=True)
                    continue
                print(speed.format_row(row), file=f, flush=True)
                print(f"perf_m tree m=2^{m.bit_length()-1} {mode}: "
                      f"{row['elapsed_time']*1e3:.2f} ms "
                      f"{row['tflops']:.2f} TF", file=sys.stderr, flush=True)
            # fused CholQR production path (method flops ≠ useful; the CSV
            # tflops column stays the reference's useful-flop model)
            try:
                a = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                                       jnp.float32, -1, 1)
                t = timing.time_fn_amortized(
                    lambda x: cholqr.fastqr(x, "bf16x6_cor",
                                            method="cholqr2_fused",
                                            variant="turbo"),
                    a, loops=6, reps=3)
                fl = flops_mod.qr_flops(m, n)
                print(f"{m},{n},float32,bf16x6_cor[cholqr2_fused/turbo],0,"
                      f"{t:.6e},{fl/t/1e12:.4f},0", file=f, flush=True)
                print(f"perf_m fused m=2^{m.bit_length()-1}: {t*1e3:.2f} ms "
                      f"{fl/t/1e12:.2f} TF", file=sys.stderr, flush=True)
                del a
            except Exception as e:
                print(f"# error fused m={m}: " + exc_note(e), file=f,
                      flush=True)
            if m <= 1 << 22:  # jnp.linalg.qr working set ~3x A: OOM above
                try:
                    row = baseline.baseline_speed_row(m, n, trials=2)
                    print(speed.format_row(row), file=f, flush=True)
                    print(f"perf_m golden m=2^{m.bit_length()-1}: "
                          f"{row['elapsed_time']*1e3:.2f} ms",
                          file=sys.stderr, flush=True)
                except Exception as e:
                    print(f"# error golden m={m}: " + exc_note(e), file=f,
                          flush=True)
            import gc
            gc.collect()


def extras():
    """Round-2 odds and ends: the turbo-headline timing and the qr_auto
    fallback cost on a matrix that actually triggers the fallback
    (round-1 review weak items 1 and 6)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsqr_tpu.core import auto, cholqr
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import latms, timing, validation

    m, n = 1 << 22, 128
    with open(DATA / "extras.csv", "w") as f:
        print("item,m,n,elapsed_time,tflops,orthogonality,note", file=f,
              flush=True)
        # turbo vs fastest at the headline shape
        a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32,
                               -1, 1)
        # cholqr1_fused/x6 = 3 HBM passes + 10 MXU passes: orthogonality
        # floor ~ kappa^2 * eps_f32, valid for this workload's kappa ~ 2
        for method, variant in (("cholqr2_fused", "fastest"),
                                ("cholqr2_fused", "turbo"),
                                ("cholqr1_fused", "safe")):
            tag = variant if method == "cholqr2_fused" else "cholqr1x6"
            try:
                q, _ = jax.jit(lambda x, me=method, v=variant: cholqr.fastqr(
                    x, "bf16x6_cor", method=me, variant=v))(a)
                orth = float(validation.orthogonality_accurate(q))
                del q
                t = timing.time_fn_amortized(
                    lambda x, me=method, v=variant: cholqr.fastqr(
                        x, "bf16x6_cor", method=me, variant=v),
                    a, loops=8, reps=3)
                fl = flops_mod.qr_flops(m, n)
                print(f"headline_{tag},{m},{n},{t:.6e},"
                      f"{fl/t/1e12:.3f},{orth:.3e},", file=f, flush=True)
                print(f"extras {tag}: {t*1e3:.2f} ms "
                      f"{fl/t/1e12:.2f} TF orth={orth:.2e}",
                      file=sys.stderr, flush=True)
            except Exception as e:
                print(f"# error {tag}: " + exc_note(e), file=f,
                      flush=True)
        del a
        import gc
        gc.collect()
        # streaming-chunk sweep: does a larger (chunk, n) window move the
        # corrected Gram closer to the chip's bandwidth at n=128?
        try:
            from tsqr_tpu.ops import pallas_gram
            a_c = jax.random.uniform(jax.random.PRNGKey(2), (1 << 22, 128),
                                     jnp.float32, -1, 1)
            for chunk in (512, 1024, 2048, 4096, 8192):
                t = timing.time_fn_amortized(
                    lambda x, c=chunk: pallas_gram.gram_pallas(
                        x, "bf16x6_cor", chunk=c), a_c, loops=8, reps=3)
                bw = (1 << 22) * 128 * 4 / t / 1e9
                print(f"gram_chunk{chunk},{1 << 22},128,{t:.6e},,,"
                      f"{bw:.1f}GB/s", file=f, flush=True)
                print(f"extras gram chunk={chunk}: {t*1e3:.2f} ms "
                      f"{bw:.0f} GB/s", file=sys.stderr, flush=True)
            del a_c
            gc.collect()
        except Exception as e:
            print("# error gram_chunk: " + exc_note(e), file=f, flush=True)
        # wide-n production path: BlockQR with fused-CholQR panels vs the
        # reference-semantics Householder-tree panels
        try:
            from tsqr_tpu.harness import speed as speed_mod
            mw, nw = 1 << 17, 4096
            for pm, pw in (("tsqr", 128), ("cholqr2_fused", 1024)):
                row = speed_mod.speed_row(mw, nw, "bf16x6_cor", trials=3,
                                          panel_width=pw, panel_method=pm)
                print(f"blockqr_wide[{pm}/pw{pw}],{mw},{nw},"
                      f"{row['elapsed_time']:.6e},{row['tflops']:.3f},,",
                      file=f, flush=True)
                print(f"extras blockqr_wide[{pm}]: "
                      f"{row['elapsed_time']*1e3:.1f} ms "
                      f"{row['tflops']:.2f} TF", file=sys.stderr, flush=True)
        except Exception as e:
            print("# error blockqr_wide: " + exc_note(e), file=f, flush=True)
        # Householder tree with the sublane kernel vs vmapped XLA leaves
        # (round-1 review item 3: robust path within ~25 ms at 2^20 x 128)
        try:
            from tsqr_tpu.core import tsqr as tsqr_mod
            mt, nt = 1 << 20, 128
            at = jax.random.uniform(jax.random.PRNGKey(1), (mt, nt),
                                    jnp.float32, -1, 1)
            for impl in ("jnp", "pallas_sb"):
                t = timing.time_fn_amortized(
                    lambda x, i=impl: tsqr_mod.tsqr(x, "fp32", impl=i),
                    at, loops=6, reps=3)
                fl = flops_mod.qr_flops(mt, nt)
                print(f"tree_{impl},{mt},{nt},{t:.6e},{fl/t/1e12:.3f},,",
                      file=f, flush=True)
                print(f"extras tree[{impl}]: {t*1e3:.2f} ms",
                      file=sys.stderr, flush=True)
            from tsqr_tpu.harness import profile
            res = profile.tsqr_phase_split(mt, nt, "fp32", out=sys.stderr,
                                           impl="pallas_sb")
            print(f"tree_phase_split_r_pct,{mt},{nt},"
                  f"{res['compute_r_s']:.6e},,,q_pct={res['q_pct']:.1f}",
                  file=f, flush=True)
            del at
            gc.collect()
        except Exception as e:
            print("# error tree timing: " + exc_note(e), file=f, flush=True)
        # qr_auto fallback cost: kappa ~ 3e7 defeats shifted CholeskyQR3
        try:
            ma, na = 1 << 20, 128
            a_bad, kappa = latms.rand_matrix_with_cond(
                jax.random.PRNGKey(7), ma, na, 3.0e7)
            t0 = time.perf_counter()
            q, r, used = auto.qr_auto(a_bad, "fp32", leaf_rows=2048)
            orth = float(validation.orthogonality_accurate(q))
            t_wall = time.perf_counter() - t0
            fl = flops_mod.qr_flops(ma, na)
            print(f"auto_fallback[{used}],{ma},{na},{t_wall:.6e},"
                  f"{fl/t_wall/1e12:.3f},{orth:.3e},kappa={kappa:.2e}",
                  file=f, flush=True)
            print(f"extras auto fallback: used={used} wall={t_wall:.2f} s "
                  f"orth={orth:.2e} kappa={kappa:.2e}", file=sys.stderr,
                  flush=True)
        except Exception as e:
            print("# error auto_fallback: " + exc_note(e), file=f,
                  flush=True)


SECTIONS = {"wide_acc": lambda: wide_acc(False),
            "wide_acc_reorth": lambda: wide_acc(True),
            "wide_speed": wide_speed, "wide_speed_prod": wide_speed_prod,
            "bigm": bigm, "bigm2": bigm2, "mfu": mfu,
            "cond": cond, "exponent": exponent, "perf_m": perf_m,
            "extras": extras}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which not in SECTIONS:
        print(f"usage: {sys.argv[0]} {{{','.join(SECTIONS)}}}",
              file=sys.stderr)
        sys.exit(2)
    from tsqr_tpu.utils import status
    status.print_banner(file=sys.stderr)
    SECTIONS[which]()
