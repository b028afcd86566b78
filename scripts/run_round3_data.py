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


def cond16():
    from tsqr_tpu.harness import cond as cond_mod

    with open(DATA / "cond.csv", "w") as f:
        cond_mod.sweep(1 << 15, 1 << 7, [2.0 ** k for k in range(2, 16)],
                       MODES + ["golden"], reorths=(False, True),
                       trials=16, out=f, **KW)


def mfu():
    from tsqr_tpu.harness import mfu as mfu_mod

    with open(DATA / "mfu.csv", "w") as f:
        mfu_mod.sweep(out=f)


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

    def row(f, item, fn):
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

    with open(DATA / "robust.csv", "w") as f:
        f.write("item,m,n,elapsed_time,useful_tflops,orthogonality,note\n")
        row(f, "cholqr1_fused[x6]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr1_fused"))
        row(f, "cholqr2_fused[x6/fast]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr2_fused", variant="fast"))
        row(f, "cholqr3_fused[x6/safe]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr3_fused"))
        row(f, "cholqr3_fused[x6/compact]", lambda x: cholqr.fastqr(
            x, "bf16x6_cor", method="cholqr3_fused", variant="compact"))
        # the gate alone: fast tier + in-program orthogonality check
        row(f, "ladder2[fast+gate+compact]", lambda x: auto.qr_auto_fused(
            x, "bf16x6_cor", fast_method="cholqr1_fused",
            mid_method="cholqr3_fused", mid_variant="compact",
            leaf_rows=8192))


def ladder():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsqr_tpu.core import auto, cholqr
    from tsqr_tpu.utils import latms, timing, validation

    m, n = 1 << 20, 128

    def fn(x):
        return auto.qr_auto_fused(x, "bf16x6_cor",
                                  fast_method="cholqr1_fused",
                                  mid_method="cholqr3_fused",
                                  mid_variant="compact", leaf_rows=8192)

    with open(DATA / "ladder.csv", "w") as f:
        f.write("kappa_target,kappa_measured,m,n,tier,orthogonality,"
                "residual,elapsed_time\n")
        for k in range(0, 16, 2):
            try:
                key = jax.random.PRNGKey(100 + k)
                a, meas = latms.rand_matrix_with_cond(key, m, n,
                                                      float(2 ** k))
                q, r = jax.jit(fn)(a)
                orth = validation.orthogonality_accurate(q)
                resid = float(validation.residual_device_chunked(a, q, r))
                # infer the tier from the per-method gates
                q1, _ = jax.jit(lambda x: cholqr.fastqr(
                    x, "bf16x6_cor", method="cholqr1_fused"))(a)
                o1 = validation.orthogonality_accurate(q1)
                del q1
                tier = ("fast" if np.isfinite(o1) and o1 < 1e-5
                        else "mid_or_hh")
                t, _ = timing.time_fn_amortized_auto(fn, a, reps=2)
                f.write(f"{2**k},{meas:.6g},{m},{n},{tier},{orth:.3e},"
                        f"{resid:.3e},{t:.6e}\n")
                del a, q, r
            except Exception as e:
                f.write(f"# error kappa=2^{k}: {exc_note(e)}\n")
            f.flush()


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

    with open(DATA / "bigm3.csv", "w") as f:
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


SECTIONS = {"cond16": cond16, "mfu": mfu, "robust": robust,
            "ladder": ladder, "bigm3": bigm3}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which not in SECTIONS:
        print(f"usage: {sys.argv[0]} {{{','.join(SECTIONS)}}}",
              file=sys.stderr)
        sys.exit(2)
    from tsqr_tpu.utils import status
    status.print_banner(file=sys.stderr)
    SECTIONS[which]()
