"""Sweep driver ≙ reference src/main.cu: runs the accuracy grid, the
cond sweep and (optionally) the speed sweep, printing a provenance banner
first (≙ runtime_status banners, main.cu:90-93).

Usage:
  python -m tsqr_tpu.harness.main accuracy [--quick]
  python -m tsqr_tpu.harness.main speed [--quick]
  python -m tsqr_tpu.harness.main cond [--quick]
  python -m tsqr_tpu.harness.main mfu [--quick]
  python -m tsqr_tpu.harness.main profile [--quick]
"""

from __future__ import annotations

import argparse
import sys

from tsqr_tpu.utils import status

# reference sweep: m = 2^10..2^15, n = 2^10..min(2^m-ish) (main.cu:95-102);
# cond sweep m=2^15 n=2^7 kappa=2^2..2^15 (main.cu:104-112)
FULL_MS = [1 << k for k in range(10, 16)]
FULL_NS = [1 << k for k in range(4, 11)]
MODES = ["fp32", "bf16_nocor", "bf16x3_nocor", "bf16x3_cor", "bf16x6_cor"]
QUICK_MS = [1 << 12]
QUICK_NS = [16, 128]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["accuracy", "speed", "cond", "eval_q",
                                     "baseline", "mfu", "profile",
                                     "ladder"])
    p.add_argument("--quick", action="store_true")
    p.add_argument("--modes", nargs="*", default=MODES)
    p.add_argument("--trials", type=int, default=None)
    args = p.parse_args(argv)

    status.print_banner(file=sys.stderr)
    ms = QUICK_MS if args.quick else FULL_MS
    ns = QUICK_NS if args.quick else FULL_NS

    if args.which == "accuracy":
        from tsqr_tpu.harness import accuracy
        accuracy.sweep(ms, ns, args.modes,
                       trials=args.trials or (4 if args.quick else 16))
    elif args.which == "speed":
        from tsqr_tpu.harness import speed
        speed.sweep(ms, ns, args.modes)
    elif args.which == "eval_q":
        from tsqr_tpu.harness import eval_q
        eval_q.sweep(ms, ns[-1], args.modes)
    elif args.which == "baseline":
        from tsqr_tpu.harness import baseline
        baseline.accuracy_sweep(ms, ns,
                                trials=args.trials or (4 if args.quick
                                                       else 16))
        baseline.speed_sweep(ms, ns, out=sys.stderr)
    elif args.which == "mfu":
        from tsqr_tpu.harness import mfu
        mfu.sweep(m=(1 << 16 if args.quick else 1 << 20),
                  ns=((128,) if args.quick else (128, 256, 512, 1024, 2048)))
    elif args.which == "ladder":
        # reproduce the bench.py headline config interactively: the
        # predictive 4-tier ladder at a given conditioning regime
        import jax
        import jax.numpy as jnp
        import numpy as np
        from tsqr_tpu.core import auto
        from tsqr_tpu.utils import latms, validation
        on_tpu = jax.devices()[0].platform == "tpu"
        m, n = ((1 << 14, 64) if args.quick else (1 << 20, 128))
        for kappa in (1.0, 1e4, 1e7):
            if kappa == 1.0:
                a = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                                       jnp.float32, -1, 1)
            else:
                a, _ = latms.rand_matrix_with_cond(
                    jax.random.PRNGKey(int(kappa)), m, n, kappa)
            q, r, info = auto.qr_auto_fused(
                a, "bf16x6_cor",
                fast_method="cholqr1_fused" if on_tpu else "cholqr1",
                mid_method="cholqr3_fused" if on_tpu else "cholqr3",
                mid_variant="compact" if on_tpu else "safe",
                return_info=True)
            orth = validation.orthogonality_accurate(q)
            resid = float(validation.residual_device_chunked(a, q, r))
            tier = {1: "fast", 2: "robust", 3: "iter", 4: "householder"}[
                int(info["tier"][0, 0])]
            print(f"kappa={kappa:8.1e}  tier={tier:<11s}  "
                  f"kappa2_est={float(info['kappa2_est'][0, 0]):.3g}  "
                  f"orthogonality={orth:.3e}  residual={resid:.3e}",
                  flush=True)
            del a, q, r
    elif args.which == "profile":
        # ≙ MEASURE_QR_TIME + PROFILE_BREAKDOWN, printed for the default
        # headline-class shape
        from tsqr_tpu.harness import profile
        m = 1 << (14 if args.quick else 20)
        profile.tsqr_phase_split(m, 128, "fp32", out=sys.stdout)
        profile.blockqr_breakdown(m, 512, "fp32", out=sys.stdout)
    else:
        from tsqr_tpu.harness import cond
        conds = ([2.0 ** k for k in (2, 8)] if args.quick
                 else [2.0 ** k for k in range(2, 16)])
        m, n = ((1 << 12, 64) if args.quick else (1 << 15, 1 << 7))
        cond.sweep(m, n, conds, args.modes,
                   trials=args.trials or (2 if args.quick else 4))


if __name__ == "__main__":
    main()
