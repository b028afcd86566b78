#!/usr/bin/env python
"""Headline benchmark: error-corrected tall-skinny QR on one TPU chip.

Prints ONE JSON line:
  {"metric": "tsqr_bf16x6_cor_tflops", "value": <TFLOP/s>, "unit": "TFLOP/s",
   "vs_baseline": <speedup over jnp.linalg.qr on the same chip>}

Config: M=2^22 (falls back to 2^21 if the chip's HBM is contended),
N=128 (BASELINE.md target shape), bf16x6_cor — the reference's headline
fp32_tc_cor accuracy class — via the MXU-native corrected CholeskyQR3 fast
path (core/cholqr.py).  Accuracy is asserted (fp32-grade orthogonality),
not just timed.  Timing amortizes the ~30 ms tunnel dispatch latency by
chaining iterations inside one jit (utils/timing.py:time_fn_amortized).
"""

import gc
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def run(m: int, n: int) -> dict:
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import timing

    mode = "bf16x6_cor"
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)

    # Single-pass corrected CholeskyQR is the right method for this
    # well-conditioned workload: its orthogonality floor is
    # kappa^2 * eps_f32 — for uniform random A (kappa ~ 2) that is
    # fp32-grade, and MEASURED 1.49e-7 at 2^22 x 128 (data/extras.csv
    # headline_cholqr1x6) — at 3 HBM passes instead of cholqr2_fused's 4
    # (25.4 vs 13.6 TFLOP/s).  The orthogonality gate below zeroes the
    # metric if the method ever misses fp32 grade; cholqr3 [safe] is the
    # robust production default for unknown conditioning.
    if jax.devices()[0].platform == "tpu":
        method, variant = "cholqr1_fused", "safe"
    else:
        method, variant = "cholqr2", "safe"

    def qr_fn(x):
        return cholqr.fastqr(x, mode, method=method, variant=variant)

    # accuracy gate first (fp32-grade orthogonality required).  Measured
    # with the Kahan-compensated streaming Gram (a naive fp32 device Gram
    # adds ~sqrt(m)*eps of measurement error — 3e-4 at m=2^22).
    from tsqr_tpu.utils import validation
    q, r = jax.jit(qr_fn)(a)
    orth = validation.orthogonality_accurate(q)
    acc_ok = bool(np.isfinite(orth) and orth < 1e-5)
    del q, r
    gc.collect()
    print(f"bench: m=2^{m.bit_length()-1} n={n} orth={orth:.2e}",
          file=sys.stderr, flush=True)

    t = timing.time_fn_amortized(qr_fn, a, loops=8, reps=3)
    fl = flops_mod.qr_flops(m, n)  # useful QR flops, not method flops
    tflops = fl / t / 1e12
    print(f"bench: ours t={t*1e3:.2f} ms tflops={tflops:.2f}",
          file=sys.stderr, flush=True)
    gc.collect()

    t_base = timing.time_fn_amortized(jnp.linalg.qr, a, loops=2, reps=2)
    print(f"bench: jnp.linalg.qr t={t_base*1e3:.2f} ms", file=sys.stderr,
          flush=True)

    return {
        "metric": "tsqr_bf16x6_cor_tflops",
        "value": round(tflops, 3) if acc_ok else 0.0,
        "unit": "TFLOP/s",
        "vs_baseline": round(t_base / t, 3),
    }


def main():
    result = None
    last_err = None
    for m in (1 << 22, 1 << 21, 1 << 20):
        try:
            result = run(m, 128)
            break
        except Exception as e:
            last_err = e
            print(f"bench: m={m} failed ({type(e).__name__}: "
                  f"{str(e)[:160]}); retrying smaller", file=sys.stderr,
                  flush=True)
            gc.collect()
    if result is None:
        print("bench: every fallback size failed", file=sys.stderr,
              flush=True)
        raise last_err
    print(json.dumps(result))


if __name__ == "__main__":
    main()
