#!/usr/bin/env python
"""Headline benchmark: self-validating error-corrected tall-skinny QR.

Prints ONE JSON line:
  {"metric": "qr_auto_bf16x6_cor_tflops", "value": <TFLOP/s>,
   "unit": "TFLOP/s", "vs_baseline": <speedup over jnp.linalg.qr>}

Config: M=2^22 (falls back to 2^21/2^20 if the chip's HBM is contended),
N=128 (BASELINE.md target shape), bf16x6_cor — the reference's headline
fp32_tc_cor accuracy class.

The measured program is the 3-tier self-validating LADDER
(core/auto.qr_auto_fused): single-pass corrected CholeskyQR, an
in-program Kahan-accurate orthogonality gate, the robust shifted
CholeskyQR3 recompute pipeline (kappa <~ 1e4, measured flat 1.6e-7
through kappa=2^14 on-chip), a second gate, and the unconditional
Householder BlockQR tree — ONE jitted program with `lax.cond` executing
only the tiers the input actually needs.  Unlike round 2's bench (bare
cholqr1, valid only because uniform random A has kappa ~ 2), this number
carries NO kappa caveat: any input gets corrected-grade output, and the
gate cost is INCLUDED in the measured time.  Accuracy is asserted
(fp32-grade orthogonality), not just timed.  Timing amortizes the
~30 ms tunnel dispatch by chaining iterations inside one jit
(utils/timing.py).
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
    from tsqr_tpu.core import auto
    from tsqr_tpu.harness import flops as flops_mod
    from tsqr_tpu.utils import timing

    mode = "bf16x6_cor"
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)

    on_tpu = jax.devices()[0].platform == "tpu"

    def qr_fn(x):
        return auto.qr_auto_fused(
            x, mode,
            fast_method="cholqr1_fused" if on_tpu else "cholqr1",
            mid_method="cholqr3_fused" if on_tpu else "cholqr3",
            mid_variant="compact" if on_tpu else "safe")

    # accuracy gate first (fp32-grade orthogonality required).  Measured
    # with the Kahan-compensated streaming Gram (a naive fp32 device Gram
    # adds ~sqrt(m)*eps of measurement error — 3e-4 at m=2^22).
    from tsqr_tpu.utils import validation
    q, r = qr_fn(a)
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
        "metric": "qr_auto_bf16x6_cor_tflops",
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
