#!/usr/bin/env python
"""On-chip measurement of the robust fused pipelines (round 3 item 1).

Times cholqr3_fused safe/compact, cholqr2_fused fast, cholqr1_fused at
M=2^22 x N=128 (+ a kappa sweep of the compact pipeline on latms inputs)
with orthogonality gates.  Usage: python scripts/robust_bench.py [--quick]
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu.core import cholqr
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.utils import timing, validation


def time_config(a, mode, method, variant):
    m, n = a.shape

    def fn(x):
        return cholqr.fastqr(x, mode, method=method, variant=variant)

    q, r = jax.jit(fn)(a)
    orth = float(validation.orthogonality_accurate(q))
    del q, r
    t, loops = timing.time_fn_amortized_auto(fn, a, reps=3)
    tflops = flops_mod.qr_flops(m, n) / t / 1e12
    print(f"{mode:10s} {method:15s} {variant:8s} t={t*1e3:8.3f} ms  "
          f"useful={tflops:6.2f} TFLOP/s  orth={orth:.2e} (loops={loops})",
          flush=True)
    return t, orth


def main():
    quick = "--quick" in sys.argv
    m, n = (1 << 21, 128) if quick else (1 << 22, 128)
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)
    print(f"== uniform random (kappa~2), m=2^{m.bit_length()-1} n={n} ==",
          flush=True)
    for mode, method, variant in (
            ("bf16x6_cor", "cholqr1_fused", "safe"),
            ("bf16x6_cor", "cholqr2_fused", "fast"),
            ("bf16x6_cor", "cholqr3_fused", "safe"),
            ("bf16x6_cor", "cholqr3_fused", "compact"),
            ("fp32", "cholqr3_fused", "compact"),
    ):
        try:
            time_config(a, mode, method, variant)
        except Exception as e:
            print(f"FAILED {mode}/{method}/{variant}: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    del a

    print("== latms kappa sweep, compact robust pipeline, m=2^20 n=128 ==",
          flush=True)
    from tsqr_tpu.utils import latms
    for k in (4, 8, 12, 14):
        key = jax.random.PRNGKey(k)
        a, measured = latms.rand_matrix_with_cond(key, 1 << 20, 128,
                                                  float(2 ** k))
        for variant in ("safe", "compact"):
            q, r = jax.jit(lambda x, v=variant: cholqr.fastqr(
                x, "bf16x6_cor", method="cholqr3_fused", variant=v))(a)
            orth = float(validation.orthogonality_accurate(q))
            resid = float(validation.residual_device_chunked(a, q, r))
            print(f"kappa=2^{k} ({measured:.3g}) {variant:8s} "
                  f"orth={orth:.2e} resid={resid:.2e}", flush=True)
            del q, r
        del a


if __name__ == "__main__":
    main()
