#!/usr/bin/env python
"""Validate the PRODUCTION predictive ladder (auto.qr_auto_fused) on-chip.

Checks, at m = 2^LOG2M, n = 128, bf16x6_cor:
  1. the ladder program compiles on the real chip (compile-helper risk);
  2. tier-1 output == bare cholqr1_fused output (same math);
  3. distinct-chain timings: bare vs ladder (overhead should be ~0) and
     a dus-chain cross-check on bare only (cond-free).

Usage: python scripts/diag_ladder3.py [log2_m] [k_inputs]
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu.core import auto, cholqr
from tsqr_tpu.utils import timing

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else 6
M, N = 1 << LOG2M, 128
MODE = "bf16x6_cor"


def bare(x):
    return cholqr.fastqr(x, MODE, method="cholqr1_fused", variant="safe")


def ladder(x):
    return auto.qr_auto_fused(x, MODE, fast_method="cholqr1_fused",
                              mid_method="cholqr3_fused",
                              mid_variant="compact")


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    xs = tuple(jax.random.uniform(k, (M, N), jnp.float32, -1, 1)
               for k in keys)
    print(f"{K} x ({M}, {N}) = {K * xs[0].nbytes / 2**30:.1f} GiB",
          flush=True)

    t0 = time.perf_counter()
    q_l, r_l = jax.jit(ladder)(xs[0])
    s = float(jnp.sum(q_l[..., :1]))
    print(f"ladder compiled+ran in {time.perf_counter() - t0:.1f} s "
          f"(sum {s:.3f})", flush=True)
    q_b, r_b = jax.jit(bare)(xs[0])
    dq = float(jnp.max(jnp.abs(q_l.astype(jnp.float32)
                               - q_b.astype(jnp.float32))))
    dr = float(jnp.max(jnp.abs(r_l.astype(jnp.float32)
                               - r_b.astype(jnp.float32))))
    print(f"tier1 vs bare: max|dQ|={dq:.2e} max|dR|={dr:.2e}", flush=True)
    del q_l, r_l, q_b, r_b

    for name, f in (("bare", bare), ("ladder", ladder)):
        t = timing.time_fn_distinct(f, xs, reps=3)
        print(f"distinct {name:6s}: {t * 1e3:8.3f} ms/call", flush=True)
    t = timing.time_fn_amortized(bare, xs[0], loops=max(4, K), reps=3)
    print(f"dus      bare  : {t * 1e3:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
