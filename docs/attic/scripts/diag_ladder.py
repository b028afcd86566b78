#!/usr/bin/env python
"""Breakdown of the 2^22 ladder overhead (26.9 ms vs 10.3 ms bare tier 1).

Times, at M x 128 bf16x6_cor on the chip (one process, shared warm input):
  t_bare   : cholqr1_fused alone
  t_qgram  : cholqr1_fused(return_qgram=True) + norm (gate math, no cond)
  t_cond0  : gate + lax.cond with a TRIVIAL fallback (zeros_like) —
             isolates the cond copy/serialization cost
  t_ladder2: gate + cond(householder) — bench tier 1+3
  t_ladder3: full bench ladder (tier 1+2+3)
Usage: python scripts/diag_ladder.py [log2_m] [loops]
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu.core import auto, cholqr
from tsqr_tpu.utils import timing

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 22
LOOPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
M, N = 1 << LOG2M, 128
MODE = "bf16x6_cor"


def t_bare(x):
    return cholqr.fastqr(x, MODE, method="cholqr1_fused", variant="safe")


def t_qgram(x):
    q, r, g = cholqr.cholqr1_fused(x, MODE, return_qgram=True)
    orth = jnp.linalg.norm(g - jnp.eye(N)) / jnp.sqrt(N * 1.0)
    return q, r, orth


def t_cond0(x):
    q, r, g = cholqr.cholqr1_fused(x, MODE, return_qgram=True)
    orth = jnp.linalg.norm(g - jnp.eye(N)) / jnp.sqrt(N * 1.0)
    ok = orth < 1e-5
    return jax.lax.cond(ok, lambda _: (q, jnp.triu(r)),
                        lambda _: (jnp.zeros_like(q), jnp.zeros_like(r)),
                        None)


def t_ladder2(x):
    return auto.qr_auto_fused(x, MODE, fast_method="cholqr1_fused")


def t_ladder3(x):
    return auto.qr_auto_fused(x, MODE, fast_method="cholqr1_fused",
                              mid_method="cholqr3_fused",
                              mid_variant="compact")


def main():
    a = jax.random.uniform(jax.random.PRNGKey(0), (M, N), jnp.float32, -1, 1)
    for name, f in (("bare", t_bare), ("qgram", t_qgram),
                    ("cond0", t_cond0), ("ladder2", t_ladder2),
                    ("ladder3", t_ladder3)):
        t = timing.time_fn_amortized(f, a, loops=LOOPS, reps=3)
        print(f"{name:8s}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
