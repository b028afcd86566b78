#!/usr/bin/env python
"""Second-stage bisect of ladder overhead: gate variant x cond-branch body.

Variants at M x 128 bf16x6_cor:
  bare       : cholqr1_fused alone (floor)
  gate_sep   : cholqr1_fused + SEPARATE stream_pallas Gram gate (one extra
               HBM read of Q) — vs the in-pass return_qgram variant
  cond_id    : gate_sep + cond with identity-ish fallback ((a, 0)) —
               isolates the cond output-copy cost
  cond_hh    : gate_sep + cond with the real householder fallback —
               untaken-branch cost
  cond_hh_ob : same but `a` passed through optimization_barrier inside the
               branch (blocks hoisting of branch-invariant work on `a`)
Usage: python scripts/diag_ladder2.py [log2_m] [loops]
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.ops import pallas_gram
from tsqr_tpu.utils import timing

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 22
LOOPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
M, N = 1 << LOG2M, 128
MODE = "bf16x6_cor"


def _gate(q):
    p = pallas_gram.stream_pallas(q, gram_mode="bf16x6_cor")
    g = p + p.T
    return jnp.linalg.norm(g - jnp.eye(N)) / jnp.sqrt(N * 1.0)


def bare(x):
    return cholqr.fastqr(x, MODE, method="cholqr1_fused", variant="safe")


def gate_sep(x):
    q, r = bare(x)
    return q, r, _gate(q)


def _with_cond(x, fallback):
    q, r = bare(x)
    ok = _gate(q) < 1e-5
    return jax.lax.cond(ok, lambda _: (q, jnp.triu(r)), fallback, None)


def cond_id(x):
    return _with_cond(x, lambda _: (x, jnp.zeros((N, N), x.dtype)))


def cond_hh(x):
    def hh(_):
        q, r = blockqr.qr(x, MODE, reorth=True, impl="jnp",
                          leaf_rows=2048, fanin=8)
        return q, r
    return _with_cond(x, hh)


def cond_hh_ob(x):
    def hh(_):
        xb = jax.lax.optimization_barrier(x)
        q, r = blockqr.qr(xb, MODE, reorth=True, impl="jnp",
                          leaf_rows=2048, fanin=8)
        return q, r
    return _with_cond(x, hh)


def main():
    a = jax.random.uniform(jax.random.PRNGKey(0), (M, N), jnp.float32, -1, 1)
    for name, f in (("bare", bare), ("gate_sep", gate_sep),
                    ("cond_id", cond_id), ("cond_hh", cond_hh),
                    ("cond_hh_ob", cond_hh_ob)):
        t = timing.time_fn_amortized(f, a, loops=LOOPS, reps=3)
        print(f"{name:10s}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
