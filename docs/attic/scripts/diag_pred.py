#!/usr/bin/env python
"""Prototype the PREDICTIVE-gate ladder and cost its pieces.

The posthoc ladder measures orthogonality of the computed Q (an extra
HBM pass or a slower fused kernel).  CholeskyQR theory gives the same
guarantee a priori: orth(Q1) <~ C * kappa(A)^2 * eps, and kappa(A)^2 =
kappa(G) is boundable from the (n, n) Gram alone —
lam_max <= ||G||_inf, lam_min^-1 <= ||Rinv1 Rinv1^T||_inf — so the tier
decision costs zero HBM traffic and the Q-writing pass moves INSIDE the
cond branches (no full-Q copy through the cond output).

Variants at M x 128 bf16x6_cor:
  bare   : cholqr1_fused (floor)
  pred0  : gram + chol + inv + kappa bound, Q-pass unconditional
           (= bare + bound cost, no cond)
  pred1  : Q-pass inside cond(ok, qpass, zeros) — cond/scalar stall cost
  pred2  : cond(ok, qpass, tier2-compact-with-posthoc-gate + tier3 cond)
           — the full predictive ladder
Usage: python scripts/diag_pred.py [log2_m] [loops]
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.ops import pallas_gram
from tsqr_tpu.utils import timing

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 22
LOOPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
M, N = 1 << LOG2M, 128
MODE = "bf16x6_cor"
TOL = 1e-5
EPS_BASE = jnp.float32(4e-8)   # measured orth/kappa^2 of cholqr1 corrected
SAFETY = jnp.float32(8.0)


def _inf_norm(x):
    return jnp.max(jnp.sum(jnp.abs(x), axis=1), keepdims=True)[None]


def _shared(x):
    g = pallas_gram.gram_pallas(x, MODE)
    r1 = cholqr._chol_r(g)
    rinv1 = cholqr._rinv(r1)
    minv = modes.mm_fp32(rinv1, rinv1.T)
    kappa2 = (_inf_norm(g) * _inf_norm(minv)).reshape(1, 1)
    ok = (kappa2 * (EPS_BASE * SAFETY) < TOL).reshape(())
    return g, r1, rinv1, ok


def bare(x):
    return cholqr.fastqr(x, MODE, method="cholqr1_fused", variant="safe")


def pred0(x):
    g, r1, rinv1, ok = _shared(x)
    q = pallas_gram.stream_pallas(x, (rinv1,), (MODE,), write_q=True,
                                  out_dtype=jnp.float32)
    return q, jnp.triu(r1), ok


def _tier1(x, r1, rinv1):
    q = pallas_gram.stream_pallas(x, (rinv1,), (MODE,), write_q=True,
                                  out_dtype=jnp.float32)
    return q, jnp.triu(r1)


def pred1(x):
    g, r1, rinv1, ok = _shared(x)
    return jax.lax.cond(
        ok, lambda _: _tier1(x, r1, rinv1),
        lambda _: (jnp.zeros((M, N), jnp.float32),
                   jnp.zeros((N, N), jnp.float32)), None)


def pred2(x):
    g, r1, rinv1, ok = _shared(x)

    def rest(_):
        q_m, r_m = cholqr.cholqr3_fused(x, MODE, variant="compact")
        p = pallas_gram.stream_pallas(q_m, gram_mode=MODE)
        gq = p + p.T
        orth = jnp.linalg.norm(gq - jnp.eye(N)) / jnp.sqrt(N * 1.0)
        ok_m = orth < TOL

        def hh(_):
            q, r = blockqr.qr(x, MODE, reorth=True, impl="jnp",
                              leaf_rows=2048, fanin=8)
            return q, r
        return jax.lax.cond(ok_m, lambda _: (q_m, jnp.triu(r_m)), hh, None)

    return jax.lax.cond(ok, lambda _: _tier1(x, r1, rinv1), rest, None)


def main():
    a = jax.random.uniform(jax.random.PRNGKey(0), (M, N), jnp.float32, -1, 1)
    # correctness probe first
    q, r, ok = jax.jit(pred0)(a)
    print(f"pred0 gate ok={bool(ok)} (expect True for uniform random)",
          flush=True)
    for name, f in (("bare", bare), ("pred0", pred0), ("pred1", pred1),
                    ("pred2", pred2)):
        t = timing.time_fn_amortized(f, a, loops=LOOPS, reps=3)
        print(f"{name:6s}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
