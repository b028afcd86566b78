#!/usr/bin/env python
"""Validate the predictive-ladder timings + bisect the untaken-branch cost.

pred1 measured 4.2 ms in the amortized chain at 2^22 — below the ~11 ms
HBM floor for gram+qpass, so either the chain elides work through the
cond or the cond enables cross-iteration overlap.  Check with raw
dispatch timing + output correctness, and measure pred2 without the
Householder tier to price the big untaken branch.

Usage: python scripts/diag_pred2.py [log2_m]
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

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.ops import pallas_gram
from tsqr_tpu.utils import timing

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 22
M, N = 1 << LOG2M, 128
MODE = "bf16x6_cor"
TOL = 1e-5
EPS_BASE = jnp.float32(4e-8)
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


def _tier1(x, r1, rinv1):
    q = pallas_gram.stream_pallas(x, (rinv1,), (MODE,), write_q=True,
                                  out_dtype=jnp.float32)
    return q, jnp.triu(r1)


def bare(x):
    return cholqr.fastqr(x, MODE, method="cholqr1_fused", variant="safe")


def pred1(x):
    g, r1, rinv1, ok = _shared(x)
    return jax.lax.cond(
        ok, lambda _: _tier1(x, r1, rinv1),
        lambda _: (jnp.zeros((M, N), jnp.float32),
                   jnp.zeros((N, N), jnp.float32)), None)


def _rest2(x):
    q_m, r_m = cholqr.cholqr3_fused(x, MODE, variant="compact")
    p = pallas_gram.stream_pallas(q_m, gram_mode=MODE)
    gq = p + p.T
    orth = jnp.linalg.norm(gq - jnp.eye(N)) / jnp.sqrt(N * 1.0)
    return q_m, r_m, orth


def pred2_noHH(x):
    g, r1, rinv1, ok = _shared(x)

    def rest(_):
        q_m, r_m, orth = _rest2(x)
        bad = ~(orth < TOL)
        # signal tier-2 failure by NaN-poisoning R (host driver escalates)
        r_m = jnp.where(bad, jnp.nan, 1.0) * jnp.triu(r_m)
        return q_m, r_m

    return jax.lax.cond(ok, lambda _: _tier1(x, r1, rinv1), rest, None)


def pred2(x):
    g, r1, rinv1, ok = _shared(x)

    def rest(_):
        q_m, r_m, orth = _rest2(x)
        ok_m = orth < TOL

        def hh(_):
            q, r = blockqr.qr(x, MODE, reorth=True, impl="jnp",
                              leaf_rows=2048, fanin=8)
            return q, r
        return jax.lax.cond(ok_m, lambda _: (q_m, jnp.triu(r_m)), hh, None)

    return jax.lax.cond(ok, lambda _: _tier1(x, r1, rinv1), rest, None)


def raw_time(f, xs, iters=6):
    jf = jax.jit(f)
    for x in xs[:2]:
        out = jf(x)
        float(jnp.sum(out[0][..., :1]))
    best = float("inf")
    for i in range(iters):
        x = xs[i % len(xs)]
        t0 = time.perf_counter()
        out = jf(x)
        float(jnp.sum(out[0][..., :1]) + jnp.sum(out[1][..., :1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.uniform(k1, (M, N), jnp.float32, -1, 1)
    b = jax.random.uniform(k2, (M, N), jnp.float32, -1, 1)

    # correctness: pred1 == bare bitwise (same kernels, same input)
    qb, rb = jax.jit(bare)(a)
    qp, rp = jax.jit(pred1)(a)
    print(f"pred1 == bare: q {bool(jnp.all(qb == qp))} "
          f"r {bool(jnp.all(rb == rp))}", flush=True)
    del qb, rb, qp, rp

    # null dispatch round trip
    t_null = raw_time(lambda x: (x[:1, :1] * 1.0, x[:1, :1] * 1.0), [a, b])
    print(f"null dispatch: {t_null*1e3:8.3f} ms", flush=True)
    for name, f in (("bare", bare), ("pred1", pred1),
                    ("pred2_noHH", pred2_noHH), ("pred2", pred2)):
        t = raw_time(f, [a, b])
        print(f"raw {name:10s}: {t*1e3:8.3f} ms  (minus null: "
              f"{(t-t_null)*1e3:8.3f} ms)", flush=True)

    for name, f in (("pred2_noHH", pred2_noHH), ("pred2", pred2)):
        t = timing.time_fn_amortized(f, a, loops=4, reps=3)
        print(f"chain {name:10s}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
