#!/usr/bin/env python
"""Stacked-inputs chain timing: no carry hack, cond-safe.

The dus-carry chain (time_fn_amortized) mis-measures programs containing
lax.cond (pred1 4.2 ms < the 11 ms HBM floor; pred2 +8 ms vs raw).  Here
each scan step consumes a DISTINCT pre-generated input from a stacked
array — no CSE possible, no carry-touch, cross-step overlap is genuine
pipelining.  Validate: bare should reproduce ~10.5 ms/loop at 2^22-class
shapes; then compare the predictive ladder under the same harness.

Usage: python scripts/diag_stack.py [log2_m] [k_stack]
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.ops import pallas_gram
from tsqr_tpu.utils import timing

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 21
K = int(sys.argv[2]) if len(sys.argv) > 2 else 6
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


def time_stacked(fn, xs, reps=3):
    @jax.jit
    def chained(stack):
        def body(acc, x):
            out = fn(x)
            leaves = jax.lax.optimization_barrier(
                jax.tree_util.tree_leaves(out))
            for leaf in leaves:
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return acc, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stack)
        return acc

    @jax.jit
    def null(stack):
        def body(acc, x):
            return acc + x.ravel()[0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stack)
        return acc

    def best_of(g):
        float(g(xs))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(xs))
            best = min(best, time.perf_counter() - t0)
        return best

    t_chain = best_of(chained)
    t_null = best_of(null)
    return max((t_chain - t_null) / xs.shape[0], 1e-9)


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    xs = jnp.stack([jax.random.uniform(k, (M, N), jnp.float32, -1, 1)
                    for k in keys])
    print(f"stack: {xs.shape} = {xs.nbytes/2**30:.1f} GiB", flush=True)
    for name, f in (("bare", bare), ("pred2", pred2)):
        t = time_stacked(f, xs)
        print(f"stacked {name:6s}: {t*1e3:8.3f} ms/loop", flush=True)
    # cross-check vs the dus chain on the same process/input
    for name, f in (("bare", bare), ("pred2", pred2)):
        t = timing.time_fn_amortized(f, xs[0], loops=4, reps=3)
        print(f"dus     {name:6s}: {t*1e3:8.3f} ms/loop", flush=True)


if __name__ == "__main__":
    main()
