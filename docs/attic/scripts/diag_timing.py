#!/usr/bin/env python
"""Diagnose the round-3 time_fn_amortized slowdown (231 ms vs ~10 ms raw).

Times cholqr1_fused at 2^22 x 128 several ways:
  raw        : per-dispatch wall time (includes ~30 ms tunnel round trip)
  chain_dus  : current time_fn_amortized (dynamic_update_slice carry-touch)
  chain_noT  : chain WITHOUT the carry-touch (f loop-invariant -> hoistable;
               lower bound / sanity)
  chain_bump : round-2 style full-carry bump (x + tiny*acc)
Also runs the null chain alone and a plain jnp.sum through each chain to see
whether the overhead scales with fn or is fixed.
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu.core import cholqr
from tsqr_tpu.utils import timing

M, N = 1 << 22, 128
LOOPS = 4


def fn(x):
    return cholqr.fastqr(x, "bf16x6_cor", method="cholqr1_fused",
                         variant="safe")


def sum_fn(x):
    return jnp.sum(x, axis=0)


def make_chain(f, touch):
    @jax.jit
    def chained(x0):
        def body(carry, _):
            xc, acc = carry
            out = f(xc)
            leaves = jax.lax.optimization_barrier(
                jax.tree_util.tree_leaves(out))
            acc2 = jnp.zeros((), jnp.float32)
            for leaf in leaves:
                acc2 = acc2 + leaf.ravel()[0].astype(jnp.float32)
            if touch == "dus":
                flat = xc.reshape(-1)
                upd = flat[:1] + (acc2 * 1e-30).astype(xc.dtype)
                xc2 = jax.lax.dynamic_update_slice(
                    flat, upd, (0,)).reshape(xc.shape)
            elif touch == "bump":
                xc2 = xc + (acc2 * 1e-30).astype(xc.dtype)
            else:
                xc2 = xc
            return (xc2, acc2), None

        (_, acc), _ = jax.lax.scan(
            body, (x0, jnp.zeros((), jnp.float32)), None, length=LOOPS)
        return acc

    return chained


def best_of(g, x, reps=3):
    t0 = time.perf_counter()
    float(g(x))
    print(f"    (first call incl. compile: {time.perf_counter()-t0:.3f} s)",
          flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    a = jax.random.uniform(jax.random.PRNGKey(0), (M, N), jnp.float32, -1, 1)

    # raw dispatch timing
    jf = jax.jit(fn)
    for _ in range(2):
        q, r = jf(a)
        float(jnp.sum(q[0]) + jnp.sum(r[0]))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        q, r = jf(a)
        float(jnp.sum(q[0]) + jnp.sum(r[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"raw dispatch (incl ~30ms rt): {best*1e3:9.3f} ms", flush=True)

    for name, f in (("cholqr1_fused", fn), ("jnp.sum", sum_fn)):
        for touch in ("dus", "bump", "none"):
            t = best_of(make_chain(f, touch), a)
            print(f"{name:14s} chain[{touch:4s}] x{LOOPS}: {t*1e3:9.3f} ms "
                  f"total -> {t/LOOPS*1e3:8.3f} ms/loop", flush=True)

    for touch in ("dus", "bump", "none"):
        t = best_of(make_chain(lambda x0: x0.ravel()[:1] * 1.0, touch), a)
        print(f"null chain[{touch:4s}] x{LOOPS}: {t*1e3:9.3f} ms total",
              flush=True)


if __name__ == "__main__":
    main()
