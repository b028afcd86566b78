#!/usr/bin/env python
"""Stage breakdown of the sublane-packed narrow-panel CholQR (round 5).

The packed n=16 rows land ~5-10x off the HBM roofline (2^20 x 16 bf16
cholqr1 measured 2.58 ms vs a ~0.3 ms 3-pass floor).  This script times
each stage of the packed pipeline in isolation on the real chip so the
gap is attributed, not guessed: the m-scale streams (gram / q-pass),
the n-scale serial ops (cholesky, triangular inverse, kron), and a
pure-read stream of the same byte count as the speed-of-light anchor.

Usage: python scripts/profile_sbpack.py [log2_m] [n]   (default 2^20, 16)
Prints one line per stage; appends nothing to data/ (exploratory).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import cholqr
from tsqr_tpu.utils import timing

K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16
M = 1 << K


def t_of(fn, x, label):
    t, loops = timing.time_fn_amortized_auto(fn, x, reps=3, max_loops=4096,
                                             resolution_nan=True)
    print(f"{label:34s} t={t*1e3:9.4f} ms  loops={loops}", flush=True)
    return t


def main():
    a = jax.random.uniform(jax.random.PRNGKey(0), (M, N), jnp.float32, -1, 1)
    p = cholqr._pack_factor(M, N)
    policy = modes.resolve("bf16")
    ap = cholqr._pack(a, p)
    g = cholqr._gram_packed(ap, policy, p, N)
    r = cholqr._chol_r(g)
    print(f"config m=2^{K} n={N} p={p} bytes_f32={a.nbytes/1e6:.0f}MB",
          flush=True)

    t_of(lambda x: cholqr.fastqr(x, "bf16", method="cholqr1"), a,
         "full fastqr bf16/cholqr1")
    t_of(lambda x: cholqr.fastqr(x, "bf16x6_cor", method="cholqr2"), a,
         "full fastqr x6/cholqr2")
    t_of(lambda x: cholqr._pack(x, p), a, "pack (reshape only)")
    t_of(lambda x: x.astype(jnp.bfloat16), a, "f32 -> bf16 cast stream")
    t_of(lambda x: cholqr._gram_packed(x, policy, p, N), ap,
         "gram_packed (m-scale)")
    t_of(lambda gg: cholqr._chol_r(gg), g, "chol_r (n-scale)")
    t_of(lambda rr: cholqr._rinv(rr.astype(jnp.float32)), r,
         "rinv (n-scale)")
    t_of(lambda rr: jnp.kron(jnp.eye(p, dtype=jnp.float32),
                             cholqr._rinv(rr.astype(jnp.float32))), r,
         "rinv + kron (n-scale)")
    t_of(lambda x: cholqr._q_pass_packed(x, r, policy.mm, p), ap,
         "q_pass_packed (m-scale)")
    t_of(lambda x: jnp.sum(x, axis=0), ap, "pure read reduce (anchor)")
    bf = ap.astype(jnp.bfloat16)
    t_of(lambda x: jnp.sum(x.astype(jnp.float32), axis=0), bf,
         "pure bf16 read reduce (anchor)")


if __name__ == "__main__":
    main()
