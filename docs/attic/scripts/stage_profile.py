#!/usr/bin/env python
"""Stage-wise timing of the fused CholeskyQR pipelines at 2^22 x 128.

The whole-pipeline measurements (scripts/robust_bench.py) show ~12 ms
more than the sum of modeled stage costs for cholqr3-class pipelines;
this times each streaming pass and each (n, n) factor op separately to
find where the time goes.
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu.core import cholqr
from tsqr_tpu.ops import pallas_gram
from tsqr_tpu.utils import timing


def t_of(name, fn, x):
    t, loops = timing.time_fn_amortized_auto(fn, x, reps=3)
    print(f"{name:45s} t={t*1e3:8.3f} ms (loops={loops})", flush=True)
    return t


def main():
    m, n = 1 << 22, 128
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)
    g = jax.jit(lambda x: pallas_gram.gram_pallas(x, "bf16x6_cor"))(a)
    r1 = jax.jit(cholqr._chol_r)(g)
    rinv1 = jax.jit(cholqr._rinv)(r1)
    f2 = rinv1  # same shape/scale for timing purposes

    t_of("gram x6", lambda x: pallas_gram.gram_pallas(x, "bf16x6_cor"), a)
    t_of("stream dotx3+gramx6", lambda x: pallas_gram.stream_pallas(
        x, (rinv1,), ("bf16x3_cor",), gram_mode="bf16x6_cor"), a)
    t_of("stream dotx6+gramx6", lambda x: pallas_gram.stream_pallas(
        x, (f2,), ("bf16x6_cor",), gram_mode="bf16x6_cor"), a)
    t_of("stream dotx6+deltax3 write", lambda x: pallas_gram.stream_pallas(
        x, (f2, rinv1), ("bf16x6_cor", "bf16x3_cor"),
        residual=(False, True), write_q=True, out_dtype=jnp.float32), a)
    t_of("stream dotx6 write (no delta)", lambda x: pallas_gram.stream_pallas(
        x, (f2,), ("bf16x6_cor",), write_q=True, out_dtype=jnp.float32), a)
    t_of("qpass x6 with_gram (write+gram)", lambda x: pallas_gram.stream_pallas(
        x, (rinv1,), ("bf16x6_cor",), write_q=True, gram_mode="bf16x6_cor",
        out_dtype=jnp.float32), a)

    # (n, n) factor ops — timed on a small carrier to expose fixed costs
    t_of("chol_r (128)", lambda x: cholqr._chol_r(x @ x.T * 0.0 + g), g)
    t_of("rinv (128)", cholqr._rinv, r1)
    t_of("compose (128)", lambda x: cholqr._compose(x, x), rinv1)

    # full pipelines for reference
    t_of("cholqr1_fused x6", lambda x: cholqr.cholqr1_fused(
        x, "bf16x6_cor"), a)
    t_of("cholqr3_fused compact x6", lambda x: cholqr.cholqr3_fused(
        x, "bf16x6_cor", variant="compact"), a)


if __name__ == "__main__":
    main()
