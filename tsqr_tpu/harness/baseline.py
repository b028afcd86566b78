"""Golden-baseline harness rows: XLA's native QR measured with the same
protocol.

≙ cusolver_accuracy / cusolver_speed (test.cu:366-593): the reference
benchmarks cuSOLVER geqrf+orgqr with the same metrics/CSV schemas so
library rows are judged against the vendor baseline.  The TPU vendor
baseline is ``jnp.linalg.qr`` (XLA's blocked Householder).
"""

from __future__ import annotations

import sys
from typing import IO, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu.harness import accuracy as accuracy_mod
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.harness import speed as speed_mod
from tsqr_tpu.utils import timing, validation


def baseline_accuracy_row(m: int, n: int, rand_range: float = 1.0,
                          trials: int = 16, seed: int = 0) -> dict:
    fn = jax.jit(lambda x: jnp.linalg.qr(x))
    key = jax.random.PRNGKey(seed)
    residuals, orths = [], []
    for _ in range(trials):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (m, n), jnp.float32,
                               -rand_range, rand_range)
        q, r = fn(a)
        residuals.append(validation.residual(a, q, r))
        orths.append(validation.orthogonality(q))
    residuals, orths = np.array(residuals), np.array(orths)
    return {"m": m, "n": n, "rand_range": rand_range, "type": "float32",
            "compute_mode": "jnp.linalg.qr",
            "reorthogonalization": 0,
            "residual": residuals.mean(),
            "residual_variance": residuals.var(),
            "orthogonality": orths.mean(),
            "orthogonality_variance": orths.var()}


def baseline_speed_row(m: int, n: int, trials: int = 4, seed: int = 0,
                       **_ignored) -> dict:
    a = jax.random.uniform(jax.random.PRNGKey(seed), (m, n), jnp.float32,
                           -1, 1)
    elapsed = timing.time_fn_amortized(jnp.linalg.qr, a,
                                       loops=max(2, trials), reps=2)
    fl = flops_mod.qr_flops(m, n)
    return {"m": m, "n": n, "type": "float32",
            "compute_mode": "jnp.linalg.qr", "reorthogonalization": 0,
            "elapsed_time": elapsed, "tflops": fl / elapsed / 1e12,
            "working_memory_size": 0}


def accuracy_sweep(ms: Sequence[int], ns: Sequence[int], trials: int = 16,
                   out: IO = sys.stdout) -> list[dict]:
    print(accuracy_mod.CSV_HEADER, file=out, flush=True)
    rows = []
    for m in ms:
        for n in ns:
            if n > m:
                continue
            row = baseline_accuracy_row(m, n, trials=trials)
            rows.append(row)
            print(accuracy_mod.format_row(row), file=out, flush=True)
    return rows


def speed_sweep(ms: Sequence[int], ns: Sequence[int],
                out: IO = sys.stdout) -> list[dict]:
    print(speed_mod.CSV_HEADER, file=out, flush=True)
    rows = []
    for m in ms:
        for n in ns:
            if n > m:
                continue
            row = baseline_speed_row(m, n)
            rows.append(row)
            print(speed_mod.format_row(row), file=out, flush=True)
    return rows
