"""Statistical accuracy harness: CSV rows matching the reference schema.

≙ mtk::test_qr::accuracy (test.cu:81-234): C=16 random trials per
(m, n, rand_range) config; mean and variance of relative residual
||A-QR||_F/||A||_F and orthogonality ||Q^TQ-I||_F/sqrt(n); CSV schema
``m,n,rand_range,type,compute_mode,reorthogonalization,residual,
residual_variance,orthogonality,orthogonality_variance`` (test.cu:51-58).
Rows are flushed per config so partial sweeps survive interruption
(≙ test.cu:228-232).
"""

from __future__ import annotations

import sys
from typing import IO, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr
from tsqr_tpu.utils import validation

CSV_HEADER = ("m,n,rand_range,type,compute_mode,reorthogonalization,"
              "residual,residual_variance,orthogonality,"
              "orthogonality_variance")


def accuracy_row(m: int, n: int, mode: str, reorth: bool = False,
                 rand_range: float = 1.0, trials: int = 16, seed: int = 0,
                 metrics: str = "auto", **qr_kw) -> dict:
    """One config: C random trials -> mean/variance of both metrics.

    metrics: "host" (fp64 golden, ≙ the reference's device-fp64
    validation.cu:43-80), "device" (chunked on-device f32: Kahan wide
    Gram for orthogonality, HIGHEST residual — calibrated against host
    fp64, see validation.py), or "auto" (host up to m*n = 2^26; the
    tunnel transfers at ~26 MB/s, so host metrics do not scale to the
    wide-n grid)."""
    policy = modes.resolve(mode)
    fn = jax.jit(lambda x: blockqr.qr(x, policy, reorth=reorth, **qr_kw))
    key = jax.random.PRNGKey(seed)
    if metrics == "auto":
        metrics = "host" if m * n <= (1 << 26) else "device"
    residuals, orths = [], []
    for t in range(trials):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (m, n), jnp.float32,
                               -rand_range, rand_range)
        q, r = fn(a)
        if metrics == "device":
            residuals.append(float(validation.residual_device_chunked(
                a, q, r)))
            orths.append(validation.orthogonality_accurate(q))
        else:
            residuals.append(validation.residual(a, q, r))
            orths.append(validation.orthogonality(q))
    residuals, orths = np.array(residuals), np.array(orths)
    return {
        "m": m, "n": n, "rand_range": rand_range, "type": "float32",
        "compute_mode": policy.name, "reorthogonalization": int(reorth),
        "residual": residuals.mean(), "residual_variance": residuals.var(),
        "orthogonality": orths.mean(),
        "orthogonality_variance": orths.var(),
    }


def format_row(row: dict) -> str:
    return (f"{row['m']},{row['n']},{row['rand_range']},{row['type']},"
            f"{row['compute_mode']},{row['reorthogonalization']},"
            f"{row['residual']:.6e},{row['residual_variance']:.6e},"
            f"{row['orthogonality']:.6e},{row['orthogonality_variance']:.6e}")


def sweep(ms: Sequence[int], ns: Sequence[int], mode_names: Sequence[str],
          reorths: Sequence[bool] = (False,), trials: int = 16,
          out: IO = sys.stdout, **qr_kw) -> list[dict]:
    """(m, n, mode, reorth) grid sweep with n <= m (≙ main.cu:95-102)."""
    print(CSV_HEADER, file=out, flush=True)
    rows = []
    for mode in mode_names:
        for reorth in reorths:
            for m in ms:
                for n in ns:
                    if n > m:
                        continue
                    # per-config error containment (≙ test.cu:229-232:
                    # catch, report, continue the sweep)
                    try:
                        row = accuracy_row(m, n, mode, reorth,
                                           trials=trials, **qr_kw)
                    except Exception as e:
                        from tsqr_tpu.utils.status import exc_note
                        print(f"# error m={m} n={n} mode={mode}: "
                              f"{exc_note(e)}", file=out, flush=True)
                        continue
                    rows.append(row)
                    print(format_row(row), file=out, flush=True)
    return rows
