"""Condition-number robustness harness.

≙ accuracy_cond (test_cond.cu:129-248): sweep target condition numbers
(reference: kappa = 2^2 .. 2^15 at m=2^15, n=2^7) on latms-generated
matrices with verified condition numbers (rejection loop,
test_cond.cu:45-60); CSV schema ``m,n,condition,type,compute_mode,
reorthogonalization,residual,...`` (test_cond.cu:109-112).  Golden
baseline rows against ``jnp.linalg.qr`` ≙ cusolver_accuracy_cond
(test_cond.cu:271-402) — the reference judges every cond sweep against
the vendor QR on the same generated matrices.
"""

from __future__ import annotations

import sys
from typing import IO, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr
from tsqr_tpu.utils import latms, validation

CSV_HEADER = ("m,n,condition,measured_condition,type,compute_mode,"
              "reorthogonalization,residual,residual_variance,"
              "orthogonality,orthogonality_variance")


def cond_row(m: int, n: int, cond: float, mode: str, reorth: bool = False,
             trials: int = 4, seed: int = 0, **qr_kw) -> dict:
    """One (kappa, mode) config.  mode="golden" benchmarks jnp.linalg.qr
    on the same latms matrices (≙ cusolver_accuracy_cond,
    test_cond.cu:271-402)."""
    if mode == "golden":
        policy = None
        name = "jnp.linalg.qr"
        fn = jax.jit(jnp.linalg.qr)
        reorth = False
    else:
        policy = modes.resolve(mode)
        name = policy.name
        fn = jax.jit(lambda x: blockqr.qr(x, policy, reorth=reorth, **qr_kw))
    key = jax.random.PRNGKey(seed)
    residuals, orths, measured = [], [], []
    for t in range(trials):
        key, k = jax.random.split(key)
        a, mc = latms.rand_matrix_with_cond(k, m, n, cond)
        q, r = fn(a)
        residuals.append(validation.residual(a, q, r))
        orths.append(validation.orthogonality(q))
        measured.append(mc)
    residuals, orths = np.array(residuals), np.array(orths)
    return {"m": m, "n": n, "condition": cond,
            "measured_condition": float(np.mean(measured)),
            "type": "float32", "compute_mode": name,
            "reorthogonalization": int(reorth),
            "residual": residuals.mean(),
            "residual_variance": residuals.var(),
            "orthogonality": orths.mean(),
            "orthogonality_variance": orths.var()}


def format_row(row: dict) -> str:
    return (f"{row['m']},{row['n']},{row['condition']:.6e},"
            f"{row['measured_condition']:.6e},{row['type']},"
            f"{row['compute_mode']},{row['reorthogonalization']},"
            f"{row['residual']:.6e},{row['residual_variance']:.6e},"
            f"{row['orthogonality']:.6e},{row['orthogonality_variance']:.6e}")


def sweep(m: int, n: int, conds: Sequence[float],
          mode_names: Sequence[str], reorths: Sequence[bool] = (False, True),
          out: IO = sys.stdout, **kw) -> list[dict]:
    """≙ main.cu:104-112 cond sweep."""
    print(CSV_HEADER, file=out, flush=True)
    rows = []
    for mode in mode_names:
        for reorth in reorths:
            if mode == "golden" and reorth:
                continue  # golden rows have no reorth variant
            for cond in conds:
                try:
                    row = cond_row(m, n, cond, mode, reorth, **kw)
                except Exception as e:
                    from tsqr_tpu.utils.status import exc_note
                    print(f"# error cond={cond} mode={mode}: "
                          f"{exc_note(e)}", file=out, flush=True)
                    continue
                rows.append(row)
                print(format_row(row), file=out, flush=True)
    return rows
