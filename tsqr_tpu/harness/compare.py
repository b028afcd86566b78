"""Mode-vs-mode / mode-vs-golden comparator.

≙ test_compare.hpp: element-wise relative diff of Q and R between two
library modes (compare, 50-141) and against an fp64 golden with
sign-insensitive comparison (compare_to_cusolver_double, 143-265 —
the golden here is numpy's LAPACK fp64 QR instead of cuSOLVER).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu.core import blockqr


def _max_rel_diff(x: np.ndarray, y: np.ndarray, absolute: bool) -> float:
    if absolute:  # sign-insensitive (≙ test_compare.hpp:143-265)
        x, y = np.abs(x), np.abs(y)
    denom = np.maximum(np.abs(y), 1e-30)
    return float(np.max(np.abs(x - y) / denom))


def compare_modes(m: int, n: int, mode_a: str, mode_b: str,
                  reorth_a: bool = False, reorth_b: bool = False,
                  seed: int = 0, **qr_kw) -> dict:
    """Element-wise max relative diff of Q and R between two modes."""
    a = jax.random.uniform(jax.random.PRNGKey(seed), (m, n), jnp.float32,
                           -1, 1)
    qa, ra = blockqr.qr(a, mode_a, reorth=reorth_a, **qr_kw)
    qb, rb = blockqr.qr(a, mode_b, reorth=reorth_b, **qr_kw)
    return {
        "q_max_rel_diff": _max_rel_diff(np.asarray(qa, np.float64),
                                        np.asarray(qb, np.float64), False),
        "r_max_rel_diff": _max_rel_diff(np.asarray(ra, np.float64),
                                        np.asarray(rb, np.float64), False),
    }


def compare_to_fp64_golden(m: int, n: int, mode: str, reorth: bool = False,
                           seed: int = 0, **qr_kw) -> dict:
    """Sign-insensitive comparison against numpy fp64 LAPACK QR
    (≙ compare_to_cusolver_double)."""
    a = np.asarray(jax.random.uniform(jax.random.PRNGKey(seed), (m, n),
                                      jnp.float32, -1, 1))
    q, r = blockqr.qr(jnp.asarray(a), mode, reorth=reorth, **qr_kw)
    qg, rg = np.linalg.qr(a.astype(np.float64))
    r64 = np.asarray(r, np.float64)
    # element-wise relative diff is meaningless for tiny off-diagonal R
    # entries (cancellation makes them relatively inaccurate in ANY
    # precision); the judgeable metrics are the diagonal (well-conditioned)
    # and the column-norm-scaled elements.
    dg = np.abs(np.diag(rg))
    diag_rel = np.max(np.abs(np.abs(np.diag(r64)) - dg) / dg)
    colnorm = np.maximum(np.linalg.norm(rg, axis=0), 1e-30)
    colscaled = np.max(np.abs(np.abs(r64) - np.abs(rg)) / colnorm[None, :])
    return {
        "q_max_rel_diff": _max_rel_diff(np.asarray(q, np.float64), qg, True),
        "r_max_rel_diff": _max_rel_diff(r64, rg, True),
        "r_diag_max_rel_diff": float(diag_rel),
        "r_colscaled_max_diff": float(colscaled),
    }
