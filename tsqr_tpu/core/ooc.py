"""Out-of-core tall-skinny QR: m too large for HBM.

The reference benchmarks m up to 2^26 (main.cu sweep; BASELINE.md) — at
n=128 in fp32 that is 34 GB for A+Q, beyond a single chip's HBM.  The
Gram-based methods stream naturally: G = sum of per-chunk A_c^T A_c needs
only one (chunk, n) tile on device at a time, and each Q chunk is
independent given R.  This driver keeps A in host memory (numpy), streams
chunks through the device, and writes Q chunks back to host — the lax.scan
row-chunking story of SURVEY.md §5 taken to host scale.

Passes over A (cholqr2): 2 reads + 1 Q write + 1 Q read + 1 Q write,
identical to the on-device fused path, just H2D/D2H instead of HBM.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import cholqr

Array = jax.Array


def _chunks(m: int, chunk: int):
    for lo in range(0, m, chunk):
        yield lo, min(lo + chunk, m)


def qr_out_of_core(a: np.ndarray,
                   mode: modes.ComputeMode | str = "fp32",
                   method: str = "cholqr3",
                   chunk_rows: int = 1 << 20,
                   out: np.ndarray | None = None,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Thin QR of a host-resident (m, n) array, streamed through the chip.

    Returns (Q (m, n) host array, R (n, n)).  ``out`` optionally receives Q
    in place (may alias ``a`` to halve host memory).
    """
    policy = modes.resolve(mode)
    m, n = a.shape
    assert m >= n
    n_iters = {"cholqr2": 2, "cholqr3": 3}[method]

    gram_fn = jax.jit(lambda x: modes.gram(x, policy))
    qpass_fn = jax.jit(lambda x, ri: policy.mm(x, ri))

    q_host = out if out is not None else np.empty((m, n), np.float32)
    src = a
    r_total = np.eye(n, dtype=np.float32)

    for it in range(n_iters):
        # --- Gram pass over host chunks ---
        g = jnp.zeros((n, n), jnp.float32)
        for lo, hi in _chunks(m, chunk_rows):
            g = g + gram_fn(jnp.asarray(src[lo:hi], jnp.float32))
        if it == 0 and method == "cholqr3":
            # the library's shift (cholqr._shift_value) — the old
            # trace-based 11(mn + n(n+1))*eps*trace(G) form here was up
            # to n x over (measured 16x over on latms spectra,
            # cholqr.py:48-64), wasting the preconditioner
            shift = cholqr._shift_value(g, m, n)
        else:
            shift = 0.0
        r = np.asarray(cholqr._chol_r(g, shift=shift))
        rinv = np.asarray(cholqr._rinv(jnp.asarray(r)))
        rinv_dev = jnp.asarray(rinv)
        # --- Q pass ---
        for lo, hi in _chunks(m, chunk_rows):
            q_host[lo:hi] = np.asarray(
                qpass_fn(jnp.asarray(src[lo:hi], jnp.float32), rinv_dev))
        r_total = r @ r_total
        src = q_host
    return q_host, np.triu(r_total)
