"""Out-of-core tall-skinny QR: m too large for HBM.

The reference benchmarks m up to 2^26 (main.cu sweep; BASELINE.md) — at
n=128 that is 34 GB (fp32) / 17 GB (bf16) for A alone, beyond a single
chip's 15.75 GB HBM.  The Gram-based methods stream naturally: G = sum of
per-chunk A_c^T A_c needs only one (chunk, n) tile on device at a time,
and each Q chunk is independent given R.  This driver keeps A in host
memory (numpy), streams chunks through the device, and writes Q chunks
back to host — the lax.scan row-chunking story of SURVEY.md §5 taken to
host scale.

Passes over A: cholqr1 = 2 reads + 1 write (the bf16-capacity config for
the reference's m=2^26 envelope edge); cholqr2 = 5; cholqr3 = 7 — same
pass structure as the on-device pipelines, just H2D/D2H instead of HBM.

Metrics at this scale must stream too (Q alone exceeds HBM):
``ooc_orthogonality`` / ``ooc_residual`` below accumulate the Gram /
difference norms chunk-wise on device with Kahan compensation.
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

    Returns (Q (m, n) host array in the mode's io dtype, R (n, n)).
    ``out`` optionally receives Q in place (may alias ``a`` to halve host
    memory — the host analogue of ``fastqr_inplace``).  ``a`` may be
    stored bf16 (ml_dtypes) to halve host memory and tunnel traffic; each
    chunk is upcast to f32 on device.
    """
    policy = modes.resolve(mode)
    m, n = a.shape
    assert m >= n
    n_iters = {"cholqr1": 1, "cholqr2": 2, "cholqr3": 3}[method]
    io_np = jnp.dtype(policy.io_dtype)

    gram_fn = jax.jit(lambda x: modes.gram(x.astype(jnp.float32), policy))
    qpass_fn = jax.jit(
        lambda x, ri: policy.mm(x.astype(jnp.float32), ri)
        .astype(policy.io_dtype))

    if out is not None:
        assert out.dtype == io_np, f"out must be {io_np}, got {out.dtype}"
        q_host = out
    else:
        q_host = np.empty((m, n), io_np)
    src = a
    r_total = np.eye(n, dtype=np.float32)

    for it in range(n_iters):
        # --- Gram pass over host chunks (Kahan-compensated in f32) ---
        g = jnp.zeros((n, n), jnp.float32)
        comp = jnp.zeros((n, n), jnp.float32)
        for lo, hi in _chunks(m, chunk_rows):
            contrib = gram_fn(jnp.asarray(src[lo:hi]))
            y = contrib - comp
            t = g + y
            comp = (t - g) - y
            g = t
        if it == 0 and method == "cholqr3":
            # the library's shift (the old trace-based form here was up
            # to n x over — measured 16x over on latms spectra,
            # cholqr.py:48-64)
            shift = cholqr._shift_value(g, m, n)
        else:
            shift = 0.0
        r = np.asarray(cholqr._chol_r(g, shift=shift))
        rinv_dev = jnp.asarray(np.asarray(cholqr._rinv(jnp.asarray(r))))
        # --- Q pass ---
        for lo, hi in _chunks(m, chunk_rows):
            q_host[lo:hi] = np.asarray(
                qpass_fn(jnp.asarray(src[lo:hi]), rinv_dev))
        r_total = r @ r_total
        src = q_host
    return q_host, np.triu(r_total)


def ooc_orthogonality(q: np.ndarray, chunk_rows: int = 1 << 20) -> float:
    """||Q^T Q - I||_F / sqrt(n) for a host-resident Q, streamed through
    the device with Kahan-compensated Gram accumulation (measurement
    error ~ chunk-local, independent of m — same rationale as
    validation.orthogonality_accurate)."""
    m, n = q.shape
    gram_fn = jax.jit(lambda x: jnp.matmul(
        x.T, x, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32))
    g = jnp.zeros((n, n), jnp.float32)
    comp = jnp.zeros((n, n), jnp.float32)
    for lo, hi in _chunks(m, chunk_rows):
        contrib = gram_fn(jnp.asarray(q[lo:hi]).astype(jnp.float32))
        y = contrib - comp
        t = g + y
        comp = (t - g) - y
        g = t
    return float(jnp.linalg.norm(g - jnp.eye(n)) / jnp.sqrt(n * 1.0))


def ooc_residual(a: np.ndarray, q: np.ndarray, r: np.ndarray,
                 chunk_rows: int = 1 << 20) -> float:
    """||A - QR||_F / ||A||_F for host-resident A, Q — chunk-streamed."""
    m, n = a.shape
    r_dev = jnp.asarray(np.asarray(r, np.float32))

    @jax.jit
    def step(ac, qc, r, d2, a2):
        ac = ac.astype(jnp.float32)
        d = ac - jnp.matmul(qc.astype(jnp.float32), r,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        return d2 + jnp.sum(d * d), a2 + jnp.sum(ac * ac)

    d2 = jnp.zeros((), jnp.float32)
    a2 = jnp.zeros((), jnp.float32)
    for lo, hi in _chunks(m, chunk_rows):
        d2, a2 = step(jnp.asarray(a[lo:hi]), jnp.asarray(q[lo:hi]),
                      r_dev, d2, a2)
    return float(jnp.sqrt(d2) / jnp.sqrt(a2))
