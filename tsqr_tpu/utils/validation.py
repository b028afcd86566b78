"""Accuracy metrics: orthogonality, residual, exponent histograms.

≙ reference src/validation.{hpp,cu}: orthogonality ||Q^T Q - I||_F / sqrt(n)
computed in fp64 (validation.cu:43-80), diagonal/off-diagonal split
(validation.cu:86-127), 16x16-block heatmap (validation.cu:133-181),
per-tree-node check (validation.cu:187-209), and the floating-point
exponent histogram used for the underflow studies (validation.cu:18-40,
214-237).  TPU note: device fp64 is unavailable/slow on TPU, so metrics are
computed in fp64 on host via numpy (the tests' golden path) or in fp32 with
compensated accumulation on device (fast path for the speed harness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def orthogonality(q) -> float:
    """||Q^T Q - I||_F / sqrt(n), fp64 on host (≙ check_orthogonality16,
    validation.cu:43-80)."""
    q = np.asarray(q, dtype=np.float64)
    n = q.shape[1]
    g = q.T @ q - np.eye(n)
    return float(np.linalg.norm(g) / np.sqrt(n))


def orthogonality_each(q) -> tuple[float, float]:
    """(diagonal, off-diagonal) parts of ||Q^T Q - I||_F / sqrt(n)
    (≙ check_orthogonality16_each, validation.cu:86-127)."""
    q = np.asarray(q, dtype=np.float64)
    n = q.shape[1]
    g = q.T @ q - np.eye(n)
    d = np.diag(np.diag(g))
    off = g - d
    s = np.sqrt(n)
    return float(np.linalg.norm(d) / s), float(np.linalg.norm(off) / s)


def submatrix_orthogonality(q, tile: int = 16) -> np.ndarray:
    """Per-(tile x tile)-block F-norms of Q^T Q - I, the block heatmap
    (≙ check_submatrix_orthogonality, validation.cu:133-181)."""
    q = np.asarray(q, dtype=np.float64)
    n = q.shape[1]
    g = q.T @ q - np.eye(n)
    nt = -(-n // tile)
    out = np.zeros((nt, nt))
    for i in range(nt):
        for j in range(nt):
            blk = g[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile]
            out[i, j] = np.linalg.norm(blk)
    return out


def multi_orthogonality(qs) -> float:
    """Worst orthogonality over a batch of tree-node Q factors
    (≙ multi_orthogonality, validation.cu:187-209)."""
    qs = np.asarray(qs, dtype=np.float64)
    return max(orthogonality(qs[i]) for i in range(qs.shape[0]))


def residual(a, q, r) -> float:
    """Relative residual ||A - QR||_F / ||A||_F, fp64 on host
    (≙ test.cu:147-165)."""
    a = np.asarray(a, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    return float(np.linalg.norm(a - q @ r) / np.linalg.norm(a))


def orthogonality_device(q: Array) -> Array:
    """On-device fp32 orthogonality (speed-harness variant)."""
    q = q.astype(jnp.float32)
    n = q.shape[1]
    g = jnp.matmul(q.T, q, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32) - jnp.eye(n)
    return jnp.linalg.norm(g) / jnp.sqrt(n)


def residual_device(a: Array, q: Array, r: Array) -> Array:
    """On-device fp32 relative residual (speed-harness variant)."""
    a = a.astype(jnp.float32)
    d = a - jnp.matmul(q.astype(jnp.float32), r.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    return jnp.linalg.norm(d) / jnp.linalg.norm(a)


def orthogonality_accurate(q) -> float:
    """Accurate orthogonality for huge m without host transfer of Q.

    A naive on-device fp32 Gram accumulates ~sqrt(m)*eps of *measurement*
    error (at m=2^22 that is ~3e-4 — swamping an fp32-grade Q); the
    Kahan-compensated streaming Gram kernel measures to ~1e-9.  Beyond
    the Pallas kernel's VMEM budget (n > 2048) the wide column-blocked
    XLA variant below takes over.  On non-TPU backends falls back to
    host fp64.
    """
    import jax

    if jax.devices()[0].platform == "tpu":
        import jax.numpy as jnp

        q = jnp.asarray(q)
        n = q.shape[1]
        if n > 2048:
            return float(orthogonality_wide_device(q))
        from tsqr_tpu.ops import pallas_gram
        g = pallas_gram.gram_pallas(q, "fp32", chunk=1024)
        return float(jnp.linalg.norm(g - jnp.eye(n)) / jnp.sqrt(n * 1.0))
    return orthogonality(q)


def orthogonality_wide_device(q: Array, col_block: int = 2048,
                              row_chunk: int = 8192) -> Array:
    """||Q^T Q - I||_F / sqrt(n) for n beyond VMEM-accumulator sizes.

    Column-blocked: for each block of columns, the (n, cb) Gram slab is
    accumulated over row chunks with Kahan compensation in plain XLA
    (carry 2 x (n, cb) f32 — bounded memory for any n), then its
    deviation from the identity slab is folded into a running squared
    norm.  Measurement error ~ eps * sqrt(row_chunk), independent of m.
    """
    from jax import lax

    # NO up-front astype: for bf16 Q that is a second full-size HBM copy
    # (OOM risk at capacity shapes — same rule as residual_device_chunked
    # below); each row chunk casts to f32 inside the loop instead, which
    # is numerically identical.
    m, n = q.shape
    cb = min(col_block, n)
    n_pad = -(-n // cb) * cb
    rc = min(row_chunk, m)
    m_pad = -(-m // rc) * rc
    if m_pad != m:
        q = jnp.pad(q, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))  # only last block ragged

    n_row_chunks = m_pad // rc

    def col_block_norm2(j, acc):
        c0 = j * cb

        def chunk(i, carry):
            g, comp = carry
            # dynamic_slice (not scan-over-reshaped-xs): XLA materializes
            # loop-owned copies of scan xs — OOM at large m (measured)
            qc = lax.dynamic_slice(q, (i * rc, 0),
                                   (rc, q.shape[1])).astype(jnp.float32)
            blk = lax.dynamic_slice(qc, (0, c0), (rc, cb))
            contrib = lax.dot_general(
                qc, blk, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)       # (n_pad, cb)
            y = contrib - comp
            t = g + y
            comp = (t - g) - y
            return t, comp

        z = jnp.zeros((q.shape[1], cb), jnp.float32)
        g, _ = lax.fori_loop(0, n_row_chunks, chunk, (z, z))
        rows = lax.broadcasted_iota(jnp.int32, g.shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, g.shape, 1) + c0
        eye = jnp.where(rows == cols, 1.0, 0.0)
        valid = (rows < n) & (cols < n)
        d = jnp.where(valid, g - eye, 0.0)
        return acc + jnp.sum(d * d)

    n_col_blocks = q.shape[1] // cb
    total = lax.fori_loop(0, n_col_blocks, col_block_norm2,
                          jnp.zeros((), jnp.float32))
    return jnp.sqrt(total) / jnp.sqrt(n * 1.0)


def residual_device_chunked(a: Array, q: Array, r: Array,
                            row_chunk: int = 4096) -> Array:
    """||A - QR||_F / ||A||_F on device with bounded memory (row-chunked
    scan; never materializes the full m x n difference).  Measurement
    noise ~ eps*sqrt(n) per entry — calibrated at 2^13 x 2^13 against
    host fp64: device 3.48e-7 vs host 2.82e-7 (same order; fine for the
    reference's 1e-6..6e-2 plot envelope)."""
    from jax import lax

    # NO up-front astype (a second full-size HBM copy — OOM at m=2^24),
    # and NO lax.scan over reshaped views (XLA materializes loop-owned
    # copies of the xs — measured OOM at m=2^24 with 7 GB headroom):
    # fori_loop + dynamic_slice reads the original buffers in place.
    r = r.astype(jnp.float32)
    m, n = a.shape
    rc = min(row_chunk, m)
    m_pad = -(-m // rc) * rc
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))
        q = jnp.pad(q, ((0, m_pad - m), (0, 0)))

    @jax.jit
    def run(a, q, r):
        def body(i, carry):
            d2, a2 = carry
            ac = lax.dynamic_slice(a, (i * rc, 0), (rc, n))
            qc = lax.dynamic_slice(q, (i * rc, 0), (rc, n))
            ac = ac.astype(jnp.float32)
            d = ac - jnp.matmul(qc.astype(jnp.float32), r,
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            return d2 + jnp.sum(d * d), a2 + jnp.sum(ac * ac)

        d2, a2 = lax.fori_loop(0, m_pad // rc, body,
                               (jnp.zeros((), jnp.float32),) * 2)
        return jnp.sqrt(d2) / jnp.sqrt(a2)

    return run(a, q, r)


def residual_regen_chunked(gen_chunk, q: Array, r: Array,
                           row_chunk: int) -> Array:
    """||A - QR||_F / ||A||_F where A's row-chunks are REGENERATED.

    For the in-place capacity pipelines (core/cholqr.fastqr_inplace) A's
    buffer no longer exists when metrics run — but test matrices are
    deterministic functions of PRNG keys, so ``gen_chunk(i) -> (rc, n)``
    re-derives chunk i bitwise instead of holding a second m x n buffer.
    Python loop over chunks (gen_chunk is host-side); accumulators stay
    on device.
    """
    m, n = q.shape
    assert m % row_chunk == 0, "row_chunk must divide m"
    r = r.astype(jnp.float32)

    @jax.jit
    def step(ac, qc, r, d2, a2):
        ac = ac.astype(jnp.float32)
        d = ac - jnp.matmul(qc.astype(jnp.float32), r,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        return d2 + jnp.sum(d * d), a2 + jnp.sum(ac * ac)

    d2 = jnp.zeros((), jnp.float32)
    a2 = jnp.zeros((), jnp.float32)
    for i in range(m // row_chunk):
        qc = jax.lax.dynamic_slice(q, (i * row_chunk, 0), (row_chunk, n))
        d2, a2 = step(gen_chunk(i), qc, r, d2, a2)
    return jnp.sqrt(d2) / jnp.sqrt(a2)


def exponent_distribution(x, name: str = "") -> dict[int, int]:
    """Histogram of binary exponents of the (finite, nonzero) elements
    (≙ exponent_distribution, validation.cu:18-40, 214-237 — used for the
    fp16-underflow studies; on TPU bf16 shares fp32's exponent range so
    this is a validation study, not a correctness gate)."""
    x = np.asarray(x, dtype=np.float32).ravel()
    x = x[np.isfinite(x) & (x != 0)]
    if x.size == 0:
        return {}
    exps = np.frexp(x)[1] - 1  # binary exponent
    vals, counts = np.unique(exps, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, counts)}
