"""Deterministic thin SVD via QR (tall-skinny, exact to working precision).

No reference analogue — the reference stops at QR; this is the standard
QR-based thin SVD that makes the library's factorization directly usable
for spectra/pseudo-inverses: A = Q R, R = U_r diag(s) V^T (an (n, n)
problem), U = Q U_r.  All m-scale work is the QR fast path plus one GEMM,
so it inherits the MXU-native performance and the mixed-precision modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import cholqr

Array = jax.Array


def tsqr_svd(a: Array,
             mode: modes.ComputeMode | str = "fp32",
             method: str = "cholqr3", mesh=None) -> tuple[Array, Array,
                                                          Array]:
    """Thin SVD of a tall-skinny (m, n): returns (U (m, n), s (n,),
    Vt (n, n)) with A = U diag(s) Vt.

    The small SVD runs on the (n, n) R factor in fp32 (jnp.linalg.svd);
    accuracy of the singular values is limited by the QR residual, i.e.
    the selected mode's grade.

    ``mesh``: row-shard A over a `parallel.mesh` Mesh to run multi-chip
    — the QR goes through the distributed self-validating ladder and
    the (n, n) SVD + U = Q U_r update stay local per shard."""
    m, n = a.shape
    if m < n:
        raise ValueError(f"tsqr_svd requires m >= n, got {a.shape}")
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        q, r = dtsqr.dqr_auto(a, mesh, mode)
    else:
        q, r = cholqr.fastqr(a, mode, method=method)
    ur, s, vt = jnp.linalg.svd(r.astype(jnp.float32), full_matrices=False)
    u = modes.mm_fp32(q.astype(jnp.float32), ur)
    return u, s, vt
