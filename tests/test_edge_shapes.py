"""Edge-shape sweep: degenerate and ragged (m, n) through every entry.

The reference fixes n=16 panels and powers-of-two m; this library
accepts any m >= n, so the contract at the awkward end (n=1, m=n,
near-square, sub-tile sizes) is pinned here.  The ladder rows stop at
n < 64 on CPU: its fused tiers compile Pallas kernels, which are
TPU-only by design (interpret mode exists for debugging, and n >= 64
is the fused-kernel range — see cholqr.fastqr's delegation note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.core.auto import qr_auto_fused

SHAPES = [(1, 1), (2, 1), (8, 3), (9, 9), (17, 5), (100, 1),
          (129, 100), (257, 255)]


@pytest.mark.parametrize("m,n", SHAPES)
def test_edge_shapes_all_entries(m, n):
    rng = np.random.default_rng(m * 1000 + n)
    a = jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))
    entries = [
        ("fastqr2", lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")),
        ("blockqr", lambda x: blockqr.qr(x, "fp32")),
        ("tsqr", lambda x: tsqr_mod.tsqr(x, "fp32")),
    ]
    if n < 64 or jax.default_backend() == "tpu":
        entries.append(("ladder", lambda x: qr_auto_fused(x, "fp32")))
    for name, fn in entries:
        q, r = fn(a)
        assert q.shape == (m, n) and r.shape == (n, n), name
        qn = np.asarray(q, np.float64)
        rn = np.asarray(r, np.float64)
        an = np.asarray(a, np.float64)
        resid = (np.linalg.norm(an - qn @ rn)
                 / max(np.linalg.norm(an), 1e-30))
        orth = np.linalg.norm(qn.T @ qn - np.eye(n)) / np.sqrt(n)
        tol = 1e-7 * max(32, n)  # fp32 QR error grows ~n*eps
        assert resid < tol, (name, m, n, resid)
        assert orth < tol, (name, m, n, orth)
        # R upper triangular exactly
        assert np.allclose(rn, np.triu(rn)), (name, m, n)


def test_m_less_than_n_raises():
    a = jnp.zeros((3, 5), jnp.float32)
    for fn in [lambda x: blockqr.qr(x, "fp32"),
               lambda x: cholqr.fastqr(x, "fp32")]:
        with pytest.raises(ValueError):
            fn(a)
