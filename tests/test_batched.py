"""Batched QR via jax.vmap (≙ mtk::tcqr::qr32x16_batched, tcqr.hpp:30-37,
lifted to the whole library).

The reference exposes batching only at the panel-kernel level; here
every entry point batches through ``jax.vmap`` — the XLA paths
(matmuls, Cholesky, triangular solves, the ladder's cond/while_loop)
all carry batching rules, and the custom_jvp AD rule is transparent to
vmap, so ``vmap(grad(...))`` composes too.  These tests pin that
contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.core.auto import qr_auto_fused


def _batch(b=4, m=256, n=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (b, m, n)).astype(np.float32))


@pytest.mark.parametrize("name,fn", [
    ("fastqr_cholqr2",
     lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")),
    ("fastqr_cholqr3_cor",
     lambda x: cholqr.fastqr(x, "bf16x6_cor", method="cholqr3")),
    ("tsqr", lambda x: tsqr_mod.tsqr(x, "fp32", leaf_rows=64)),
    ("blockqr", lambda x: blockqr.qr(x, "fp32")),
    ("ladder", lambda x: qr_auto_fused(x, "fp32")),
])
def test_vmap_qr(name, fn):
    ab = _batch()
    q, r = jax.vmap(fn)(ab)
    assert q.shape == ab.shape and r.shape == (4, 16, 16)
    for i in range(ab.shape[0]):
        qn = np.asarray(q[i], np.float64)
        rn = np.asarray(r[i], np.float64)
        an = np.asarray(ab[i], np.float64)
        resid = np.linalg.norm(an - qn @ rn) / np.linalg.norm(an)
        orth = np.linalg.norm(qn.T @ qn - np.eye(16)) / np.sqrt(16)
        assert resid < 1e-6, (name, i, resid)
        assert orth < 1e-6, (name, i, orth)


def test_vmap_matches_loop():
    ab = _batch(seed=1)
    fn = lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")
    qv, rv = jax.vmap(fn)(ab)
    for i in range(ab.shape[0]):
        qi, ri = fn(ab[i])
        np.testing.assert_allclose(np.asarray(rv[i]), np.asarray(ri),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(qv[i]), np.asarray(qi),
                                   rtol=1e-4, atol=1e-5)


def test_vmap_grad_composes():
    ab = _batch(seed=2)
    loss = lambda x: jnp.sum(cholqr.fastqr(x, "fp32", method="cholqr2")[1])
    gv = jax.vmap(jax.grad(loss))(ab)
    assert gv.shape == ab.shape
    for i in range(ab.shape[0]):
        gi = jax.grad(loss)(ab[i])
        np.testing.assert_allclose(np.asarray(gv[i]), np.asarray(gi),
                                   rtol=1e-4, atol=1e-6)
