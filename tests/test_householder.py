"""Panel-QR correctness vs numpy fp64 golden (≙ the reference's accuracy
gates, test.cu:147-166, applied at the tcqr layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.ops import householder
from tsqr_tpu.utils import validation


SHAPES = [(32, 16), (8, 8), (64, 16), (256, 128), (100, 37), (16, 1)]


@pytest.mark.parametrize("shape", SHAPES)
def test_householder_qr_fp32(shape):
    m, n = shape
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, size=(m, n)).astype(np.float32)
    q, r = jax.jit(householder.householder_qr)(a)
    q, r = np.asarray(q), np.asarray(r)
    assert q.shape == (m, n) and r.shape == (n, n)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("block", [4, 8, 32])
def test_blocked_householder_qr_fp32(shape, block):
    m, n = shape
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, size=(m, n)).astype(np.float32)
    q, r = jax.jit(lambda x: householder.blocked_householder_qr(x, block=block))(a)
    q, r = np.asarray(q), np.asarray(r)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_blocked_matches_unblocked():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, size=(96, 24)).astype(np.float32)
    q1, r1 = householder.householder_qr(jnp.asarray(a))
    q2, r2 = householder.blocked_householder_qr(jnp.asarray(a), block=8)
    # same sign convention -> should agree to fp32 roundoff
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=0, atol=1e-4)


def test_matches_numpy_qr_up_to_sign():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, size=(64, 16)).astype(np.float32)
    q, r = householder.blocked_householder_qr(jnp.asarray(a))
    q, r = householder.qr_sign_normalize(q, r)
    qn, rn = np.linalg.qr(a.astype(np.float64))
    s = np.sign(np.diag(rn))
    qn, rn = qn * s[None, :], rn * s[:, None]
    np.testing.assert_allclose(np.asarray(r), rn, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), qn, rtol=0, atol=1e-4)


def test_zero_column_no_nan():
    a = np.zeros((32, 8), np.float32)
    a[:, 0] = 1.0
    q, r = householder.blocked_householder_qr(jnp.asarray(a))
    assert np.isfinite(np.asarray(q)).all()
    assert np.isfinite(np.asarray(r)).all()
    assert validation.residual(a, np.asarray(q), np.asarray(r)) < 1e-6


def test_rank_deficient_residual():
    rng = np.random.default_rng(4)
    base = rng.uniform(-1, 1, size=(64, 4)).astype(np.float32)
    a = np.concatenate([base, base[:, :2] * 3.0, base], axis=1)  # rank 4
    q, r = householder.blocked_householder_qr(jnp.asarray(a))
    assert validation.residual(a, np.asarray(q), np.asarray(r)) < 1e-5
