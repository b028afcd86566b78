"""QR updating tests (core/update.py).

Contract under test: each update of A = Q R reproduces the direct
factorization of the modified matrix — same residual/orthogonality
grade as a fresh library QR — at small-core + GEMM cost, and composes
with jit / AD like any other entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import blockqr, update
from tsqr_tpu.utils import validation


def _rand(m, n, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .uniform(-1, 1, (m, n)).astype(np.float32))


def _assert_factorization(a, q, r, orth_tol=1e-5, resid_tol=1e-5):
    a64 = np.asarray(a, np.float64)
    q64 = np.asarray(q, np.float64)
    r64 = np.asarray(r, np.float64)
    assert validation.orthogonality(q64) < orth_tol
    assert validation.residual(a64, q64, r64) < resid_tol
    np.testing.assert_allclose(np.triu(r64), r64)


def test_append_rows_matches_direct():
    a, b = _rand(512, 48), _rand(96, 48, seed=1)
    q, r = blockqr.qr(a, "fp32")
    q2, r2 = update.qr_append_rows(q, r, b)
    assert q2.shape == (608, 48) and r2.shape == (48, 48)
    _assert_factorization(jnp.concatenate([a, b]), q2, r2)


def test_append_rows_streaming_chain():
    # the online story: three arriving blocks == one factorization
    blocks = [_rand(256, 32, seed=s) for s in range(3)]
    q, r = blockqr.qr(blocks[0], "fp32")
    for b in blocks[1:]:
        q, r = update.qr_append_rows(q, r, b)
    _assert_factorization(jnp.concatenate(blocks), q, r)


def test_append_cols_matches_direct():
    a, b = _rand(512, 40), _rand(512, 24, seed=2)
    q, r = blockqr.qr(a, "fp32")
    q2, r2 = update.qr_append_cols(q, r, b)
    assert q2.shape == (512, 64) and r2.shape == (64, 64)
    _assert_factorization(jnp.concatenate([a, b], axis=1), q2, r2)
    # the top-left block of R' IS R (append never rewrites history)
    np.testing.assert_allclose(np.asarray(r2)[:40, :40], np.asarray(r))


def test_append_cols_reorth_on_correlated_block():
    # new columns nearly parallel to existing ones: CGS2 keeps Q'
    # orthogonal where the single-pass projection drifts
    a = _rand(2048, 32)
    b = a[:, :16] + 1e-4 * _rand(2048, 16, seed=3)
    q, r = blockqr.qr(a, "fp32")
    q1, _ = update.qr_append_cols(q, r, b, reorth=False)
    q2, r2 = update.qr_append_cols(q, r, b, reorth=True)
    o1 = validation.orthogonality(np.asarray(q1, np.float64))
    o2 = validation.orthogonality(np.asarray(q2, np.float64))
    assert o2 < 1e-5
    assert o2 <= o1
    _assert_factorization(jnp.concatenate([a, b], axis=1), q2, r2,
                          resid_tol=1e-4)


@pytest.mark.parametrize("idx", [0, 17, (3, 0, 30), (31,)])
def test_delete_cols_matches_direct(idx):
    a = _rand(384, 32, seed=4)
    q, r = blockqr.qr(a, "fp32")
    q2, r2 = update.qr_delete_cols(q, r, idx)
    drop = {idx} if isinstance(idx, int) else set(idx)
    keep = [j for j in range(32) if j not in drop]
    _assert_factorization(a[:, jnp.asarray(keep)], q2, r2)
    assert q2.shape == (384, len(keep))


def test_delete_cols_rejects_bad_idx():
    q, r = blockqr.qr(_rand(64, 8), "fp32")
    with pytest.raises(ValueError):
        update.qr_delete_cols(q, r, 8)
    with pytest.raises(ValueError):
        update.qr_delete_cols(q, r, tuple(range(8)))


@pytest.mark.parametrize("polish", [False, True])
def test_delete_rows_matches_direct(polish):
    a = _rand(512, 48, seed=5)
    q, r = blockqr.qr(a, "fp32")
    q2, r2 = update.qr_delete_rows(q, r, 128, polish=polish)
    assert q2.shape == (384, 48)
    _assert_factorization(a[128:], q2, r2,
                          orth_tol=1e-5 if polish else 1e-4)


def test_delete_rows_nans_when_kept_rows_lose_rank():
    # dropped rows carry ALL the mass of column 0's direction: the
    # downdated Gram is singular; the contract is NaN, not fabrication
    a = np.array(_rand(256, 16, seed=6))
    a[4:, 0] = 0.0  # only the first rows see e_0
    a[:4, 1:] = 0.0
    q, r = blockqr.qr(jnp.asarray(a), "fp32")
    q2, _ = update.qr_delete_rows(q, r, 4)
    assert not np.isfinite(np.asarray(q2)).all()


def test_rank_update_matches_direct():
    a = _rand(512, 48, seed=7)
    u, v = _rand(512, 4, seed=8), _rand(48, 4, seed=9)
    q, r = blockqr.qr(a, "fp32")
    q2, r2 = update.qr_rank_update(q, r, u, v)
    _assert_factorization(a + u @ v.T, q2, r2)


def test_rank_update_roundtrip_downdate():
    # update then downdate with -u returns to the original matrix
    a = _rand(384, 32, seed=10)
    u, v = _rand(384, 2, seed=11), _rand(32, 2, seed=12)
    q, r = blockqr.qr(a, "fp32")
    q1, r1 = update.qr_rank_update(q, r, u, v)
    q2, r2 = update.qr_rank_update(q1, r1, -u, v)
    _assert_factorization(a, q2, r2)


def test_updates_jit_and_shapes_are_static():
    a, b = _rand(256, 16), _rand(32, 16, seed=13)
    q, r = blockqr.qr(a, "fp32")
    q2, r2 = jax.jit(update.qr_append_rows)(q, r, b)
    _assert_factorization(jnp.concatenate([a, b]), q2, r2)
    # delete the first 32 rows of the stack under jit
    q3, r3 = jax.jit(lambda q_, r_: update.qr_delete_rows(q_, r_, 32))(q2, r2)
    _assert_factorization(jnp.concatenate([a, b])[32:], q3, r3)


def test_append_rows_is_differentiable():
    a, b = _rand(128, 8), _rand(16, 8, seed=14)
    q, r = blockqr.qr(a, "fp32")

    def loss(b_):
        q2, r2 = update.qr_append_rows(q, r, b_)
        return jnp.sum(q2 ** 2) + jnp.sum(jnp.abs(r2))

    g = jax.grad(loss)(b)
    assert np.isfinite(np.asarray(g)).all()
    # directional FD check
    d = _rand(16, 8, seed=15)
    eps = 1e-3
    fd = (loss(b + eps * d) - loss(b - eps * d)) / (2 * eps)
    an = jnp.vdot(g, d)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(an),
                               rtol=2e-2, atol=2e-3)


def test_corrected_mode_grade():
    # bf16x6_cor updates land on the corrected-mode orthogonality grade
    a, b = _rand(1024, 32), _rand(128, 32, seed=16)
    q, r = blockqr.qr(a, "bf16x6_cor")
    q2, r2 = update.qr_append_rows(q, r, b, "bf16x6_cor")
    _assert_factorization(jnp.concatenate([a, b]), q2, r2,
                          orth_tol=5e-5, resid_tol=5e-5)


def test_wide_contracts():
    q, r = blockqr.qr(_rand(64, 60), "fp32")
    with pytest.raises(ValueError):
        update.qr_append_cols(q, r, _rand(64, 8, seed=17))
    with pytest.raises(ValueError):
        update.qr_delete_rows(q, r, 8)
