"""Ridge least squares, matrix-free preconditioned CGLS, and the
skeleton factorizations (interpolative / CUR).

Contracts under test:
  * lstsq(ridge=λ) solves the Tikhonov problem through the stacked
    small QR — matches the float64 closed form, never forms A^T A.
  * lstsq_cgls converges in a kappa-INDEPENDENT number of iterations
    when sketch-preconditioned (the Blendenpik/LSRN property) and
    stalls without the preconditioner at the same kappa.
  * interpolative/cur reconstruct exactly-rank-k inputs to eps grade
    and track the spectral tail on decaying spectra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.models import cur, interpolative, lstsq, lstsq_cgls
from tsqr_tpu.utils import latms


def _cond_matrix(m, n, kappa, seed=0):
    key = jax.random.PRNGKey(seed)
    a, measured = latms.rand_matrix_with_cond(key, m, n, kappa)
    assert measured > 0.9 * kappa
    return a


def _rank_k(m, n, k, seed=0, decay=None):
    rng = np.random.default_rng(seed)
    u = np.linalg.qr(rng.standard_normal((m, max(k, 1))))[0]
    v = np.linalg.qr(rng.standard_normal((n, max(k, 1))))[0]
    s = np.ones(k) if decay is None else decay ** np.arange(k)
    return jnp.asarray((u[:, :k] * s) @ v[:, :k].T, jnp.float32)


# ---- ridge ------------------------------------------------------------------

def test_ridge_matches_closed_form():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (512, 24)).astype(np.float32)
    b = rng.uniform(-1, 1, 512).astype(np.float32)
    lam = 0.37
    x = np.asarray(lstsq(jnp.asarray(a), jnp.asarray(b), ridge=lam))
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    x64 = np.linalg.solve(a64.T @ a64 + lam * np.eye(24), a64.T @ b64)
    np.testing.assert_allclose(x, x64, rtol=0, atol=1e-4)


def test_ridge_zero_is_plain_lstsq_and_shrinks():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (256, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    x0 = lstsq(a, b)
    x0r = lstsq(a, b, ridge=0.0)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x0r))
    # monotone shrinkage in the penalty
    norms = [float(jnp.linalg.norm(lstsq(a, b, ridge=lam)))
             for lam in (0.0, 1.0, 100.0)]
    assert norms[0] > norms[1] > norms[2]
    with pytest.raises(ValueError, match="ridge"):
        lstsq(a, b, ridge=-1.0)


def test_ridge_regularizes_an_ill_conditioned_system():
    # at kappa = 1e6 the unregularized f32 solve is noise-dominated;
    # ridge makes the answer stable and match the float64 ridge solution
    a = _cond_matrix(2048, 32, 1e6, seed=2)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.uniform(-1, 1, 2048).astype(np.float32))
    lam = 1e-2
    x = np.asarray(lstsq(a, b, ridge=lam))
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    x64 = np.linalg.solve(a64.T @ a64 + lam * np.eye(32), a64.T @ b64)
    assert np.linalg.norm(x - x64) / np.linalg.norm(x64) < 1e-3


# ---- matrix-free preconditioned CGLS ---------------------------------------

def _ops(a):
    a32 = jnp.asarray(a, jnp.float32)
    return (lambda x: a32 @ x), (lambda y: a32.T @ y)


def _resid_excess(a, b, x):
    """Achieved residual over the float64 optimum, relative: r/r* - 1."""
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    x64 = np.linalg.lstsq(a64, b64, rcond=None)[0]
    r_opt = np.linalg.norm(a64 @ x64 - b64)
    r_got = np.linalg.norm(a64 @ np.asarray(x, np.float64) - b64)
    return r_got / r_opt - 1


def test_cgls_preconditioned_is_kappa_independent():
    # the defining property: bounded iteration count AND near-optimal
    # residual from kappa=1e2 to kappa=1e6 with the sketch
    # preconditioner (measured: 65/34 iters, excess 6e-14 / 1.7e-5 —
    # high kappa stops EARLIER because its f32 gradient floor is
    # higher and the divergence guard fires sooner)
    for kappa, excess_tol in ((1e2, 1e-6), (1e6, 1e-3)):
        a = _cond_matrix(4096, 48, kappa, seed=4)
        rng = np.random.default_rng(5)
        b = jnp.asarray(rng.uniform(-1, 1, 4096).astype(np.float32))
        mv, rmv = _ops(a)
        x, info = lstsq_cgls(mv, rmv, b, 48, key=jax.random.PRNGKey(0),
                             tol=1e-6, max_iters=100)
        assert int(info["iters"]) <= 80, kappa
        assert _resid_excess(a, b, x) < excess_tol, kappa


def test_cgls_unpreconditioned_is_much_worse():
    # same system, no preconditioner: CG sees kappa^2 = 1e8; in 100
    # iterations it cannot reach the residual grade the preconditioned
    # run gets in ~44 (measured excess: 1.7e-4 vs 2.2e-9)
    a = _cond_matrix(4096, 48, 1e4, seed=4)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.uniform(-1, 1, 4096).astype(np.float32))
    mv, rmv = _ops(a)
    x_un, info_un = lstsq_cgls(mv, rmv, b, 48, key=None,
                               tol=1e-6, max_iters=100)
    x_pre, _ = lstsq_cgls(mv, rmv, b, 48, key=jax.random.PRNGKey(0),
                          tol=1e-6, max_iters=100)
    ex_un = _resid_excess(a, b, x_un)
    ex_pre = _resid_excess(a, b, x_pre)
    assert float(jnp.max(info_un["grad_rel"])) > 1e-6  # tol unreached
    assert ex_un > 100 * max(ex_pre, 1e-12), (ex_un, ex_pre)


def test_cgls_exact_preconditioner_converges_fast():
    # r_precond = the true R makes Ahat orthonormal to ~eps*kappa: the
    # floor is hit in ~1 step and the divergence guard ends the loop
    # shortly after (measured 16 iters, excess 4.6e-10)
    a = _cond_matrix(2048, 32, 1e4, seed=6)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.uniform(-1, 1, (2048, 2)).astype(np.float32))
    r_true = jnp.linalg.qr(a, mode="r")
    mv, rmv = _ops(a)
    x, info = lstsq_cgls(mv, rmv, b, 32, r_precond=r_true,
                         tol=1e-5, max_iters=100)
    assert int(info["iters"]) <= 30
    assert _resid_excess(a, b, x) < 1e-6


def test_cgls_multi_rhs_and_shapes():
    rng = np.random.default_rng(8)
    a = rng.uniform(-1, 1, (1024, 16)).astype(np.float32)
    b1 = jnp.asarray(rng.uniform(-1, 1, 1024).astype(np.float32))
    bk = jnp.asarray(rng.uniform(-1, 1, (1024, 4)).astype(np.float32))
    mv, rmv = _ops(a)
    key = jax.random.PRNGKey(1)
    x1, _ = lstsq_cgls(mv, rmv, b1, 16, key=key)
    xk, _ = lstsq_cgls(mv, rmv, bk, 16, key=key)
    assert x1.shape == (16,) and xk.shape == (16, 4)
    x64 = np.linalg.lstsq(a.astype(np.float64),
                          np.asarray(b1, np.float64), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x1), x64, rtol=0, atol=1e-4)


# ---- interpolative / CUR ----------------------------------------------------

def test_interpolative_exact_rank_k():
    k = 6
    a = _rank_k(1024, 64, k, seed=9)
    cols, coeff, diag_b = interpolative(a, jax.random.PRNGKey(0), k)
    an = np.asarray(a, np.float64)
    rec = an[:, np.asarray(cols)] @ np.asarray(coeff, np.float64)
    assert np.linalg.norm(rec - an) / np.linalg.norm(an) < 1e-4
    # skeleton columns reproduce exactly: coeff[:, cols] == I_k
    np.testing.assert_allclose(np.asarray(coeff)[:, np.asarray(cols)],
                               np.eye(k), rtol=0, atol=1e-5)
    # the rank signal drops after k
    db = np.asarray(diag_b)
    assert db[k] < 1e-4 * db[0]


def test_interpolative_decaying_spectrum_tracks_tail():
    k = 10
    a = _rank_k(2048, 96, 40, seed=10, decay=0.5)
    cols, coeff, _ = interpolative(a, jax.random.PRNGKey(1), k)
    an = np.asarray(a, np.float64)
    rec = an[:, np.asarray(cols)] @ np.asarray(coeff, np.float64)
    rel = np.linalg.norm(rec - an) / np.linalg.norm(an)
    # sigma_{k+1}/sigma_1 = 2^-10 ~ 1e-3; ID constants are loose
    assert rel < 3e-2, rel
    assert len(set(np.asarray(cols).tolist())) == k  # distinct pivots


def test_cur_exact_rank_k():
    k = 5
    a = _rank_k(768, 48, k, seed=11)
    cols, u, rows = cur(a, jax.random.PRNGKey(2), k)
    an = np.asarray(a, np.float64)
    rec = (an[:, np.asarray(cols)] @ np.asarray(u, np.float64)
           @ an[np.asarray(rows), :])
    assert np.linalg.norm(rec - an) / np.linalg.norm(an) < 1e-4


def test_cur_decaying_spectrum():
    k = 12
    a = _rank_k(1024, 80, 40, seed=12, decay=0.6)
    cols, u, rows = cur(a, jax.random.PRNGKey(3), k)
    an = np.asarray(a, np.float64)
    rec = (an[:, np.asarray(cols)] @ np.asarray(u, np.float64)
           @ an[np.asarray(rows), :])
    rel = np.linalg.norm(rec - an) / np.linalg.norm(an)
    # sigma_{k+1}/sigma_1 = 0.6^12 ~ 2e-3; CUR constants are looser
    # than ID (two skeletons + the coupling solve)
    assert rel < 5e-2, rel


def test_skeleton_error_contracts():
    a = jnp.ones((64, 32), jnp.float32)
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="interpolative"):
        interpolative(a, key, 0)
    with pytest.raises(ValueError, match="interpolative"):
        interpolative(a, key, 33)
    with pytest.raises(ValueError, match="cur"):
        cur(a, key, 40)
