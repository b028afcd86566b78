"""Spectral consumers (models/subspace.py): subspace iteration + Nystrom.

Goldens are numpy float64 eigendecompositions; subspace comparisons use
projector distance (eigenvectors are sign/rotation ambiguous)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.models import subspace


def _sym_op(n, spectrum, seed):
    rng = np.random.default_rng(seed)
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a64 = (v * spectrum) @ v.T
    a64 = (a64 + a64.T) / 2
    a = jnp.asarray(a64, jnp.float32)
    return a64, lambda x: a @ x


def test_subspace_iteration_top_eigenpairs():
    n, k = 512, 6
    spectrum = np.concatenate([np.array([10., 8., 6., 5., 4., 3.]),
                               np.linspace(1.0, 0.01, n - 6)])
    a64, mv = _sym_op(n, spectrum, 0)
    w, v, resid = subspace.subspace_iteration(
        mv, n, k, jax.random.PRNGKey(0), iters=30, return_resid=True)
    w_ref = np.linalg.eigvalsh(a64)[::-1][:k]
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4)
    vn = np.asarray(v, np.float64)
    # returned basis orthonormal; residuals small per pair
    assert np.linalg.norm(vn.T @ vn - np.eye(k)) / np.sqrt(k) < 1e-5
    assert np.all(np.asarray(resid) < 1e-2 * np.abs(w_ref))
    # projector distance to the true top-k invariant subspace
    v_ref = np.linalg.eigh(a64)[1][:, ::-1][:, :k]
    d = np.linalg.norm(vn @ vn.T - v_ref @ v_ref.T, 2)
    assert d < 1e-3, f"subspace distance {d}"


def test_subspace_iteration_signed_spectrum():
    # ordering is by |lambda|: a large NEGATIVE eigenvalue must be found
    n, k = 256, 3
    spectrum = np.concatenate([np.array([-9., 7., -5.]),
                               np.linspace(1.0, 0.01, n - 3)])
    a64, mv = _sym_op(n, spectrum, 1)
    w, _ = subspace.subspace_iteration(mv, n, k, jax.random.PRNGKey(1),
                                       iters=40)
    np.testing.assert_allclose(np.asarray(w), [-9., 7., -5.], rtol=1e-3)


def test_nystrom_near_best_rank_k():
    # Nystrom's eigenvalue bias scales with the TAIL nuclear norm, so
    # the contract test needs a sharply decaying spectrum (head well
    # above a light tail); heavy-tailed operators are subspace
    # iteration territory.
    n, rank = 512, 10
    spectrum = np.concatenate([np.logspace(0, -2, rank),
                               1e-6 * np.linspace(1.0, 0.1, n - rank)])
    a64, mv = _sym_op(n, spectrum, 2)
    u, lam = subspace.nystrom(mv, n, rank, jax.random.PRNGKey(2))
    un = np.asarray(u, np.float64)
    assert np.linalg.norm(un.T @ un - np.eye(rank)) / np.sqrt(rank) < 1e-5
    assert np.all(np.asarray(lam) >= 0)
    np.testing.assert_allclose(np.asarray(lam), spectrum[:rank],
                               rtol=1e-2)
    a_hat = (un * np.asarray(lam)) @ un.T
    err = np.linalg.norm(a64 - a_hat, 2)
    # near-best up to the f32 pipeline floor (~1e-4 * ||A|| at n=512:
    # matvec + whitening round-off — the tail itself is 1e-6)
    best = spectrum[rank]                      # best rank-k spectral err
    assert err < max(10 * best, 2e-4), f"nystrom err {err} vs {best}"
    # exactness on an exactly-rank-k operator (the Nystrom identity)
    v8 = np.linalg.qr(np.random.default_rng(7)
                      .standard_normal((n, 6)))[0]
    lam6 = np.array([5., 4., 3., 2., 1., 0.5])
    a6 = jnp.asarray((v8 * lam6) @ v8.T, jnp.float32)
    u6, l6 = subspace.nystrom(lambda x: a6 @ x, n, 6,
                              jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(l6), lam6, rtol=1e-4)
    u6n = np.asarray(u6, np.float64)
    err6 = np.linalg.norm(np.asarray(a6, np.float64)
                          - (u6n * np.asarray(l6)) @ u6n.T, 2)
    assert err6 < 1e-4


def test_nystrom_matrix_free_operator():
    # operator only available as matvec: tiny diagonal + low-rank
    # spikes, never densified (n=2048 dense would be fine here, but the
    # contract under test is that nystrom touches ONLY matvec)
    n, rank = 2048, 4
    rng = np.random.default_rng(3)
    z = jnp.asarray(np.linalg.qr(rng.standard_normal((n, 4)))[0],
                    jnp.float32)
    spikes = jnp.asarray([8.0, 6.0, 4.0, 2.0], jnp.float32)

    def mv(x):
        return 1e-5 * x + z @ (spikes[:, None] * (z.T @ x))

    u, lam = subspace.nystrom(mv, n, rank, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(lam),
                               np.asarray(spikes) + 1e-5, rtol=1e-3)
    # eigenvectors span the spike subspace
    un = np.asarray(u, np.float64)
    zn = np.asarray(z, np.float64)
    d = np.linalg.norm(un @ un.T - zn @ zn.T, 2)
    assert d < 1e-2, f"spike subspace distance {d}"


def test_subspace_and_nystrom_distributed_mesh():
    from tsqr_tpu.parallel import mesh as mesh_mod
    n, k = 512, 4
    spectrum = np.concatenate([np.array([12., 9., 7., 5.]),
                               np.linspace(1.0, 0.01, n - 4)])
    a64, _ = _sym_op(n, spectrum, 4)
    a = jnp.asarray(a64, jnp.float32)
    mesh = mesh_mod.make_mesh(8)

    def mv(x):
        return a @ x                          # GSPMD distributes

    w, v = subspace.subspace_iteration(mv, n, k, jax.random.PRNGKey(4),
                                       iters=30, mesh=mesh)
    w_loc, v_loc = subspace.subspace_iteration(
        mv, n, k, jax.random.PRNGKey(4), iters=30)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_loc),
                               rtol=1e-4)
    vn, vl = np.asarray(v, np.float64), np.asarray(v_loc, np.float64)
    assert np.linalg.norm(vn @ vn.T - vl @ vl.T, 2) < 1e-3

    spectrum_psd = np.concatenate([np.array([4., 3., 2., 1.]),
                                   1e-5 * np.ones(n - 4)])
    a64p, _ = _sym_op(n, spectrum_psd, 5)
    ap = jnp.asarray(a64p, jnp.float32)
    u, lam = subspace.nystrom(lambda x: ap @ x, n, k,
                              jax.random.PRNGKey(5), mesh=mesh)
    np.testing.assert_allclose(np.asarray(lam), spectrum_psd[:k],
                               rtol=1e-2)
