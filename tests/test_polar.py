"""Polar decomposition (models/polar.py): QDWH on the ladder QR.

Golden reference is the SVD-based polar (U = W V^T from A = W S V^T)
computed in numpy float64 — the polar factor of a full-column-rank A
is unique, so direct elementwise comparison is legitimate (no sign
normalization needed, unlike QR/SVD factors)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the package re-exports the polar FUNCTION under the same name as the
# submodule (flat API: models.polar(a)); import the module explicitly
import tsqr_tpu.models.polar  # noqa: F401  (registers the submodule)

from tsqr_tpu.utils import latms

polar_mod = sys.modules["tsqr_tpu.models.polar"]


def _polar_ref(a64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    w, s, vt = np.linalg.svd(a64, full_matrices=False)
    u = w @ vt
    h = (vt.T * s) @ vt
    return u, (h + h.T) / 2


def _check(a: np.ndarray, u, h, u_tol: float, fact_tol: float):
    un = np.asarray(u, np.float64)
    hn = np.asarray(h, np.float64)
    n = a.shape[1]
    orth = np.linalg.norm(un.T @ un - np.eye(n)) / np.sqrt(n)
    assert orth < u_tol, f"orthogonality {orth}"
    assert np.allclose(hn, hn.T)
    # H PSD up to round-off
    assert np.linalg.eigvalsh(hn).min() > -1e-5 * np.linalg.norm(hn, 2)
    resid = np.linalg.norm(a - un @ hn) / np.linalg.norm(a)
    assert resid < fact_tol, f"residual {resid}"


def test_polar_matches_svd_golden():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2048, 48)).astype(np.float32)
    u, h = polar_mod.polar(jnp.asarray(a))
    _check(a.astype(np.float64), u, h, 1e-6, 1e-6)
    u_ref, h_ref = _polar_ref(a.astype(np.float64))
    assert np.linalg.norm(np.asarray(u, np.float64) - u_ref) / \
        np.sqrt(a.shape[1]) < 1e-5
    np.testing.assert_allclose(np.asarray(h, np.float64), h_ref,
                               atol=1e-5 * np.linalg.norm(h_ref, 2))


def test_polar_nearest_orthogonal_factor():
    # A = Q_true H_true with H PSD well separated from singular:
    # polar must recover Q_true exactly (it IS the nearest orthogonal).
    rng = np.random.default_rng(1)
    q_true = np.linalg.qr(rng.standard_normal((1024, 32)))[0]
    b = rng.standard_normal((32, 32))
    h_true = b @ b.T + 32 * np.eye(32)
    a = (q_true @ h_true).astype(np.float32)
    u, h = polar_mod.polar(jnp.asarray(a))
    assert np.linalg.norm(np.asarray(u, np.float64) - q_true) / \
        np.sqrt(32) < 1e-5
    np.testing.assert_allclose(np.asarray(h, np.float64), h_true,
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("kappa", [1e2, 1e5])
def test_polar_ill_conditioned(kappa):
    # the ladder QR carries the kappa robustness; QDWH's weight
    # recurrence handles the rest — U stays orthogonal to f32 grade
    # across the spectrum range.
    m, n = 4096, 64
    s = jnp.linspace(1.0, 1.0 / kappa, n)
    a = latms.latms(jax.random.PRNGKey(2), m, n, s)
    # XLA ladder tiers (the fused Pallas tiers need the chip; n=64 is
    # inside the fused range so the CPU delegation doesn't kick in)
    u, h = polar_mod.polar(a, fast_method="cholqr2", mid_method="cholqr3")
    a64 = np.asarray(a, np.float64)
    _check(a64, u, h, 5e-6, 5e-6)
    u_ref, _ = _polar_ref(a64)
    # elementwise U agreement degrades with kappa (the polar factor's
    # sensitivity is ~2/(s_min+s_next) in each subspace) — check the
    # well-separated bulk via the factorization residual instead, and
    # the subspace distance overall.
    d = np.linalg.norm(np.asarray(u, np.float64) - u_ref, 2)
    assert d < 1e-6 * kappa, f"polar-factor distance {d} at kappa={kappa}"


def test_polar_fastqr_method_and_modes():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (1024, 32)).astype(np.float32)
    u, h = polar_mod.polar(jnp.asarray(a), "bf16x6_cor", method="cholqr3")
    _check(a.astype(np.float64), u, h, 5e-6, 5e-6)


def test_polar_distributed_mesh():
    from tsqr_tpu.parallel import mesh as mesh_mod
    rng = np.random.default_rng(4)
    a = rng.uniform(-1, 1, (2048, 24)).astype(np.float32)
    u_loc, h_loc = polar_mod.polar(jnp.asarray(a))
    mesh = mesh_mod.make_mesh(8)
    ax = jax.device_put(jnp.asarray(a), mesh_mod.row_sharding(mesh))
    u, h = polar_mod.polar(ax, mesh=mesh)
    _check(a.astype(np.float64), u, h, 1e-6, 1e-6)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_loc),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_loc),
                               atol=2e-4 * float(jnp.linalg.norm(h_loc)))


def test_polar_wide_raises():
    with pytest.raises(ValueError):
        polar_mod.polar(jnp.ones((8, 16)))


def test_procrustes_recovers_rotation():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((4096, 24)).astype(np.float32)
    om_true = np.linalg.qr(rng.standard_normal((24, 24)))[0]
    b = (a @ om_true + 1e-4 * rng.standard_normal((4096, 24))).astype(
        np.float32)
    om = polar_mod.procrustes(jnp.asarray(a), jnp.asarray(b))
    omn = np.asarray(om, np.float64)
    assert np.linalg.norm(omn.T @ omn - np.eye(24)) / np.sqrt(24) < 1e-6
    assert np.linalg.norm(omn - om_true) / np.sqrt(24) < 1e-3

    with pytest.raises(ValueError):
        polar_mod.procrustes(jnp.ones((8, 4)), jnp.ones((8, 5)))


def test_procrustes_deficient_rank_contract():
    # kappa(A^T B) ~ kappa(A)^2: below the f32 noise floor the rotation
    # is unidentifiable in the noise subspace — the documented contract
    # is that the OBJECTIVE is still minimized to working precision
    # while Omega may come back a partial isometry there (detectable
    # via Omega^T Omega).  The well-conditioned case (above) recovers
    # Omega elementwise; this pins the degenerate behavior.
    rng = np.random.default_rng(6)
    u0 = np.linalg.qr(rng.standard_normal((2048, 32)))[0]
    v0 = np.linalg.qr(rng.standard_normal((32, 32)))[0]
    a64 = (u0 * np.logspace(0, -5, 32)) @ v0.T   # kappa = 1e5
    om_true = np.linalg.qr(rng.standard_normal((32, 32)))[0]
    b64 = a64 @ om_true
    om = np.asarray(polar_mod.procrustes(
        jnp.asarray(a64, jnp.float32), jnp.asarray(b64, jnp.float32)),
        np.float64)
    obj = np.linalg.norm(a64 @ om - b64) / np.linalg.norm(b64)
    assert obj < 1e-3, f"objective {obj}"
