"""CCA consumer (models/cca.py): Björck–Golub via the library QR.

Goldens are float64 numpy implementations of the same algorithm;
correlations are basis-invariant so they compare directly (weights are
only pinned through the variates they produce)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the package re-exports the cca FUNCTION under the same name as the
# submodule (flat API: models.cca(x, y)); import the module explicitly
import tsqr_tpu.models.cca  # noqa: F401  (registers the submodule)

cca_mod = sys.modules["tsqr_tpu.models.cca"]


def _views(m, p, q, seed, shared=2, noise=0.1):
    """Two views sharing `shared` latent directions."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((m, shared))
    x = np.c_[z + noise * rng.standard_normal((m, shared)),
              rng.standard_normal((m, p - shared))]
    y = np.c_[z + noise * rng.standard_normal((m, shared)),
              rng.standard_normal((m, q - shared))]
    return x.astype(np.float64), y.astype(np.float64)


def _cca64(x, y):
    qx, _ = np.linalg.qr(x)
    qy, _ = np.linalg.qr(y)
    s = np.linalg.svd(qx.T @ qy, compute_uv=False)
    return np.clip(s, 0.0, 1.0)


def test_cca_matches_float64_golden():
    x64, y64 = _views(4096, 24, 16, 0)
    corrs, wx, wy = cca_mod.cca(jnp.asarray(x64, jnp.float32),
                                jnp.asarray(y64, jnp.float32))
    ref = _cca64(x64, y64)
    np.testing.assert_allclose(np.asarray(corrs), ref, atol=2e-5)
    # variates: unit columns, cross-correlation diag(corrs)
    u = x64 @ np.asarray(wx, np.float64)
    v = y64 @ np.asarray(wy, np.float64)
    np.testing.assert_allclose(np.linalg.norm(u, axis=0),
                               np.ones(16), atol=1e-4)
    np.testing.assert_allclose(u.T @ v, np.diag(ref), atol=1e-4)


def test_cca_planted_shared_directions():
    # two shared latents at low noise -> two near-1 correlations, the
    # rest near the random-correlation floor
    x64, y64 = _views(8192, 12, 10, 1, shared=2, noise=0.05)
    corrs, _, _ = cca_mod.cca(jnp.asarray(x64, jnp.float32),
                              jnp.asarray(y64, jnp.float32), center=True)
    c = np.asarray(corrs)
    assert np.all(c[:2] > 0.99)
    assert np.all(c[2:] < 0.2)
    assert np.all(np.diff(c) <= 1e-6)          # descending


def test_cca_invariant_to_view_basis():
    # CCA is invariant under invertible transforms of each view
    x64, y64 = _views(2048, 10, 8, 2)
    rng = np.random.default_rng(3)
    tx = rng.standard_normal((10, 10)) + 3 * np.eye(10)
    ty = rng.standard_normal((8, 8)) + 3 * np.eye(8)
    c1, _, _ = cca_mod.cca(jnp.asarray(x64, jnp.float32),
                           jnp.asarray(y64, jnp.float32))
    c2, _, _ = cca_mod.cca(jnp.asarray(x64 @ tx, jnp.float32),
                           jnp.asarray(y64 @ ty, jnp.float32))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=5e-4)


def test_cca_corrected_mode_grade():
    x64, y64 = _views(16384, 16, 16, 4)
    x, y = jnp.asarray(x64, jnp.float32), jnp.asarray(y64, jnp.float32)
    ref = _cca64(x64, y64)
    c_cor, _, _ = cca_mod.cca(x, y, mode="bf16x6_cor")
    np.testing.assert_allclose(np.asarray(c_cor), ref, atol=5e-5)


def test_cca_jit_and_grad():
    x64, y64 = _views(1024, 8, 6, 5)
    x, y = jnp.asarray(x64, jnp.float32), jnp.asarray(y64, jnp.float32)

    @jax.jit
    def top_corr(x):
        return cca_mod.cca(x, y, rank=3)[0].sum()

    g = jax.grad(top_corr)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # FD directional-derivative check through QR + SVD + solves
    rng = np.random.default_rng(6)
    d = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    d = d / jnp.linalg.norm(d)
    eps = 1e-2
    fd = (top_corr(x + eps * d) - top_corr(x - eps * d)) / (2 * eps)
    an = jnp.vdot(g, d)
    np.testing.assert_allclose(float(an), float(fd), rtol=5e-2, atol=1e-4)


def test_cca_distributed_mesh_matches_local():
    from tsqr_tpu.parallel import mesh as mesh_mod
    x64, y64 = _views(2048, 12, 8, 7)
    x, y = jnp.asarray(x64, jnp.float32), jnp.asarray(y64, jnp.float32)
    mesh = mesh_mod.make_mesh(8)
    c_d, wx_d, wy_d = cca_mod.cca(x, y, mesh=mesh)
    c_l, _, _ = cca_mod.cca(x, y)
    np.testing.assert_allclose(np.asarray(c_d), np.asarray(c_l),
                               atol=5e-5)
    u = x64 @ np.asarray(wx_d, np.float64)
    v = y64 @ np.asarray(wy_d, np.float64)
    np.testing.assert_allclose(u.T @ v, np.diag(np.asarray(c_d)),
                               atol=1e-4)


def test_cca_shape_errors():
    x = jnp.zeros((64, 4))
    y = jnp.zeros((32, 4))
    with pytest.raises(ValueError):
        cca_mod.cca(x, y)


def test_cca_method_routes_agree():
    # the compact pure-GEMM and ladder routes must match the tree route
    # (added when the two-inline-tree program hit a remote-compile
    # request-size cap on the tunneled TPU — the cholqr2 route is the
    # one-compact-program alternative)
    x64, y64 = _views(4096, 16, 12, 9)
    x, y = jnp.asarray(x64, jnp.float32), jnp.asarray(y64, jnp.float32)
    c_t, _, _ = cca_mod.cca(x, y)
    for method in ("cholqr2", "auto"):
        c_m, wx, wy = cca_mod.cca(x, y, method=method)
        np.testing.assert_allclose(np.asarray(c_m), np.asarray(c_t),
                                   atol=1e-5)
        u = x64 @ np.asarray(wx, np.float64)
        v = y64 @ np.asarray(wy, np.float64)
        np.testing.assert_allclose(u.T @ v, np.diag(np.asarray(c_m)),
                                   atol=1e-4)
