"""Application-model tests: randomized SVD, block Lanczos, least squares
(the BASELINE.json demo configs built on TSQR)."""

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu.models import lanczos, svd

# the package re-exports the lstsq/rsvd FUNCTIONS under the same names
# as their submodules (flat API); import the modules explicitly
import tsqr_tpu.models.lstsq  # noqa: F401  (registers the submodule)
import tsqr_tpu.models.rsvd  # noqa: F401

import sys
lstsq = sys.modules["tsqr_tpu.models.lstsq"]
rsvd = sys.modules["tsqr_tpu.models.rsvd"]


def test_rsvd_low_rank_recovery():
    rng = np.random.default_rng(0)
    u = np.linalg.qr(rng.standard_normal((512, 10)))[0]
    v = np.linalg.qr(rng.standard_normal((64, 10)))[0]
    s = np.linspace(10, 1, 10)
    a = (u * s) @ v.T
    uu, ss, vt = rsvd.rsvd(jnp.asarray(a, jnp.float32), rank=10,
                           key=jax.random.PRNGKey(0), leaf_rows=128)
    np.testing.assert_allclose(np.asarray(ss), s, rtol=1e-3)
    rec = np.asarray(uu) * np.asarray(ss) @ np.asarray(vt)
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-4


def test_rsvd_distributed_mesh():
    # multi-chip rsvd: A row-sharded over an 8-device mesh, the
    # orthogonalizations through the distributed ladder, every matmul
    # self-distributing (computation follows sharding) — recovers the
    # same spectrum as the local path
    from tsqr_tpu.parallel import mesh as mesh_mod
    rng = np.random.default_rng(2)
    u = np.linalg.qr(rng.standard_normal((1024, 10)))[0]
    v = np.linalg.qr(rng.standard_normal((64, 10)))[0]
    s = np.linspace(10, 1, 10)
    a = (u * s) @ v.T
    mesh = mesh_mod.make_mesh(8)
    ax = jax.device_put(jnp.asarray(a, jnp.float32),
                        mesh_mod.row_sharding(mesh))
    uu, ss, vt = rsvd.rsvd(ax, rank=10, key=jax.random.PRNGKey(0),
                           mesh=mesh, leaf_rows=64)
    np.testing.assert_allclose(np.asarray(ss), s, rtol=1e-3)
    rec = np.asarray(uu) * np.asarray(ss) @ np.asarray(vt)
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-4


def test_lstsq_and_svd_distributed_mesh():
    # lstsq(mesh=) and tsqr_svd(mesh=): factorization through the
    # distributed drivers, solves/updates local — same answers as the
    # single-device paths
    lstsq_mod, svd_mod = lstsq, svd  # module handles (see top of file)
    from tsqr_tpu.parallel import mesh as mesh_mod
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (2048, 24)).astype(np.float32)
    x_true = rng.standard_normal(24).astype(np.float32)
    b = a @ x_true + 1e-4 * rng.standard_normal(2048).astype(np.float32)
    mesh = mesh_mod.make_mesh(8)
    ax = jax.device_put(jnp.asarray(a), mesh_mod.row_sharding(mesh))
    bx = jax.device_put(jnp.asarray(b), mesh_mod.vec_sharding(mesh))
    x = lstsq_mod.lstsq(ax, bx, "fp32", mesh=mesh, leaf_rows=64)
    x_ref = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                            rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=2e-4)

    u, s, vt = svd_mod.tsqr_svd(ax, "fp32", mesh=mesh)
    s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4)
    rec = np.asarray(u, np.float64) * np.asarray(s) @ np.asarray(vt)
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-5


def test_block_lanczos_eigenvalues():
    rng = np.random.default_rng(1)
    n = 128
    evals = np.linspace(1, 100, n)
    qfull = np.linalg.qr(rng.standard_normal((n, n)))[0]
    amat = (qfull * evals) @ qfull.T
    amat = jnp.asarray((amat + amat.T) / 2, jnp.float32)

    qb, alphas, betas = lanczos.block_lanczos(
        lambda x: amat @ x, n, block=8, iters=8,
        key=jax.random.PRNGKey(2), leaf_rows=128)
    qb = np.asarray(qb, np.float64)
    # basis must be orthonormal
    assert np.linalg.norm(qb.T @ qb - np.eye(qb.shape[1])) < 1e-4
    # Ritz values from the projected matrix approximate extreme eigenvalues
    t = qb.T @ np.asarray(amat, np.float64) @ qb
    ritz = np.linalg.eigvalsh(t)
    assert abs(ritz.max() - 100) / 100 < 0.02


def test_block_lanczos_distributed_mesh():
    # multi-chip lanczos: basis row-sharded, orthogonalizations through
    # the distributed ladder, GSPMD-distributed matvec — same Ritz
    # quality as the local path
    from tsqr_tpu.parallel import mesh as mesh_mod
    rng = np.random.default_rng(4)
    n = 512
    evals = np.linspace(1, 100, n)
    qfull = np.linalg.qr(rng.standard_normal((n, n)))[0]
    amat = (qfull * evals) @ qfull.T
    mesh = mesh_mod.make_mesh(8)
    amat_d = jax.device_put(jnp.asarray((amat + amat.T) / 2, jnp.float32),
                            mesh_mod.row_sharding(mesh))

    qb, alphas, betas = lanczos.block_lanczos(
        lambda x: amat_d @ x, n, block=8, iters=8,
        key=jax.random.PRNGKey(2), mesh=mesh, leaf_rows=64)
    qb = np.asarray(qb, np.float64)
    assert np.linalg.norm(qb.T @ qb - np.eye(qb.shape[1])) < 1e-4
    t = qb.T @ np.asarray(amat_d, np.float64) @ qb
    ritz = np.linalg.eigvalsh(t)
    assert abs(ritz.max() - 100) / 100 < 0.02


def test_tsqr_svd_matches_numpy():
    rng = np.random.default_rng(5)
    a = rng.uniform(-1, 1, (1024, 24)).astype(np.float32)
    u, s, vt = svd.tsqr_svd(jnp.asarray(a), "fp32", method="cholqr2")
    sg = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-5)
    rec = (np.asarray(u, np.float64) * np.asarray(s, np.float64)
           ) @ np.asarray(vt, np.float64)
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-6
    un = np.asarray(u, np.float64)
    assert np.linalg.norm(un.T @ un - np.eye(24)) < 1e-5


def test_tsqr_batched_vmap():
    # batched factorization through vmap (the 'batched TSQR' BASELINE
    # config): one program, B independent panels
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.uniform(-1, 1, (4, 512, 16)).astype(np.float32))
    from tsqr_tpu.core import cholqr
    q, r = jax.vmap(lambda x: cholqr.fastqr(x, "fp32", method="cholqr2"))(a)
    assert q.shape == (4, 512, 16) and r.shape == (4, 16, 16)
    for i in range(4):
        qi = np.asarray(q[i], np.float64)
        assert np.linalg.norm(qi.T @ qi - np.eye(16)) < 1e-5
        assert np.linalg.norm(
            np.asarray(a[i]) - qi @ np.asarray(r[i], np.float64)
        ) / np.linalg.norm(np.asarray(a[i])) < 1e-6


def test_lstsq_matches_numpy():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (256, 32)).astype(np.float32)
    b = rng.uniform(-1, 1, (256,)).astype(np.float32)
    x = lstsq.lstsq(jnp.asarray(a), jnp.asarray(b), leaf_rows=128)
    xg = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                         rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), xg, rtol=0, atol=1e-4)


def test_lstsq_multi_rhs():
    rng = np.random.default_rng(4)
    a = rng.uniform(-1, 1, (128, 16)).astype(np.float32)
    b = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    x = lstsq.lstsq(jnp.asarray(a), jnp.asarray(b), leaf_rows=128)
    xg = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                         rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), xg, rtol=0, atol=1e-4)


def test_lstsq_regen_matches_materialized():
    # matrix-free least squares: A defined by a generator, never
    # materialized; must match np.linalg.lstsq on the assembled matrix
    import jax
    from tsqr_tpu.core import ooc

    m, n, chunk = 2048, 24, 256
    key = jax.random.PRNGKey(3)
    gen = ooc.uniform_gen(key, chunk, n, dtype=jnp.float32)
    a = np.concatenate([np.asarray(gen(i)) for i in range(m // chunk)])
    rng = np.random.default_rng(4)
    b = rng.uniform(-1, 1, m).astype(np.float32)
    x, info = lstsq.lstsq_regen(gen, jnp.asarray(b), m, n, "fp32",
                                method="cholqr2", chunk_rows=chunk)
    xg = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                         rcond=None)[0]
    assert np.allclose(np.asarray(x), xg, rtol=1e-3, atol=1e-4)
    # achieved residual matches the golden residual (b has a large
    # component outside range(A) at n << m)
    rg = np.linalg.norm(a @ xg - b) / np.linalg.norm(b)
    assert abs(float(info["residual"]) - rg) < 1e-4
    assert float(info["orthogonality"]) < 1e-5


def test_lstsq_regen_multi_rhs_corrected():
    import jax
    from tsqr_tpu.core import ooc

    m, n, chunk = 1024, 16, 128
    gen = ooc.uniform_gen(jax.random.PRNGKey(5), chunk, n,
                          dtype=jnp.bfloat16)
    a = np.concatenate([np.asarray(gen(i), np.float32)
                        for i in range(m // chunk)])
    rng = np.random.default_rng(6)
    b = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    x, info = lstsq.lstsq_regen(gen, jnp.asarray(b), m, n, "bf16x6_cor",
                                method="cholqr2", chunk_rows=chunk)
    xg = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64),
                         rcond=None)[0]
    assert x.shape == (n, 3)
    assert np.allclose(np.asarray(x), xg, rtol=5e-3, atol=5e-3)
