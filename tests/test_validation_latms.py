"""Validation metrics + latms generator tests (≙ reference validation.cu /
latms.cu / test_cond.cu:20-76)."""

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu.utils import latms, validation


def test_orthogonality_metrics():
    rng = np.random.default_rng(0)
    q = np.linalg.qr(rng.standard_normal((256, 32)))[0]
    assert validation.orthogonality(q) < 1e-13
    d, off = validation.orthogonality_each(q)
    assert d < 1e-13 and off < 1e-13
    # perturbed Q: diagonal-only error shows up in the diag component
    q2 = q * 1.001
    d2, off2 = validation.orthogonality_each(q2)
    assert d2 > 1e-4 and d2 > off2


def test_submatrix_orthogonality_heatmap():
    rng = np.random.default_rng(1)
    q = np.linalg.qr(rng.standard_normal((128, 32)))[0]
    hm = validation.submatrix_orthogonality(q, tile=16)
    assert hm.shape == (2, 2)
    assert hm.max() < 1e-12


def test_residual_device_matches_host():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (128, 16)).astype(np.float32)
    q, r = np.linalg.qr(a)
    host = validation.residual(a, q, r)
    dev = float(validation.residual_device(jnp.asarray(a), jnp.asarray(q),
                                           jnp.asarray(r)))
    assert abs(host - dev) < 1e-6


def test_exponent_distribution():
    x = np.array([1.0, 2.0, 3.0, 0.25, 0.0, np.inf], np.float32)
    hist = validation.exponent_distribution(x)
    assert hist[0] == 1   # 1.0
    assert hist[1] == 2   # 2.0, 3.0
    assert hist[-2] == 1  # 0.25
    assert sum(hist.values()) == 4  # zero and inf excluded


def test_latms_prescribed_singular_values():
    key = jax.random.PRNGKey(0)
    s = jnp.asarray(np.linspace(1.0, 0.1, 16), jnp.float32)
    a = latms.latms(key, 256, 16, s)
    got = np.linalg.svd(np.asarray(a, np.float64), compute_uv=False)
    np.testing.assert_allclose(got, np.asarray(s), rtol=1e-4)


def test_rand_matrix_with_cond():
    key = jax.random.PRNGKey(1)
    a, measured = latms.rand_matrix_with_cond(key, 512, 32, 1e4)
    assert measured >= 0.9e4
    true_cond = np.linalg.cond(np.asarray(a, np.float64))
    assert abs(true_cond - measured) / true_cond < 1e-2


def test_wide_device_orthogonality_calibration():
    # the wide-grid campaign trusts orthogonality_wide_device /
    # residual_device_chunked: both must agree with host fp64 on a good
    # AND a deliberately degraded factorization
    rng = np.random.default_rng(11)
    a = rng.uniform(-1, 1, (8192, 96)).astype(np.float32)
    q, r = np.linalg.qr(a.astype(np.float64))
    q32 = q.astype(np.float32)

    host_good = validation.orthogonality(q32)
    dev_good = float(validation.orthogonality_wide_device(jnp.asarray(q32)))
    # both measure the f32-cast error (~1e-7); same order required
    assert abs(dev_good - host_good) < 5e-8 + 0.5 * host_good

    q_bad = (q + 1e-3 * rng.standard_normal(q.shape)).astype(np.float32)
    host_bad = validation.orthogonality(q_bad)
    dev_bad = float(validation.orthogonality_wide_device(jnp.asarray(q_bad)))
    assert abs(dev_bad - host_bad) / host_bad < 0.02

    host_res = validation.residual(a, q32, r.astype(np.float32))
    dev_res = float(validation.residual_device_chunked(
        jnp.asarray(a), jnp.asarray(q32), jnp.asarray(r.astype(np.float32)),
        row_chunk=2048))
    assert abs(dev_res - host_res) < 1e-7 + 0.5 * host_res
