"""CholeskyQR2 / shifted CholeskyQR3 fast-path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import cholqr
from tsqr_tpu.utils import latms, validation


def _rand(m, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(m, n)).astype(np.float32)


@pytest.mark.parametrize("m,n", [(512, 16), (4096, 128), (9211, 51)])
@pytest.mark.parametrize("method", ["cholqr2", "cholqr3"])
def test_fastqr_fp32(m, n, method):
    a = _rand(m, n)
    q, r = cholqr.fastqr(jnp.asarray(a), "fp32", method=method)
    q, r = np.asarray(q), np.asarray(r)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_cholqr3_survives_ill_conditioning():
    key = jax.random.PRNGKey(0)
    a, measured = latms.rand_matrix_with_cond(key, 4096, 64, 1e6)
    assert measured > 0.9e6
    q, r = cholqr.fastqr(a, "fp32", method="cholqr3")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(np.asarray(a), q, np.asarray(r)) < 2e-4


def test_cholqr2_corrected_mode():
    a = _rand(8192, 64, seed=1)
    q, r = cholqr.fastqr(jnp.asarray(a), "bf16x6_cor", method="cholqr2")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-5


def test_cholqr2_bf16_nocor_grade():
    # uncorrected bf16 Gram: orthogonality should stay in the reference
    # plot envelope but clearly worse than corrected
    a = _rand(8192, 64, seed=2)
    q6, _ = cholqr.fastqr(jnp.asarray(a), "bf16x6_cor", method="cholqr2")
    qn, _ = cholqr.fastqr(jnp.asarray(a), "bf16_nocor", method="cholqr2")
    o6 = validation.orthogonality(np.asarray(q6, np.float64))
    on = validation.orthogonality(np.asarray(qn, np.float64))
    assert on < 6.1e-2
    assert o6 < on / 10


def test_cholqr_matches_householder_R():
    from tsqr_tpu.core import tsqr as tsqr_mod
    a = _rand(2048, 32, seed=3)
    _, r1 = cholqr.fastqr(jnp.asarray(a), "fp32", method="cholqr2")
    _, r2 = tsqr_mod.tsqr(jnp.asarray(a), "fp32", leaf_rows=256)
    r1, r2 = np.asarray(r1), np.asarray(r2)
    s = np.sign(np.diag(r1)) * np.sign(np.diag(r2))
    np.testing.assert_allclose(r1 * s[:, None], r2, rtol=0, atol=2e-4)


@pytest.mark.parametrize("method", ["cholqr2_fused", "cholqr3_fused"])
def test_fused_pallas_interpret(method):
    # streaming Pallas kernels, interpreter mode on CPU
    from tsqr_tpu.core.cholqr import _METHODS
    a = _rand(2100, 64, seed=4)  # non-multiple of chunk: exercises padding
    q, r = _METHODS[method](jnp.asarray(a), "fp32", interpret=True)
    q, r = np.asarray(q), np.asarray(r)
    assert q.shape == (2100, 64)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_fused_corrected_interpret():
    from tsqr_tpu.core.cholqr import cholqr2_fused
    # n >= 64 so the streaming kernels (not the narrow-panel XLA
    # delegation) are exercised
    a = _rand(2048, 64, seed=5)
    q, r = cholqr2_fused(jnp.asarray(a), "bf16x6_cor", interpret=True)
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-5


def test_gram_pallas_matches_modes_gram():
    from tsqr_tpu.ops import pallas_gram
    from tsqr_tpu import modes as modes_mod
    a = _rand(1500, 48, seed=6)
    for mode in ["fp32", "bf16x6_cor"]:
        g1 = np.asarray(pallas_gram.gram_pallas(jnp.asarray(a), mode,
                                                chunk=512, interpret=True))
        g2 = np.asarray(modes_mod.gram(jnp.asarray(a),
                                       modes_mod.resolve(mode)))
        np.testing.assert_allclose(g1, g2, rtol=0,
                                   atol=5e-5 * np.abs(g2).max())
