"""Pallas panel-kernel equivalence tests, interpret mode on CPU
(≙ the reference's TC-emulator strategy for testing device kernels off the
target hardware, SURVEY.md §4 'fixtures/fakes')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.ops import householder, pallas_panel
from tsqr_tpu.utils import validation


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("b,L,n", [(2, 64, 16), (1, 256, 128), (4, 32, 8)])
def test_pallas_panel_qr_interpret(b, L, n):
    a = _rand((b, L, n))
    qt, r = pallas_panel.panel_qr_pallas(jnp.asarray(a), mode="fp32",
                                         block=8, interpret=True)
    qt, r = np.asarray(qt), np.asarray(r)
    assert qt.shape == (b, n, L) and r.shape == (b, n, n)
    for i in range(b):
        q = qt[i].T
        assert np.allclose(np.triu(r[i]), r[i])
        assert validation.residual(a[i], q, r[i]) < 1e-6
        assert validation.orthogonality(q) < 1e-6


def test_pallas_matches_jnp_golden():
    a = _rand((2, 96, 24), seed=1)
    qt, r = pallas_panel.panel_qr_pallas(jnp.asarray(a), mode="fp32",
                                         block=8, interpret=True)
    qg, rg = jax.vmap(lambda x: householder.blocked_householder_qr(x, block=8))(
        jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(r), np.asarray(rg),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qt).transpose(0, 2, 1),
                               np.asarray(qg), rtol=0, atol=1e-4)


def test_tsqr_with_pallas_leaf_interpret():
    a = _rand((2000, 16), seed=2)
    q, r = tsqr_mod.tsqr(jnp.asarray(a), "fp32", leaf_rows=256, fanin=4,
                         impl="pallas_interpret")
    q, r = np.asarray(q), np.asarray(r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_pallas_corrected_mode_interpret():
    a = _rand((1, 128, 32), seed=3)
    qt, r = pallas_panel.panel_qr_pallas(jnp.asarray(a), mode="bf16x6_cor",
                                         block=8, interpret=True)
    q = np.asarray(qt[0]).T
    assert validation.residual(a[0], q, np.asarray(r[0])) < 1e-5
    assert validation.orthogonality(q) < 1e-5
