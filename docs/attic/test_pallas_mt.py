"""Multi-tile Pallas panel kernel: interpret-mode equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.ops import pallas_panel, pallas_panel_mt
from tsqr_tpu.utils import validation


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("b,L,n,T", [(4, 64, 16, 4), (8, 128, 32, 4),
                                     (2, 64, 16, 2)])
def test_mt_kernel_interpret(b, L, n, T):
    a = _rand((b, L, n))
    qt, r = pallas_panel_mt.panel_qr_pallas_mt(
        jnp.asarray(a), mode="fp32", block=8, tiles=T, interpret=True)
    qt, r = np.asarray(qt), np.asarray(r)
    assert qt.shape == (b, n, L) and r.shape == (b, n, n)
    for i in range(b):
        q = qt[i].T
        assert np.allclose(np.triu(r[i]), r[i])
        assert validation.residual(a[i], q, r[i]) < 1e-6
        assert validation.orthogonality(q) < 1e-6


def test_mt_matches_single_tile():
    a = _rand((4, 96, 24), seed=1)
    qt1, r1 = pallas_panel.panel_qr_pallas(jnp.asarray(a), mode="fp32",
                                           block=8, interpret=True)
    qt2, r2 = pallas_panel_mt.panel_qr_pallas_mt(
        jnp.asarray(a), mode="fp32", block=8, tiles=4, interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qt1), np.asarray(qt2),
                               rtol=0, atol=1e-4)


def test_mt_corrected_mode_interpret():
    a = _rand((2, 128, 16), seed=2)
    qt, r = pallas_panel_mt.panel_qr_pallas_mt(
        jnp.asarray(a), mode="bf16x6_cor", block=8, tiles=2, interpret=True)
    q = np.asarray(qt[0]).T
    assert validation.residual(a[0], q, np.asarray(r[0])) < 1e-5
    assert validation.orthogonality(q) < 1e-5


# ---- sublane-batched kernel (ops/pallas_panel_sb.py) ----

from tsqr_tpu.ops import pallas_panel_sb  # noqa: E402


@pytest.mark.parametrize("b,L,n,block", [(8, 96, 32, 16), (16, 64, 24, 16),
                                         (8, 160, 48, 24)])
def test_sb_kernel_interpret(b, L, n, block):
    a = _rand((b, L, n), seed=3)
    qt, r = pallas_panel_sb.panel_qr_pallas_sb(
        jnp.asarray(a), mode="fp32", block=block, tiles=8, interpret=True)
    qt, r = np.asarray(qt), np.asarray(r)
    assert qt.shape == (b, n, L) and r.shape == (b, n, n)
    for i in range(b):
        q = qt[i].T
        assert np.allclose(np.triu(r[i]), r[i])
        assert validation.residual(a[i], q, r[i]) < 1e-6
        assert validation.orthogonality(q) < 1e-6


def test_sb_matches_single_tile():
    a = _rand((8, 96, 24), seed=4)
    qt1, r1 = pallas_panel.panel_qr_pallas(jnp.asarray(a), mode="fp32",
                                           block=8, interpret=True)
    qt2, r2 = pallas_panel_sb.panel_qr_pallas_sb(
        jnp.asarray(a), mode="fp32", block=8, tiles=8, interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qt1), np.asarray(qt2),
                               rtol=0, atol=1e-4)


def test_sb_corrected_mode_interpret():
    a = _rand((8, 128, 16), seed=5)
    qt, r = pallas_panel_sb.panel_qr_pallas_sb(
        jnp.asarray(a), mode="bf16x6_cor", block=8, tiles=8, interpret=True)
    q = np.asarray(qt[0]).T
    assert validation.residual(a[0], q, np.asarray(r[0])) < 1e-5
    assert validation.orthogonality(q) < 1e-5


def test_tsqr_with_sb_impl():
    # full tree with the sublane-batched leaf kernel; upper levels fall
    # back to jnp for tiny/ragged batches
    from tsqr_tpu.core import tsqr as tsqr_mod
    a = _rand((2048, 24), seed=6)
    q, r = tsqr_mod.tsqr(jnp.asarray(a), "fp32", leaf_rows=128, fanin=8,
                         impl="pallas_sb_interpret", block=8)
    q, r = np.asarray(q), np.asarray(r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6
