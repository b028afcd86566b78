"""BlockQR correctness incl. the README sample config M=9211 x N=51
(reference README.md:61-99) and CGS2 reorthogonalization
(≙ blockqr.cu:180-390)."""

import jax
import numpy as np
import pytest

import tsqr_tpu
from tsqr_tpu.utils import validation


def _rand(m, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(m, n)).astype(np.float32)


@pytest.mark.parametrize("m,n", [(9211, 51), (1024, 256), (300, 300),
                                 (2048, 64)])
def test_blockqr_fp32(m, n):
    a = _rand(m, n)
    q, r = jax.jit(lambda x: tsqr_tpu.qr(x, "fp32", leaf_rows=256,
                                         panel_width=32))(a)
    q, r = np.asarray(q), np.asarray(r)
    assert q.shape == (m, n) and r.shape == (n, n)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    # plain (non-reorth) block CGS loses some orthogonality as n grows,
    # like the reference's non-Reorth path; reorth recovers it (next test)
    assert validation.orthogonality(q) < 5e-5


def test_blockqr_reference_panel_width():
    # the reference's fixed 16-wide blocking (blockqr.hpp:25)
    a = _rand(512, 48, seed=1)
    q, r = tsqr_tpu.qr(a, "fp32", panel_width=16, leaf_rows=256)
    assert validation.residual(a, np.asarray(q), np.asarray(r)) < 1e-6
    assert validation.orthogonality(np.asarray(q)) < 1e-6


def test_blockqr_reorth_improves_orthogonality():
    # moderately ill-conditioned input: CGS2 must keep Q orthogonal
    rng = np.random.default_rng(2)
    u = np.linalg.qr(rng.standard_normal((2048, 64)))[0]
    v = np.linalg.qr(rng.standard_normal((64, 64)))[0]
    s = np.logspace(0, -6, 64)
    a = (u * s) @ v.T
    a = a.astype(np.float32)
    q1, r1 = tsqr_tpu.qr(a, "fp32", panel_width=16, reorth=False,
                         leaf_rows=256)
    q2, r2 = tsqr_tpu.qr(a, "fp32", panel_width=16, reorth=True,
                         leaf_rows=256)
    o1 = validation.orthogonality(np.asarray(q1))
    o2 = validation.orthogonality(np.asarray(q2))
    assert validation.residual(a, np.asarray(q2), np.asarray(r2)) < 1e-5
    assert o2 < 5e-6
    assert o2 <= o1 * 1.5


def test_blockqr_rejects_wide():
    # ≙ error_invalid_matrix_size (blockqr.cu:407-409)
    with pytest.raises(ValueError):
        tsqr_tpu.qr(_rand(16, 32), "fp32")


def test_blockqr_corrected_mode_readme_sample():
    # README sample is fp32_tc_cor on M=9211 N=51 -> BF16X6_COR here
    a = _rand(9211, 51, seed=3)
    q, r = tsqr_tpu.qr(a, "bf16x6_cor", leaf_rows=512)
    q, r = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert validation.residual(a, q, r) < 1e-5
    assert validation.orthogonality(q) < 1e-5


def test_blockqr_cholqr_panels():
    # MXU-native production config: CholQR panels inside BlockQR
    a = _rand(2048, 96, seed=4)
    q, r = tsqr_tpu.qr(a, "fp32", panel_width=32, panel_method="cholqr2",
                       leaf_rows=256)
    q, r = np.asarray(q), np.asarray(r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-5


def test_blockqr_cholqr_panels_corrected_reorth():
    a = _rand(4096, 64, seed=5)
    q, r = tsqr_tpu.qr(a, "bf16x6_cor", panel_width=16, reorth=True,
                       panel_method="cholqr3")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-5


@pytest.mark.parametrize("n,reorth", [(96, False), (96, True), (80, True)])
def test_blockqr_fori_matches_unroll(n, reorth):
    # the scan-compiled panel loop (one traced body, O(1) compile time in
    # n) must agree with the reference-style unrolled loop; n=80 with
    # panel_width=32 exercises the ragged-tail epilogue
    a = _rand(768, n, seed=6)
    kw = dict(panel_width=32, leaf_rows=256, reorth=reorth)
    qu, ru = tsqr_tpu.qr(a, "fp32", loop="unroll", **kw)
    qf, rf = tsqr_tpu.qr(a, "fp32", loop="fori", **kw)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qu),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ru),
                               rtol=0, atol=2e-5)
    assert validation.residual(a, np.asarray(qf), np.asarray(rf)) < 1e-6
    assert validation.orthogonality(np.asarray(qf)) < 5e-5


def test_blockqr_fori_many_panels():
    # 16 panels of width 16: auto strategy must pick the fori path and
    # still produce a correct factorization (incl. CGS2 through the loop)
    a = _rand(1024, 256, seed=7)
    q, r = tsqr_tpu.qr(a, "fp32", panel_width=16, reorth=True,
                       leaf_rows=256)
    q, r = np.asarray(q), np.asarray(r)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_blockqr_single_panel_reorth_not_noop():
    # ADVICE round 1: reorth=True used to be silently ignored for
    # n <= panel_width; now it applies CGS2's second pass
    rng = np.random.default_rng(8)
    u = np.linalg.qr(rng.standard_normal((2048, 64)))[0]
    s = np.logspace(0, -4, 64)
    v = np.linalg.qr(rng.standard_normal((64, 64)))[0]
    a = ((u * s) @ v.T).astype(np.float32)
    q1, r1 = tsqr_tpu.qr(a, "fp32", panel_width=128, reorth=False,
                         leaf_rows=256)
    q2, r2 = tsqr_tpu.qr(a, "fp32", panel_width=128, reorth=True,
                         leaf_rows=256)
    assert not np.array_equal(np.asarray(q1), np.asarray(q2))
    o2 = validation.orthogonality(np.asarray(q2))
    assert o2 < 5e-6
    assert validation.residual(a, np.asarray(q2), np.asarray(r2)) < 1e-5
