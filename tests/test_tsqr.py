"""TSQR tree correctness (≙ reference accuracy harness applied at the
tsqr16 layer, test.cu:81-234 with n <= 16 panels; generalized to n <= 128)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu import modes
from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.utils import validation


def _rand(m, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(m, n)).astype(np.float32)


@pytest.mark.parametrize("m,n", [(32, 16), (512, 16), (2048, 16),
                                 (4096, 128), (9211, 51), (1000, 3),
                                 (531, 16)])
@pytest.mark.parametrize("fanin", [2, 8])
def test_tsqr_fp32(m, n, fanin):
    a = _rand(m, n)
    q, r = jax.jit(lambda x: tsqr_mod.tsqr(x, "fp32", leaf_rows=256,
                                           fanin=fanin))(a)
    q, r = np.asarray(q), np.asarray(r)
    assert q.shape == (m, n) and r.shape == (n, n)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_tsqr_single_leaf_dispatch():
    # m <= leaf_rows -> single panel path (≙ tsqr.cu:1281-1310 dispatch)
    a = _rand(100, 16)
    q, r = tsqr_mod.tsqr(a, "fp32", leaf_rows=256)
    assert validation.residual(a, np.asarray(q), np.asarray(r)) < 1e-6


def test_plan_tree_padding_overhead():
    for m in [2**15, 2**15 + 1, 9211, 100, 12345]:
        bs, L, m_pad = tsqr_mod.plan_tree(m, 16, leaf_rows=256, fanin=8)
        assert m_pad >= m
        assert bs * L == m_pad
        if m > 4096:
            assert m_pad - m <= 8 * bs  # padding bound documented in plan_tree
        assert L % 8 == 0


def test_tsqr_matches_numpy_R_up_to_sign():
    a = _rand(4096, 32, seed=5)
    _, r = tsqr_mod.tsqr(a, "fp32", leaf_rows=256, fanin=2)
    r = np.asarray(r)
    rn = np.linalg.qr(a.astype(np.float64), mode="r")
    s = np.sign(np.diag(r)) * np.sign(np.diag(rn))
    np.testing.assert_allclose(r * s[:, None], rn, rtol=0, atol=2e-4)


@pytest.mark.parametrize("mode", ["bf16_nocor", "bf16x3_cor", "bf16x6_cor"])
def test_tsqr_modes_finite_and_sane(mode):
    a = _rand(2048, 16, seed=6)
    q, r = tsqr_mod.tsqr(a, mode, leaf_rows=256)
    q, r = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.isfinite(q).all() and np.isfinite(r).all()
    # even uncorrected bf16 should stay inside the reference plot envelope
    # (1e-6 .. 6.1e-2, BASELINE.md)
    assert validation.residual(a, q, r) < 6.1e-2
    assert validation.orthogonality(q) < 6.1e-2


def test_corrected_beats_uncorrected():
    a = _rand(8192, 16, seed=7)
    on = {}
    for mode in ["bf16_nocor", "bf16x3_cor", "bf16x6_cor", "fp32"]:
        q, r = tsqr_mod.tsqr(a, mode, leaf_rows=256)
        on[mode] = validation.orthogonality(np.asarray(q, np.float64))
    # correction must recover orders of magnitude of orthogonality
    assert on["bf16x3_cor"] < on["bf16_nocor"] / 4
    assert on["bf16x6_cor"] <= on["bf16x3_cor"] * 1.5
    assert on["bf16x6_cor"] < 5e-6  # fp32_tc_cor-grade (BASELINE.md target)


@pytest.mark.parametrize("m", [100, 4096])  # single-leaf and tree paths
def test_want_q_false_r_only(m):
    # the forward-only program (≙ the compute-R half of MEASURE_QR_TIME,
    # tsqr.cu:24) must reproduce the full program's R bit-for-bit
    a = _rand(m, 16, seed=9)
    _, r_full = tsqr_mod.tsqr(a, "fp32", leaf_rows=256)
    q_none, r_only = tsqr_mod.tsqr(a, "fp32", leaf_rows=256, want_q=False)
    assert q_none is None
    np.testing.assert_array_equal(np.asarray(r_only), np.asarray(r_full))


def test_phase_split_smoke():
    # the honest MEASURE_QR_TIME analogue: full vs R-only fused programs
    from tsqr_tpu.harness import profile
    import io
    buf = io.StringIO()
    res = profile.tsqr_phase_split(2048, 16, "fp32", out=buf, leaf_rows=256)
    assert res["total_s"] > 0 and res["compute_r_s"] > 0
    assert 0 <= res["q_pct"] <= 100
    assert "compute-R" in buf.getvalue()


def test_collect_level_q_instrumentation():
    # ≙ EVALUATE_EACH_SMALL_Q (tsqr.cu:25): every tree level's Q tiles must
    # be orthogonal
    a = _rand(2048, 16, seed=8)
    q, r, levels = tsqr_mod.tsqr(a, "fp32", leaf_rows=256, fanin=4,
                                 collect_level_q=True)
    assert len(levels) >= 2
    for lvl in levels:
        worst = validation.multi_orthogonality(np.asarray(lvl, np.float64))
        assert worst < 1e-5
    assert validation.residual(a, np.asarray(q), np.asarray(r)) < 1e-6


def test_pick_sb_tiles_budget():
    # round-5 compile budget (SB_TL_BUDGET): tile picks must stay at or
    # under the largest T*L with an on-chip compile record, preferring
    # 16 tiles/chain when the batch and budget allow
    assert tsqr_mod._pick_sb_tiles(512, 512) == 16
    assert tsqr_mod._pick_sb_tiles(512, 1024) == 8
    assert tsqr_mod._pick_sb_tiles(1024, 1024) == 8
    assert tsqr_mod._pick_sb_tiles(512, 2048) is None   # the SIGKILL config
    assert tsqr_mod._pick_sb_tiles(6, 512) is None      # ragged batch


def test_sb_leaf_budget_fallback_runs_on_cpu():
    # an over-budget sb config must fall back to the XLA leaf path
    # instead of tracing a compiled Pallas kernel (which would raise on
    # CPU): plan_tree(2^15, leaf 4096, fanin 8) -> B=8, L=4096 ->
    # T=None.  Results must match the plain jnp tree bit-for-bit (same
    # code path after the fallback).
    a = _rand(1 << 15, 32, seed=3)
    kw = dict(leaf_rows=4096, fanin=8, block=16)
    q1, r1 = tsqr_mod.tsqr(jnp.asarray(a), "fp32", impl="pallas_sb", **kw)
    q2, r2 = tsqr_mod.tsqr(jnp.asarray(a), "fp32", impl="jnp", **kw)
    assert np.array_equal(np.asarray(q1), np.asarray(q2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert validation.residual(a, np.asarray(q1), np.asarray(r1)) < 2e-6
