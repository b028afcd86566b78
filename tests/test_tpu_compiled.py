"""Compiled-kernel regression lane — runs ONLY on real TPU hardware.

The default CI suite forces a CPU mesh (tests/conftest.py), so every
Pallas test there runs in interpret mode; Mosaic-compiled kernels used to
be verified only by ad-hoc scripts.  This lane asserts the compiled
kernels against jnp goldens at a few shapes so kernel regressions surface
in the suite.  Run with::

    TSQR_TEST_PLATFORM=axon python -m pytest tests/test_tpu_compiled.py -q

(or TSQR_TEST_PLATFORM=tpu on a directly-attached chip).  Skips cleanly
on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _is_tpu(), reason="compiled-kernel lane needs real TPU hardware")


def _rand(m, n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, size=(m, n)).astype(np.float32))


@pytest.mark.parametrize("mode", ["fp32", "bf16x3_cor", "bf16x6_cor"])
@pytest.mark.parametrize("m,n", [(4096, 128), (2100, 64)])
def test_gram_pallas_compiled(mode, m, n):
    from tsqr_tpu.ops import pallas_gram
    from tsqr_tpu import modes as modes_mod
    a = _rand(m, n, seed=1)
    g1 = np.asarray(pallas_gram.gram_pallas(a, mode))
    g64 = np.asarray(a, np.float64).T @ np.asarray(a, np.float64)
    tol = {"fp32": 1e-5, "bf16x3_cor": 5e-4, "bf16x6_cor": 1e-5}[mode]
    assert np.max(np.abs(g1 - g64)) < tol * np.abs(g64).max()


@pytest.mark.parametrize("mode", ["fp32", "bf16x6_cor"])
def test_qpass_pallas_compiled(mode):
    from tsqr_tpu.ops import pallas_gram
    m, n = 4096, 128
    a = _rand(m, n, seed=2)
    rng = np.random.default_rng(3)
    rinv = jnp.asarray(np.triu(rng.uniform(0.1, 1, (n, n))).astype(np.float32))
    q, g = pallas_gram.qpass_pallas(a, rinv, mode, with_gram=True)
    q64 = np.asarray(a, np.float64) @ np.asarray(rinv, np.float64)
    scale = np.abs(q64).max()
    tol = {"fp32": 1e-5, "bf16x6_cor": 1e-5}[mode]
    assert np.max(np.abs(np.asarray(q, np.float64) - q64)) < tol * scale
    g64 = q64.T @ q64
    assert np.max(np.abs(np.asarray(g) - g64)) < 1e-4 * np.abs(g64).max()


@pytest.mark.parametrize("variant", ["fastest", "turbo"])
def test_stream_chain_reduced_pass_pipelines_compiled(variant):
    # the sloppy-first-Gram pipelines end-to-end on the chip ("fastest"
    # = bf16 Gram #1 + Delta; "turbo" additionally recomputes Q1 in VMEM)
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.utils import validation
    a = _rand(1 << 18, 128, seed=4)
    q, r = cholqr.cholqr2_fused(a, "bf16x6_cor", variant=variant)
    orth = validation.orthogonality_accurate(q)
    assert np.isfinite(orth) and orth < 1e-6
    assert validation.residual(
        np.asarray(a), np.asarray(q, np.float64),
        np.asarray(r, np.float64)) < 1e-5


@pytest.mark.parametrize("mode", ["fp32", "bf16x6_cor"])
def test_panel_qr_pallas_compiled(mode):
    from tsqr_tpu.ops import pallas_panel
    from tsqr_tpu.utils import validation
    b, L, n = 8, 512, 128
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(-1, 1, (b, L, n)).astype(np.float32))
    qt, r = pallas_panel.panel_qr_pallas(a, mode=mode)
    q = np.asarray(qt).transpose(0, 2, 1)
    tol = 1e-5 if mode == "fp32" else 1e-4
    for i in range(b):
        assert validation.residual(np.asarray(a)[i], q[i],
                                   np.asarray(r)[i]) < tol
        assert validation.orthogonality(q[i]) < tol


def test_panel_qr_sb_compiled():
    # sublane-batched multi-tile kernel (8 tiles per serial chain)
    from tsqr_tpu.ops import pallas_panel_sb
    from tsqr_tpu.utils import validation
    b, L, n = 16, 512, 128
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(-1, 1, (b, L, n)).astype(np.float32))
    qt, r = pallas_panel_sb.panel_qr_pallas_sb(a, mode="fp32", block=32)
    q = np.asarray(qt).transpose(0, 2, 1)
    for i in range(b):
        assert validation.residual(np.asarray(a)[i], q[i],
                                   np.asarray(r)[i]) < 1e-5
        assert validation.orthogonality(q[i]) < 1e-5


def test_fused_cholqr3_compiled_accuracy():
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.utils import validation
    a = _rand(1 << 18, 128, seed=6)
    q, r = cholqr.cholqr3_fused(a, "bf16x6_cor")
    orth = validation.orthogonality_accurate(q)
    assert np.isfinite(orth) and orth < 1e-6


def test_cholqr3_compact_compiled_accuracy():
    # the robust composed-factor recompute pipeline on the real chip
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.utils import validation
    a = _rand(1 << 18, 128, seed=8)
    q, r = cholqr.cholqr3_fused(a, "bf16x6_cor", variant="compact")
    orth = validation.orthogonality_accurate(q)
    assert np.isfinite(orth) and orth < 1e-6


def test_cholqr3_compact_ladder_hooks_compiled():
    # g1 reuse + free in-pass Q-Gram gate must reproduce the plain
    # compact pipeline bitwise (same passes, same factors) and the
    # in-pass gate must agree with the accurate external measurement
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.ops import pallas_gram
    from tsqr_tpu.utils import validation
    a = _rand(1 << 18, 128, seed=8)
    g = pallas_gram.gram_pallas(a, "bf16x6_cor")
    g = (g + g.T) * 0.5
    q0, r0 = cholqr.cholqr3_fused(a, "bf16x6_cor", variant="compact",
                                  g1=g)
    q1, r1, gq = cholqr.cholqr3_fused(a, "bf16x6_cor", variant="compact",
                                      g1=g, return_qgram=True)
    assert float(jnp.max(jnp.abs(q0 - q1))) == 0.0
    assert float(jnp.max(jnp.abs(r0 - r1))) == 0.0
    gate = float(jnp.linalg.norm(gq - jnp.eye(128)) / np.sqrt(128.0))
    true = validation.orthogonality_accurate(q1)
    assert np.isfinite(gate) and abs(gate - true) < 3e-8


def test_predictive_ladder_compiled():
    # the production 3-tier predictive ladder in ONE program on the
    # chip; tier-1 output must be bitwise the bare cholqr1_fused result
    from tsqr_tpu.core import auto, cholqr
    a = _rand(1 << 18, 128, seed=11)
    q, r = auto.qr_auto_fused(a, "bf16x6_cor",
                              fast_method="cholqr1_fused",
                              mid_method="cholqr3_fused",
                              mid_variant="compact")
    qb, rb = cholqr.fastqr(a, "bf16x6_cor", method="cholqr1_fused")
    assert float(jnp.max(jnp.abs(q - qb))) == 0.0
    assert float(jnp.max(jnp.abs(r - rb))) == 0.0


def test_predictive_ladder_return_info_compiled():
    # the fused ladder's tier tag + power-compounded kappa^2 bound in
    # the COMPILED (Pallas tier-0 Gram) program: benign input -> tier 1
    # with a near-1 bound; (q, r) match the info-less program bitwise
    from tsqr_tpu.core import auto
    a = _rand(1 << 18, 128, seed=12)
    kw = dict(fast_method="cholqr1_fused", mid_method="cholqr3_fused",
              mid_variant="compact")
    q, r, info = auto.qr_auto_fused(a, "bf16x6_cor", return_info=True,
                                    **kw)
    assert int(info["tier"][0, 0]) == 1
    k2 = float(info["kappa2_est"][0, 0])
    assert 0.99 <= k2 < 20.0, k2  # uniform random: kappa ~ 2, bound ~2x
    q0, r0 = auto.qr_auto_fused(a, "bf16x6_cor", **kw)
    assert float(jnp.max(jnp.abs(q - q0))) == 0.0
    assert float(jnp.max(jnp.abs(r - r0))) == 0.0


def test_whole_tree_sb_leaves_compiled():
    # the round-2 blocker: the FULL fused TSQR tree with sublane-batched
    # Pallas leaves in one program on the chip (tsqr.cu:1064-1279 is the
    # reference's on-device whole-tree artifact).  Round 3 routes the
    # inner tree levels through the vmapped XLA path (tree_impl="jnp" —
    # the r2 program instantiated an sb kernel per tree level and killed
    # the remote-compile helper).
    from tsqr_tpu.core import tsqr as tsqr_mod
    from tsqr_tpu.utils import validation
    m, n = 1 << 18, 128
    a = _rand(m, n, seed=9)
    q, r = tsqr_mod.tsqr(a, "fp32", impl="pallas_sb", leaf_rows=2048,
                         block=32)
    orth = validation.orthogonality_accurate(q)
    assert np.isfinite(orth) and orth < 1e-5
    resid = float(validation.residual_device_chunked(a, q, r))
    assert np.isfinite(resid) and resid < 1e-5


def test_cholqr_iter_fused_compiled():
    # the iterated shifted rung's while_loop + streaming kernels,
    # Mosaic-COMPILED: deep-kappa input converges to fp32-grade
    # orthogonality and the free gate agrees
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.utils import latms, validation
    a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(9), 1 << 14,
                                       128, 1e6)
    q, r, gq = cholqr.cholqr_iter_fused(a, "bf16x6_cor",
                                        return_qgram=True)
    gate = float(jnp.linalg.norm(gq - jnp.eye(128)) / jnp.sqrt(128.0))
    assert gate < 1e-5
    q64 = np.asarray(q, np.float64)
    assert validation.orthogonality(q64) < 1e-5
    assert validation.residual(np.asarray(a, np.float64), q64,
                               np.asarray(r, np.float64)) < 1e-4


def test_predictive_ladder_iter_tier_compiled():
    # the full 4-tier ladder ON-CHIP: a kappa ~1e6 input must route to
    # a Gram rung (2 or 3 — the gates are measured, never tier 4) and
    # return fp32-grade output
    from tsqr_tpu.core import auto
    from tsqr_tpu.utils import latms, validation
    a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(10), 1 << 14,
                                       128, 1e6)
    q, r, info = auto.qr_auto_fused(a, "bf16x6_cor",
                                    fast_method="cholqr1_fused",
                                    mid_method="cholqr3_fused",
                                    mid_variant="compact",
                                    return_info=True)
    assert int(info["tier"][0, 0]) in (2, 3)
    assert validation.orthogonality(np.asarray(q, np.float64)) < 1e-5


def test_autodiff_backward_compiled():
    # the custom_jvp rule's derived backward, Mosaic-COMPILED end to
    # end: grad through the fused fast path (Pallas forward + plain-XLA
    # adjoint) is finite and matches the CPU-verified adjoint identity
    # dA = Q dR for a loss with dQ = 0 cotangent structure checked via
    # the residual of the returned gradient against qr_adjoint
    from tsqr_tpu.core import cholqr, diff
    a = _rand(1 << 14, 128, seed=11)
    fn = lambda x: cholqr.fastqr(x, "bf16x6_cor", method="cholqr2_fused")
    (q, r), vjp = jax.vjp(fn, a)
    rng = np.random.default_rng(11)
    dq = jnp.asarray(rng.uniform(-1, 1, q.shape).astype(np.float32))
    dr = jnp.asarray(rng.uniform(-1, 1, r.shape).astype(np.float32))
    (da,) = vjp((dq.astype(q.dtype), dr.astype(r.dtype)))
    da_ref = diff.qr_adjoint(q, r, dq, dr)
    err = float(jnp.linalg.norm(da.astype(jnp.float32) - da_ref)
                / jnp.linalg.norm(da_ref))
    assert err < 1e-4, err


def test_qrcp_pivoting_compiled():
    # the sketch + on-device pivoting loop + fused-ladder QR, compiled:
    # exact rank detection on a rank-deficient input
    from tsqr_tpu.models import qrcp
    rng = np.random.default_rng(12)
    m, n, rk = 1 << 14, 64, 24
    x = rng.standard_normal((m, rk)).astype(np.float32)
    y = rng.standard_normal((rk, n)).astype(np.float32)
    a = jnp.asarray(x @ y)
    q, r, piv, db = qrcp.pivoted_qr(a, jax.random.PRNGKey(12),
                                    "bf16x6_cor")
    db = np.asarray(db)
    assert int(np.sum(db > 1e-4 * db[0])) == rk
    qn = np.asarray(q, np.float64)[:, :rk]
    rn = np.asarray(r, np.float64)[:rk, :]
    ap = np.asarray(a, np.float64)[:, np.asarray(piv)]
    assert np.linalg.norm(ap - qn @ rn) / np.linalg.norm(ap) < 1e-4


def test_vmap_fastqr_compiled():
    # 4-way vmapped fused fast path on-chip
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.utils import validation
    rng = np.random.default_rng(13)
    ab = jnp.asarray(rng.uniform(-1, 1, (4, 1 << 13, 128))
                     .astype(np.float32))
    q, r = jax.vmap(lambda x: cholqr.fastqr(x, "bf16x6_cor",
                                            method="cholqr2"))(ab)
    for i in range(4):
        assert validation.orthogonality(
            np.asarray(q[i], np.float64)) < 1e-6


def test_rand_cholqr_compiled():
    # sketch-preconditioned CholeskyQR on-chip: the fori_loop sketch,
    # the small-QR preconditioner, and the corrected Gram passes in one
    # compiled program; kappa-independence spot-checked at 1e6
    from tsqr_tpu.core import cholqr
    from tsqr_tpu.utils import latms, validation
    a, meas = latms.rand_matrix_with_cond(
        jax.random.PRNGKey(20), 1 << 14, 128, 1e6)
    assert meas > 9e5
    q, r = jax.jit(lambda x: cholqr.rand_cholqr(x, "bf16x6_cor"))(a)
    qn = np.asarray(q, np.float64)
    assert validation.orthogonality(qn) < 1e-5
    assert validation.residual(np.asarray(a, np.float64), qn,
                               np.asarray(r)) < 1e-1
    assert np.all(np.diag(np.asarray(r)) > 0)


def test_lstsq_cgls_compiled():
    # the preconditioned while_loop compiled on-chip: bounded iterations
    # and a near-optimal residual at kappa = 1e4
    from tsqr_tpu.models import lstsq as lstsq_mod
    from tsqr_tpu.utils import latms
    a, _ = latms.rand_matrix_with_cond(
        jax.random.PRNGKey(21), 1 << 13, 64, 1e4)
    rng = np.random.default_rng(21)
    b = jnp.asarray(rng.uniform(-1, 1, 1 << 13).astype(np.float32))
    a32 = jnp.asarray(a, jnp.float32)
    x, info = lstsq_mod.lstsq_cgls(
        lambda v: a32 @ v, lambda u: a32.T @ u, b, 64,
        key=jax.random.PRNGKey(0), tol=1e-6, max_iters=100)
    assert int(info["iters"]) <= 90
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    x64 = np.linalg.lstsq(a64, b64, rcond=None)[0]
    r_opt = np.linalg.norm(a64 @ x64 - b64)
    r_got = np.linalg.norm(a64 @ np.asarray(x, np.float64) - b64)
    assert r_got < r_opt * (1 + 1e-3)


def test_skeletons_compiled():
    # interpolative + CUR end-to-end on-chip on an exactly-rank-k input
    from tsqr_tpu.models import qrcp
    rng = np.random.default_rng(22)
    m, n, k = 1 << 14, 96, 12
    u = np.linalg.qr(rng.standard_normal((m, k)))[0]
    v = np.linalg.qr(rng.standard_normal((n, k)))[0]
    a = jnp.asarray((u @ v.T).astype(np.float32))
    an = np.asarray(a, np.float64)
    cols, coeff, _ = qrcp.interpolative(a, jax.random.PRNGKey(22), k)
    rec = an[:, np.asarray(cols)] @ np.asarray(coeff, np.float64)
    assert np.linalg.norm(rec - an) / np.linalg.norm(an) < 1e-4
    c_, u_, r_ = qrcp.cur(a, jax.random.PRNGKey(23), k, "bf16x6_cor")
    rec = (an[:, np.asarray(c_)] @ np.asarray(u_, np.float64)
           @ an[np.asarray(r_), :])
    assert np.linalg.norm(rec - an) / np.linalg.norm(an) < 1e-3


def test_qr_packed_compiled():
    # packed-IO narrow-panel contract on-chip: the (m/8, 128) view must
    # factor at full lane width with fastqr-parity results
    import tsqr_tpu
    from tsqr_tpu.utils import validation
    m, n = 1 << 18, 16
    a = jax.random.uniform(jax.random.PRNGKey(31), (m, n), jnp.float32,
                           -1, 1)
    ap = tsqr_tpu.pack_panel(a)
    qp, r = jax.jit(lambda x: tsqr_tpu.qr_packed(x, n, "bf16x6_cor",
                                                 method="cholqr2"))(ap)
    q64 = np.asarray(tsqr_tpu.unpack_panel(qp, m, n), np.float64)
    a64 = np.asarray(a, np.float64)
    assert validation.orthogonality(q64) < 1e-5
    assert (np.linalg.norm(a64 - q64 @ np.triu(np.asarray(r, np.float64)))
            / np.linalg.norm(a64)) < 1e-5
