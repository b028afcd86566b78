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
    # kappa=1e4 is inside shifted-CholQR3's measured fp32 range (~2e4);
    # cholqr2 alone would have kappa^2*eps ~ 6 >> 1 here
    key = jax.random.PRNGKey(0)
    a, measured = latms.rand_matrix_with_cond(key, 4096, 64, 1e4)
    assert measured > 0.9e4
    q, r = cholqr.fastqr(a, "fp32", method="cholqr3")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(np.asarray(a), q, np.asarray(r)) < 2e-4


def test_auto_routes_extreme_cond_past_fixed_gram():
    # kappa=1e6 is beyond any FIXED-pass fp32 Gram method; qr_auto must
    # detect the miss on device and escalate — since round 4 the next
    # rung is the ITERATED shifted CholeskyQR (dynamic pass count), so
    # the reflector tree is no longer needed for merely-large kappa
    from tsqr_tpu.core import auto
    key = jax.random.PRNGKey(1)
    a, measured = latms.rand_matrix_with_cond(key, 2048, 48, 1e6)
    assert measured > 0.9e6
    q, r, method = auto.qr_auto(a, "fp32", leaf_rows=256)
    # the escalation rung is picked by MEASURED orthogonality, so which
    # robust tier wins at kappa=1e6 is platform-dependent (true-f32 CPU
    # Gram lets shifted CholQR3 pass where the TPU's bf16-grade default
    # matmul needs the iterated tier); what must hold is that the fast
    # fixed-Gram tiers were escalated past, and orthogonality (below)
    assert method in ("cholqr_iter", "cholqr3", "blockqr_tsqr")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(np.asarray(a), q, np.asarray(r)) < 1e-3


def test_auto_routes_pathological_to_householder():
    # an exactly-zero column defeats every Gram method's measured gate;
    # qr_auto must still fall all the way back to the Householder tree
    from tsqr_tpu.core import auto
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (2048, 48)).astype(np.float32)
    a[:, 17] = 0.0
    q, r, method = auto.qr_auto(jnp.asarray(a), "fp32", leaf_rows=256)
    assert method == "blockqr_tsqr"
    assert validation.orthogonality(np.asarray(q, np.float64)) < 1e-5


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


def test_fused_turbo_interpret():
    # "turbo" = bf16 Gram #1 + recompute pipeline + Delta second factor:
    # the 4-HBM-pass corrected pipeline; same accuracy contract as
    # "fastest" on well-conditioned input
    from tsqr_tpu.core.cholqr import cholqr2_fused
    a = _rand(2048, 64, seed=9)
    q, r = cholqr2_fused(jnp.asarray(a), "bf16x6_cor", interpret=True,
                         variant="turbo")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-6
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-6
    assert np.allclose(np.triu(np.asarray(r)), np.asarray(r))


@pytest.mark.parametrize("method", ["cholqr2_fused", "cholqr3_fused"])
@pytest.mark.parametrize("variant", ["fast", "fastest"])
def test_fused_variants_interpret(method, variant):
    # the reduced-pass variants (Delta-trick second factor; bf16 Gram #1
    # for "fastest") must keep BOTH corrected-grade orthogonality AND
    # fp32-grade residual on well-conditioned input
    from tsqr_tpu.core.cholqr import _METHODS
    a = _rand(2048, 64, seed=9)
    q, r = _METHODS[method](jnp.asarray(a), "bf16x6_cor", interpret=True,
                            variant=variant)
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-6
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-6
    assert np.allclose(np.triu(np.asarray(r)), np.asarray(r))


@pytest.mark.parametrize("mode", ["fp32", "bf16x6_cor"])
def test_cholqr3_compact_interpret(mode):
    # the ROBUST recompute pipeline (composed factors, 5 HBM passes)
    # must keep full corrected-grade orthogonality AND residual
    from tsqr_tpu.core.cholqr import cholqr3_fused
    a = _rand(2048, 64, seed=9)
    q, r = cholqr3_fused(jnp.asarray(a), mode, interpret=True,
                         variant="compact")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-6
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-6
    assert np.allclose(np.triu(np.asarray(r)), np.asarray(r))


def test_cholqr3_compact_ill_conditioned_interpret():
    # kappa=1e4: inside shifted-CholQR3's contract; compact must match
    # the safe variant's robustness (the relaxed middle pass is
    # path-only — its error is measured and repaired by the final Gram)
    from tsqr_tpu.core.cholqr import cholqr3_fused
    key = jax.random.PRNGKey(3)
    a, measured = latms.rand_matrix_with_cond(key, 4096, 64, 1e4)
    assert measured > 0.9e4
    q, r = cholqr3_fused(a, "bf16x6_cor", interpret=True,
                         variant="compact")
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(np.asarray(a), q, np.asarray(r)) < 2e-4


def test_cholqr3_compact_contract_errors():
    from tsqr_tpu.core.cholqr import cholqr3_fused
    a = jnp.asarray(_rand(512, 64))
    with pytest.raises(ValueError, match="cheap-dot"):
        cholqr3_fused(a.astype(jnp.bfloat16), "bf16", interpret=True,
                      variant="compact")
    with pytest.raises(ValueError, match="recompute pipeline"):
        cholqr3_fused(a, "bf16x6_cor", interpret=True, variant="safe",
                      inplace=True)
    wide = jnp.asarray(_rand(4096, 2048))
    with pytest.raises(ValueError, match="fused-kernel range"):
        cholqr3_fused(wide, "bf16x6_cor", interpret=True,
                      variant="compact")


def test_fused_cheap_mode_recompute_pipeline_interpret():
    # bf16_nocor goes through the recompute-Q1 pipeline (4 HBM passes);
    # accuracy must be at the mode's own (uncorrected bf16) grade
    from tsqr_tpu.core.cholqr import cholqr2_fused
    a = _rand(2048, 64, seed=11)
    q, r = cholqr2_fused(jnp.asarray(a), "bf16_nocor", interpret=True)
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-2
    assert validation.residual(a, q, np.asarray(r, np.float64)) < 1e-2


def test_cholqr1_bf16_grade():
    # single-pass CholeskyQR: the MFU vehicle for bf16 IO — orthogonality
    # at bf16 grade (Q storage rounds at ~4e-3), residual likewise
    from tsqr_tpu.core.cholqr import cholqr1, cholqr1_fused
    a = _rand(4096, 128, seed=12)
    for fn, kw in ((cholqr1, {}), (cholqr1_fused, {"interpret": True})):
        q, r = fn(jnp.asarray(a), "bf16", **kw)
        assert q.dtype == jnp.bfloat16
        q64 = np.asarray(q, np.float64)
        assert validation.orthogonality(q64) < 5e-2
        assert validation.residual(a, q64, np.asarray(r, np.float64)) < 5e-2


def test_stream_pallas_gram_only_matches():
    # gram-only pass (no Q write) == gram of the explicitly computed Q
    from tsqr_tpu.ops import pallas_gram
    a = _rand(1024, 64, seed=10)
    aj = jnp.asarray(a)
    g = pallas_gram.gram_pallas(aj, "fp32", chunk=256, interpret=True)
    from tsqr_tpu.core.cholqr import _chol_r, _rinv
    r1 = _chol_r(g)
    p = pallas_gram.stream_pallas(aj, (_rinv(r1),), ("fp32",),
                                  gram_mode="fp32", chunk=256,
                                  interpret=True)
    g2 = np.asarray(p + p.T)
    q1 = np.asarray(aj, np.float64) @ np.linalg.inv(np.asarray(r1, np.float64))
    g2_ref = q1.T @ q1
    np.testing.assert_allclose(g2, g2_ref, rtol=0, atol=1e-5)


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


# ---- iterated shifted CholeskyQR (the deep-kappa Gram method) ----


@pytest.mark.parametrize("kappa", [1.0, 1e4, 1e6])
def test_cholqr_iter_xla_deep_kappa(kappa):
    # the while_loop of shifted passes must converge to eps-grade
    # orthogonality far beyond cholqr3's ~2e4 contract (measured
    # contraction ~2.3x per shifted pass; see cholqr_iter docstring)
    m, n = 4096, 96
    if kappa == 1.0:
        a = jnp.asarray(_rand(m, n, seed=3))
    else:
        a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(int(kappa)),
                                           m, n, kappa)
    q, r = cholqr.cholqr_iter(a, "fp32")
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.allclose(np.triu(r64), r64)
    assert validation.orthogonality(q64) < 1e-6
    assert validation.residual(np.asarray(a, np.float64), q64, r64) < 1e-5


@pytest.mark.parametrize("kappa", [1e4, 1e6])
def test_cholqr_iter_fused_interpret_deep_kappa(kappa):
    # the streaming variant: same convergence, plus the free in-pass
    # Q-Gram gate must report the same accuracy grade as the true
    # orthogonality (it is the ladder's tier-3 acceptance signal)
    m, n = 4096, 96
    a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(int(kappa) + 1),
                                       m, n, kappa)
    q, r, gq = cholqr.cholqr_iter_fused(a, "bf16x6_cor", interpret=True,
                                        return_qgram=True)
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    gate = float(jnp.linalg.norm(gq - jnp.eye(n)) / jnp.sqrt(n * 1.0))
    assert validation.orthogonality(q64) < 1e-6
    assert gate < 1e-6
    assert validation.residual(np.asarray(a, np.float64), q64, r64) < 1e-5


def test_cholqr_iter_benign_skips_loop():
    # a well-conditioned input must clear the polish threshold at the
    # initial bound, so the loop body never runs and the result is
    # plain CholeskyQR2 accuracy
    a = jnp.asarray(_rand(2048, 64, seed=11))
    q, r = cholqr.cholqr_iter(a, "fp32")
    assert validation.orthogonality(np.asarray(q, np.float64)) < 1e-6


def test_cholqr_iter_g1_hook_matches():
    # supplying the precomputed Gram (the ladder's tier-0 hook) must
    # not change the result
    from tsqr_tpu import modes as modes_mod
    a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(77), 2048, 64,
                                       1e5)
    pol = modes_mod.resolve("fp32")
    g = modes_mod.gram(a.astype(jnp.float32), pol)
    q0, r0 = cholqr.cholqr_iter(a, "fp32")
    q1, r1 = cholqr.cholqr_iter(a, "fp32", g1=g)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_cholqr_iter_cheap_modes_raise():
    a = jnp.asarray(_rand(512, 64))
    with pytest.raises(ValueError):
        cholqr.cholqr_iter(a, "bf16")
    with pytest.raises(ValueError):
        cholqr.cholqr_iter_fused(a, "bf16_nocor", interpret=True)


def test_cholqr_iter_max_shifted_bounds_work():
    # an exactly rank-deficient input cannot be contracted: the loop
    # must exit at max_shifted (not hang), and the result is still a
    # VALID factorization (rounding noise seeds the null directions,
    # exactly as Householder's arbitrary completion does) OR NaN —
    # either way the ladder's measured gate decides; what matters here
    # is termination and no exception
    b = _rand(1024, 32, seed=13)
    a = jnp.asarray(np.concatenate([b, b], axis=1))  # exact rank 32
    q, r = cholqr.cholqr_iter(a, "fp32", max_shifted=3)
    assert q.shape == (1024, 64) and r.shape == (64, 64)


def test_narrow_sublane_packing():
    # round-5: narrow panels (n <= 64) run sublane-PACKED — (m, n)
    # viewed as (m/p, p*n) with p = 128//n so every m-scale pass
    # streams 128 lanes wide.  Pin the pack factors and that the packed
    # pipelines keep full accuracy grade (incl. the zero-pad path when
    # p does not divide m).
    assert cholqr._pack_factor(4096, 16) == 8
    assert cholqr._pack_factor(4096, 51) == 2
    assert cholqr._pack_factor(4096, 64) == 2
    assert cholqr._pack_factor(4096, 65) == 1   # wide enough already
    assert cholqr._pack_factor(512, 16) == 1    # too few rows to matter
    rng = np.random.default_rng(11)
    for m in (4096, 4001):  # 4001: zero-pad path (8 does not divide m)
        a = rng.uniform(-1, 1, (m, 16)).astype(np.float32)
        for method in ("cholqr1", "cholqr2", "cholqr3"):
            q, r = cholqr.fastqr(jnp.asarray(a), "bf16x6_cor",
                                 method=method)
            qn = np.asarray(q, np.float64)
            rn = np.asarray(r, np.float64)
            assert q.shape == (m, 16) and np.allclose(np.triu(rn), rn)
            assert validation.residual(a, qn, rn) < 2e-6
            assert (np.linalg.norm(qn.T @ qn - np.eye(16)) / 4.0
                    < (5e-5 if method == "cholqr1" else 1e-5))


def test_qr_packed_matches_unpacked():
    # packed-IO contract: qr_packed on the pack_panel view must equal
    # fastqr on the unpacked panel (same algorithms, no pack/unpack
    # round trips in the middle), including the ragged-m zero-pad case
    from tsqr_tpu.core import cholqr as cq
    for m, n, method, mode, tol in [(4096, 16, "cholqr2", "fp32", 1e-6),
                                    (4096, 32, "cholqr1", "bf16", 1e-2),
                                    (1000, 16, "cholqr3", "fp32", 1e-6),
                                    (4096, 16, "cholqr2", "bf16x6_cor", 1e-6)]:
        key = jax.random.PRNGKey(m + n)
        a = jax.random.uniform(key, (m, n), jnp.float32, -1, 1)
        ap = cq.pack_panel(a)
        qp, r = cq.qr_packed(ap, n, mode, method=method)
        q = cq.unpack_panel(qp, m, n)
        q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
        a64 = np.asarray(a, np.float64)
        assert validation.orthogonality(q64) < 10 * tol, (m, n, method)
        assert (np.linalg.norm(a64 - q64 @ np.triu(r64))
                / np.linalg.norm(a64)) < 10 * tol, (m, n, method)
        qu, ru = cq.fastqr(a, mode, method=method)
        np.testing.assert_allclose(q64, np.asarray(qu, np.float64),
                                   atol=5 * tol, rtol=0)
        np.testing.assert_allclose(r64, np.asarray(ru, np.float64),
                                   atol=5 * tol * np.abs(r64).max(), rtol=0)


def test_qr_packed_rejects_bad_width():
    from tsqr_tpu.core import cholqr as cq
    ap = jnp.zeros((64, 120))
    with pytest.raises(ValueError):
        cq.qr_packed(ap, 16, "fp32")
    with pytest.raises(ValueError):
        cq.pack_panel(jnp.zeros((256, 80)))
