"""Out-of-core streaming QR + self-validating auto driver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import auto, ooc
from tsqr_tpu.utils import latms, validation


def test_ooc_matches_in_core():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (5000, 32)).astype(np.float32)
    q, r = ooc.qr_out_of_core(a, "fp32", method="cholqr2", chunk_rows=1024)
    assert q.shape == (5000, 32) and r.shape == (32, 32)
    assert np.allclose(np.triu(r), r)
    assert validation.residual(a, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_ooc_inplace_output_aliasing():
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2048, 16)).astype(np.float32)
    a_copy = a.copy()
    q, r = ooc.qr_out_of_core(a, "fp32", method="cholqr3", chunk_rows=512,
                              out=a)  # Q overwrites A
    assert q is a
    assert validation.residual(a_copy, q, r) < 1e-6
    assert validation.orthogonality(q) < 1e-6


def test_ooc_corrected_mode():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (4096, 64)).astype(np.float32)
    q, r = ooc.qr_out_of_core(a, "bf16x6_cor", method="cholqr2",
                              chunk_rows=1024)
    assert validation.orthogonality(q.astype(np.float64)) < 1e-5
    assert validation.residual(a, q, r) < 1e-5


def test_ooc_bf16_cholqr1_and_streamed_metrics():
    # the m=2^26 capacity config in miniature: bf16 host storage,
    # single-pass CholeskyQR, metrics streamed chunk-wise (at the real
    # envelope edge Q alone exceeds HBM, so in-core metrics cannot run)
    rng = np.random.default_rng(4)
    a32 = rng.uniform(-1, 1, (4096, 64)).astype(np.float32)
    a = a32.astype(jnp.bfloat16)  # ml_dtypes bf16 numpy storage
    q, r = ooc.qr_out_of_core(a, "bf16", method="cholqr1", chunk_rows=1024)
    assert q.dtype == jnp.dtype(jnp.bfloat16)
    orth = ooc.ooc_orthogonality(q, chunk_rows=1024)
    resid = ooc.ooc_residual(a, q, r, chunk_rows=1024)
    # bf16 IO grade (Q storage rounds at ~4e-3)
    assert orth < 2e-2 and resid < 2e-2
    # streamed metrics agree with the host fp64 golden at this size
    assert abs(orth - validation.orthogonality(q.astype(np.float64))) < 1e-3
    assert abs(resid - validation.residual(
        a32, q.astype(np.float64), r.astype(np.float64))) < 1e-3


def test_ooc_inpass_metrics_cholqr1():
    # metrics=True must agree with the separate streamed passes (cholqr1:
    # the in-pass residual IS ||A - QR||/||A||) without re-reading A
    rng = np.random.default_rng(6)
    a32 = rng.uniform(-1, 1, (4096, 64)).astype(np.float32)
    a = a32.astype(jnp.bfloat16)
    q, r, info = ooc.qr_out_of_core(a, "bf16", method="cholqr1",
                                    chunk_rows=1024, metrics=True)
    assert abs(info["orthogonality"]
               - validation.orthogonality(q.astype(np.float64))) < 1e-3
    assert abs(info["residual"] - validation.residual(
        a32, q.astype(np.float64), r.astype(np.float64))) < 1e-3


def test_ooc_inpass_metrics_inplace():
    # the capacity posture: out=a destroys A, so in-pass metrics are the
    # only residual evidence — and they must match a golden computed from
    # a pre-destruction copy
    rng = np.random.default_rng(7)
    a32 = rng.uniform(-1, 1, (2048, 32)).astype(np.float32)
    a = a32.copy()
    q, r, info = ooc.qr_out_of_core(a, "fp32", method="cholqr1",
                                    chunk_rows=512, out=a, metrics=True)
    assert q is a
    assert abs(info["residual"]
               - validation.residual(a32, q, r)) < 1e-6
    assert info["orthogonality"] < 1e-5


def test_qr_regen_matches_materialized():
    # the matrix-free pipeline must produce the same R and quality as the
    # in-core method on the materialized matrix from the same generator
    key = jax.random.PRNGKey(0)
    m, n, chunk = 4096, 64, 1024
    gen = ooc.uniform_gen(key, chunk, n, dtype=jnp.float32)
    a = jnp.concatenate([gen(i) for i in range(m // chunk)], axis=0)
    r, info = ooc.qr_regen(gen, m, n, "fp32", method="cholqr2",
                           chunk_rows=chunk)
    assert float(info["orthogonality"]) < 1e-6
    assert float(info["residual"]) < 1e-6
    # R matches a direct dense QR of the same matrix up to column signs
    r_ref = np.linalg.qr(np.asarray(a, np.float64))[1]
    s = np.sign(np.diag(r_ref)) * np.sign(np.diag(np.asarray(r)))
    assert np.allclose(np.asarray(r, np.float64) * s[:, None], r_ref,
                       rtol=0, atol=1e-3 * np.abs(r_ref).max())
    # a consumer materializes Q chunks via info["rinv"]
    q0 = np.asarray(gen(0) @ info["rinv"])
    assert np.allclose(q0, np.asarray(a[:chunk] @ info["rinv"]))


def test_qr_regen_bf16_and_cholqr3():
    key = jax.random.PRNGKey(1)
    m, n, chunk = 4096, 64, 512
    gen = ooc.uniform_gen(key, chunk, n, dtype=jnp.bfloat16)
    r, info = ooc.qr_regen(gen, m, n, "bf16", method="cholqr1",
                           chunk_rows=chunk)
    assert float(info["orthogonality"]) < 2e-2  # bf16 io grade
    assert float(info["residual"]) < 2e-2
    r3, info3 = ooc.qr_regen(gen, m, n, "bf16x6_cor", method="cholqr3",
                             chunk_rows=chunk)
    assert float(info3["orthogonality"]) < 1e-5
    assert float(info3["residual"]) < 1e-5


def test_qr_regen_cholqr_iter_deep_kappa():
    # the iterated shifted rung, matrix-free: a kappa ~1e6 input (far
    # beyond cholqr3's contract) regenerated chunkwise must converge to
    # fp32-grade orthogonality with a dynamic number of streamed passes
    from tsqr_tpu.utils import latms
    m, n, chunk = 4096, 64, 1024
    a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(40), m, n, 1e6)
    a32 = a.astype(jnp.float32)

    def gen(i):
        return jax.lax.dynamic_slice(a32, (i * chunk, 0), (chunk, n))

    r, info = ooc.qr_regen(gen, m, n, "fp32", method="cholqr_iter",
                           chunk_rows=chunk)
    assert float(info["orthogonality"]) < 1e-5
    assert float(info["residual"]) < 1e-4
    # benign input must also work (loop skipped, polish only)
    gen_u = ooc.uniform_gen(jax.random.PRNGKey(2), chunk, n,
                            dtype=jnp.float32)
    r2, info2 = ooc.qr_regen(gen_u, m, n, "fp32", method="cholqr_iter",
                             chunk_rows=chunk)
    assert float(info2["orthogonality"]) < 1e-6
    # cheap-dot modes are rejected with the same contract as
    # cholqr.cholqr_iter (their Gram noise floor defeats both exit
    # signals — the loop would burn max_shifted full regenerations)
    with pytest.raises(ValueError, match="cheap-dot"):
        ooc.qr_regen(gen_u, m, n, "bf16", method="cholqr_iter",
                     chunk_rows=chunk)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="capacity shape needs the real chip")
def test_ooc_tpu_gated_smoke():
    # TPU-gated lane: the OOC driver against the real chip at a shape
    # that exercises multi-chunk streaming (not the 2^26 campaign — that
    # runs via scripts/run_ooc_big.py — but the same code path on-chip)
    rng = np.random.default_rng(5)
    a = rng.uniform(-1, 1, (1 << 21, 128)).astype(np.float32)
    q, r = ooc.qr_out_of_core(a, "bf16x6_cor", method="cholqr2",
                              chunk_rows=1 << 19)
    assert ooc.ooc_orthogonality(q, chunk_rows=1 << 19) < 1e-5
    assert ooc.ooc_residual(a, q, r, chunk_rows=1 << 19) < 1e-5


def test_auto_uses_fast_path_when_well_conditioned():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (2048, 32)).astype(np.float32))
    q, r, used = auto.qr_auto(a, "fp32")
    assert used == "cholqr3"
    assert validation.orthogonality(np.asarray(q)) < 1e-5


def test_auto_falls_back_on_extreme_condition():
    # kappa ~ 1e8 in fp32 breaks even shifted CholeskyQR3 -> must fall back
    key = jax.random.PRNGKey(4)
    a, measured = latms.rand_matrix_with_cond(key, 2048, 32, 3e7)
    q, r, used = auto.qr_auto(a, "fp32", leaf_rows=256)
    assert validation.orthogonality(np.asarray(q, np.float64)) < 1e-5
    # whichever path was used, the result must be orthogonal; on this
    # conditioning the fast path misses tolerance and escalates — to
    # the shifted-QR3, iterated, or tree rung depending on the
    # platform's measured gates
    assert used in ("cholqr3", "cholqr_iter", "blockqr_tsqr")
    assert validation.residual(np.asarray(a), np.asarray(q),
                               np.asarray(r)) < 1e-4


def test_auto_fused_fast_branch():
    # well-conditioned input: the one-program driver must pass the gate
    # and return the fast-path result (fp32-grade orthogonality)
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(-1, 1, (2048, 32)).astype(np.float32))
    q, r = auto.qr_auto_fused(a, "fp32", fast_method="cholqr2",
                              leaf_rows=256)
    q, r = np.asarray(q), np.asarray(r)
    assert np.allclose(np.triu(r), r)
    assert validation.orthogonality(q) < 1e-6
    assert validation.residual(np.asarray(a), q, r) < 1e-6


def test_auto_fused_robust_branch():
    # kappa ~ 3e7: the in-program gate must trip and the robust branch
    # must produce orthogonal output in the SAME dispatch
    key = jax.random.PRNGKey(6)
    a, _ = latms.rand_matrix_with_cond(key, 2048, 32, 3e7)
    q, r = auto.qr_auto_fused(a, "fp32", fast_method="cholqr2",
                              leaf_rows=256)
    q = np.asarray(q, np.float64)
    assert validation.orthogonality(q) < 1e-5
    assert validation.residual(np.asarray(a), q,
                               np.asarray(r, np.float64)) < 1e-4


@pytest.mark.parametrize("kappa,want_tol", [(1.0, 1e-6), (1e4, 1e-6),
                                            (1e7, 1e-6)])
def test_predictive_ladder_three_regimes(kappa, want_tol):
    # the full predictive ladder (cholqr1 -> cholqr3 -> iterated
    # shifted cholqr -> the Householder tree) must deliver fp32-grade
    # orthogonality at every conditioning regime — kappa ~ 1 lands
    # tier 1, ~1e4 tier 2 (within shifted-CholeskyQR3 coverage), ~1e7
    # the iterated rung (or deeper, wherever the measured gates route)
    if kappa == 1.0:
        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.uniform(-1, 1, (4096, 96)).astype(np.float32))
    else:
        a, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(int(kappa)),
                                           4096, 96, kappa)
    q, r = auto.qr_auto_fused(a, "fp32", fast_method="cholqr1",
                              mid_method="cholqr3", mid_variant="safe",
                              leaf_rows=512)
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert validation.orthogonality(q64) < want_tol
    assert np.allclose(np.triu(r64), r64)
    assert validation.residual(np.asarray(a), q64, r64) < 1e-4


def test_ooc_checkpoint_matches_plain_and_resumes(tmp_path):
    # (1) an uninterrupted checkpointed run must match the plain path
    # bitwise (the recompute-from-A chain pays identical io-dtype
    # rounding to the stored-Q path); (2) killing the run at chunk
    # boundaries across every phase (gram passes, chain extensions, the
    # Q pass) and resuming must reproduce the same result; (3) the
    # checkpoint file is removed on completion
    rng = np.random.default_rng(9)
    a = rng.uniform(-1, 1, (4096, 48)).astype(np.float32)
    ref_q, ref_r, ref_info = ooc.qr_out_of_core(
        a, "fp32", method="cholqr3", chunk_rows=512, metrics=True)

    ck = tmp_path / "ck.npz"
    out = np.empty_like(a)
    q, r, info = ooc.qr_out_of_core(a, "fp32", method="cholqr3",
                                    chunk_rows=512, metrics=True,
                                    out=out, checkpoint=ck)
    assert not ck.exists()
    assert np.array_equal(q, ref_q)
    assert np.array_equal(r, ref_r)
    assert abs(info["orthogonality"] - ref_info["orthogonality"]) < 1e-12
    assert abs(info["residual"] - ref_info["residual"]) < 1e-12

    # 8 chunks/pass, cholqr3 checkpointed = 3 gram passes + 2 chain
    # extensions + 1 Q pass = 34 steps; hit every phase
    for k in (1, 9, 17, 26, 33):
        ck2 = tmp_path / f"ck{k}.npz"
        out2 = np.empty_like(a)
        with pytest.raises(ooc.OOCInterrupted):
            ooc.qr_out_of_core(a, "fp32", method="cholqr3",
                               chunk_rows=512, metrics=True, out=out2,
                               checkpoint=ck2, _fault_after=k)
        assert ck2.exists()
        q2, r2, info2 = ooc.qr_out_of_core(a, "fp32", method="cholqr3",
                                           chunk_rows=512, metrics=True,
                                           out=out2, checkpoint=ck2)
        assert np.array_equal(q2, ref_q), f"resume at step {k}"
        assert np.array_equal(r2, ref_r), f"resume at step {k}"
        assert abs(info2["orthogonality"]
                   - ref_info["orthogonality"]) < 1e-12

    # double interruption: crash, resume-and-crash again, then finish
    ck3 = tmp_path / "ck3.npz"
    out3 = np.empty_like(a)
    with pytest.raises(ooc.OOCInterrupted):
        ooc.qr_out_of_core(a, "fp32", method="cholqr3", chunk_rows=512,
                           metrics=True, out=out3, checkpoint=ck3,
                           _fault_after=5)
    with pytest.raises(ooc.OOCInterrupted):
        ooc.qr_out_of_core(a, "fp32", method="cholqr3", chunk_rows=512,
                           metrics=True, out=out3, checkpoint=ck3,
                           _fault_after=12)
    q3, r3, _ = ooc.qr_out_of_core(a, "fp32", method="cholqr3",
                                   chunk_rows=512, metrics=True,
                                   out=out3, checkpoint=ck3)
    assert np.array_equal(q3, ref_q) and np.array_equal(r3, ref_r)


def test_ooc_checkpoint_guards(tmp_path):
    rng = np.random.default_rng(10)
    a = rng.uniform(-1, 1, (1024, 16)).astype(np.float32)
    ck = tmp_path / "g.npz"
    # in-place (out aliasing a) cannot be checkpointed
    with pytest.raises(ValueError):
        ooc.qr_out_of_core(a, "fp32", method="cholqr1", chunk_rows=256,
                           out=a, checkpoint=ck)
    # a checkpoint from one config must be refused by another
    out = np.empty_like(a)
    with pytest.raises(ooc.OOCInterrupted):
        ooc.qr_out_of_core(a, "fp32", method="cholqr2", chunk_rows=256,
                           out=out, checkpoint=ck, _fault_after=2)
    with pytest.raises(ValueError):
        ooc.qr_out_of_core(a, "fp32", method="cholqr2", chunk_rows=128,
                           out=out, checkpoint=ck)  # different chunking
    with pytest.raises(ValueError):
        ooc.qr_out_of_core(a[::-1].copy(), "fp32", method="cholqr2",
                           chunk_rows=256, out=out,
                           checkpoint=ck)  # different input


def test_predictive_kappa2_estimate_dominates():
    # the tier-0 bound must never under-report kappa_2(A)^2 (the
    # power-compounded PSD inf-norm argument in _psd_norm2_bound's
    # docstring), must never exceed the plain inf-norm product it
    # replaced, and should stay within ~2x of true kappa^2 (the round-3
    # tightening: the plain product overshot ~7x on latms spectra) —
    # checked across the latms kappa range
    from tsqr_tpu import modes
    from tsqr_tpu.core import cholqr

    for k, kappa in ((10, 10.0), (11, 1e2), (12, 1e3)):
        a, measured = latms.rand_matrix_with_cond(jax.random.PRNGKey(k),
                                                  2048, 64, kappa)
        g = modes.gram(a.astype(jnp.float32), modes.resolve("fp32"))
        g = (g + g.T) * 0.5
        rinv1 = cholqr._rinv(cholqr._chol_r(g, shift=None))
        minv = modes.mm_fp32(rinv1, rinv1.T)
        est = float((auto._psd_norm2_bound(g)
                     * auto._psd_norm2_bound(minv))[0, 0])
        inf_prod = float((auto._inf_norm11(g)
                          * auto._inf_norm11(minv))[0, 0])
        assert est > 0.95 * measured ** 2
        assert est <= inf_prod * 1.0001
        assert est < 2.5 * measured ** 2


def test_qr_auto_fused_return_info_tiers():
    # the fused ladder's tier tag must report the rung that actually
    # ran: benign -> 1 (fast CholQR), kappa ~1e3 -> 2 (robust shifted
    # CholQR3), exactly rank-deficient -> 3 (the iterated rung's
    # rounding noise seeds the null directions into a valid orthonormal
    # completion, exactly as Householder's arbitrary completion would),
    # zeroed-column input -> 4 (nothing Gram-based passes a measured
    # gate; NaN Cholesky falls all the way through to Householder) —
    # and the (q, r) outputs must match the info-less program exactly
    kw = dict(fast_method="cholqr1", mid_method="cholqr3",
              mid_variant="safe", leaf_rows=512)

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(-1, 1, (4096, 96)).astype(np.float32))
    q, r, info = auto.qr_auto_fused(a, "fp32", return_info=True, **kw)
    assert int(info["tier"][0, 0]) == 1
    assert float(info["kappa2_est"][0, 0]) < 1e3
    q0, r0 = auto.qr_auto_fused(a, "fp32", **kw)
    assert np.array_equal(np.asarray(q), np.asarray(q0))
    assert np.array_equal(np.asarray(r), np.asarray(r0))

    a2, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(21), 4096, 96,
                                        1e3)
    _, _, info2 = auto.qr_auto_fused(a2, "fp32", return_info=True, **kw)
    assert int(info2["tier"][0, 0]) == 2

    bad = jnp.concatenate([a[:, :48], a[:, :48]], axis=1)  # exact rank 48
    q3, r3, info3 = auto.qr_auto_fused(bad, "fp32", return_info=True, **kw)
    assert int(info3["tier"][0, 0]) == 3
    q3_64 = np.asarray(q3, np.float64)
    assert validation.orthogonality(q3_64) < 1e-5
    assert validation.residual(np.asarray(bad, np.float64), q3_64,
                               np.asarray(r3, np.float64)) < 1e-5

    az = np.asarray(a).copy()
    az[:, 33] = 0.0  # a zero column defeats every Gram method
    q4, _, info4 = auto.qr_auto_fused(jnp.asarray(az), "fp32",
                                      return_info=True, **kw)
    assert int(info4["tier"][0, 0]) == 4
    assert validation.orthogonality(np.asarray(q4, np.float64)) < 1e-5


def test_psd_norm2_bound_scale_invariant():
    # the pre-scaling makes the 4th power safe at any input magnitude:
    # the bound must survive scales that would overflow/underflow a
    # naive X^4 in fp32, and stay proportional to the scale
    rng = np.random.default_rng(5)
    v = rng.standard_normal((64, 64)).astype(np.float32)
    x = jnp.asarray(v @ v.T)
    base = float(auto._psd_norm2_bound(x)[0, 0])
    lam = float(jnp.linalg.eigvalsh(x)[-1])
    assert base >= 0.999 * lam and base < 2.0 * lam
    for scale in (1e-30, 1e30):
        got = float(auto._psd_norm2_bound(x * scale)[0, 0])
        assert np.isfinite(got)
        assert abs(got / (base * scale) - 1.0) < 1e-3


def test_auto_fused_defaults_compile_off_fused_backend():
    # REGRESSION: with the DEFAULT methods ("cholqr1_fused"/
    # "cholqr3_fused") and 64 <= n, a non-TPU backend used to trace
    # compiled Pallas through the mid tier ("Only interpret mode is
    # supported on CPU backend") — the ladder must delegate each
    # off-fused-range tier to its XLA sibling instead.
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.uniform(-1, 1, (2048, 64)).astype(np.float32))
    q, r, info = auto.qr_auto_fused(a, "fp32", return_info=True)
    assert int(info["tier"][0, 0]) == 1
    qn = np.asarray(q, np.float64)
    assert validation.orthogonality(qn) < 1e-6
    assert validation.residual(np.asarray(a, np.float64), qn,
                               np.asarray(r, np.float64)) < 1e-6


def test_auto_fused_corrected_above_fused_n_max():
    # REGRESSION: n > _fused_n_max for a corrected mode used to hit the
    # compact-pipeline capacity ValueError at TRACE time through the
    # ladder's mid tier; now it delegates to the XLA cholqr3 sibling
    # and the full ladder compiles and runs at any n.
    rng = np.random.default_rng(12)
    n = 1056  # just above _fused_n_max(bf16x6_cor) = 1024
    a = jnp.asarray(rng.uniform(-1, 1, (2048, n)).astype(np.float32))
    q, r, info = auto.qr_auto_fused(a, "bf16x6_cor", return_info=True)
    assert int(info["tier"][0, 0]) in (1, 2)
    qn = np.asarray(q, np.float64)
    assert validation.orthogonality(qn) < 5e-6
    assert validation.residual(np.asarray(a, np.float64), qn,
                               np.asarray(r, np.float64)) < 5e-6


def test_sharpened_gate_admits_mild_kappa():
    # round-5 (VERDICT r4 weak #3): the X^16-compounded bound overshoots
    # ~1.12x (measured), so kappa=4 (true kappa^2 = 16, below the
    # tier-1 gate ~20.8 at fp32/bf16x6 grade) now admits the FAST tier;
    # kappa=8 (kappa^2 = 64) must still route robust.  The bound stays
    # a rigorous upper bound: est >= measured kappa^2 in every case.
    kw = dict(fast_method="cholqr1", mid_method="cholqr3",
              mid_variant="safe", leaf_rows=512)
    a4, meas4 = latms.rand_matrix_with_cond(jax.random.PRNGKey(1),
                                            1 << 14, 128, 4.0)
    q, _, info = auto.qr_auto_fused(a4, "fp32", return_info=True, **kw)
    est = float(info["kappa2_est"][0, 0])
    assert int(info["tier"][0, 0]) == 1, est
    assert meas4 ** 2 * 0.999 <= est < 20.8
    assert validation.orthogonality(np.asarray(q, np.float64)) < 1e-5

    a8, meas8 = latms.rand_matrix_with_cond(jax.random.PRNGKey(2),
                                            1 << 14, 128, 8.0)
    _, _, info8 = auto.qr_auto_fused(a8, "fp32", return_info=True, **kw)
    assert int(info8["tier"][0, 0]) == 2
    assert float(info8["kappa2_est"][0, 0]) >= meas8 ** 2 * 0.999
