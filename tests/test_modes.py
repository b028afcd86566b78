"""Precision-policy unit tests: splits, clipped emulation, corrected matmuls
(≙ the reference's TC-emulator cross-checks, matmul.hpp:26-209, and the
fp32->half+residual splitters, matrix_operations.cuh:42-141)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu import modes


def test_clip_mantissa_idempotent_and_coarse():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(64, 64)).astype(np.float32)
    y = np.asarray(modes.clip_mantissa(jnp.asarray(x), 7))
    y2 = np.asarray(modes.clip_mantissa(jnp.asarray(y), 7))
    np.testing.assert_array_equal(y, y2)
    # clipping to 7 bits == bf16 rounding of the mantissa
    bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(y, bf)


def test_clip_mantissa_preserves_specials():
    x = np.array([np.inf, -np.inf, np.nan, 0.0, -0.0], np.float32)
    y = np.asarray(modes.clip_mantissa(jnp.asarray(x), 10))
    assert np.isposinf(y[0]) and np.isneginf(y[1]) and np.isnan(y[2])
    assert y[3] == 0 and y[4] == 0


def test_split2_exact_reconstruction_error():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(128,)).astype(np.float32)
    hi, lo = modes.split2(jnp.asarray(x))
    rec = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    # 2-way split captures ~16 mantissa bits
    assert np.max(np.abs(rec - x) / np.maximum(np.abs(x), 1e-30)) < 2 ** -15


def test_split3_near_exact():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, size=(128,)).astype(np.float32)
    t0, t1, t2 = modes.split3(jnp.asarray(x))
    rec = (np.asarray(t0, np.float64) + np.asarray(t1, np.float64)
           + np.asarray(t2, np.float64))
    assert np.max(np.abs(rec - x) / np.maximum(np.abs(x), 1e-30)) < 2 ** -23


def _mm_err(mm, k=512, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, size=(128, k)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(k, 128)).astype(np.float32)
    exact = a.astype(np.float64) @ b.astype(np.float64)
    got = np.asarray(mm(jnp.asarray(a), jnp.asarray(b)), np.float64)
    return np.linalg.norm(got - exact) / np.linalg.norm(exact)


def test_corrected_matmul_accuracy_ladder():
    e_bf16 = _mm_err(modes.mm_bf16)
    e_cor3 = _mm_err(modes.mm_bf16x3_cor)
    e_cor6 = _mm_err(modes.mm_bf16x6_cor)
    e_fp32 = _mm_err(modes.mm_fp32)
    assert e_cor3 < e_bf16 / 50
    assert e_cor6 < e_bf16 / 1000
    assert e_cor6 < 1e-6
    assert e_fp32 < 1e-6


def test_emu_matches_real_split_grade():
    # the clipped-fp32 emulator should land in the same accuracy decade as
    # the true bf16 path (they differ only in accumulation order)
    e_emu = _mm_err(modes.mm_bf16_nocor_emu)
    e_real = _mm_err(modes.mm_bf16)
    assert 0.02 < e_emu / e_real < 50
    e_cor_emu = _mm_err(modes.mm_bf16x3_cor_emu)
    e_cor = _mm_err(modes.mm_bf16x3_cor)
    assert 0.02 < e_cor_emu / e_cor < 50


def test_three_term_correction_not_worse():
    e2 = _mm_err(modes.mm_bf16x3_cor)
    e3 = _mm_err(modes.mm_bf16x3_cor_3term)
    assert e3 <= e2 * 1.1


def test_corrected_matmul_survives_jit():
    # regression: XLA's algebraic simplifier used to fold the split
    # correction away under jit (convert-pair folding + dot reassociation),
    # silently degrading *_cor modes to plain bf16.  The optimization
    # barriers in modes.py must keep jit == eager.
    import jax
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(-1, 1, size=(64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, size=(64, 64)).astype(np.float32))
    for mm in [modes.mm_bf16x3_cor, modes.mm_bf16x6_cor,
               modes.mm_bf16x3_cor_3term]:
        eager = np.asarray(mm(a, b))
        jitted = np.asarray(jax.jit(mm)(a, b))
        np.testing.assert_array_equal(eager, jitted)


def test_resolve_roundtrip():
    for mode in modes.ALL_MODES:
        p = modes.resolve(mode)
        assert p.mode is mode
        assert modes.resolve(mode.value) is p
        assert modes.resolve(p) is p
