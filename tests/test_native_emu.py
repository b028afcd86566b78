"""Cross-language golden: the C++ emulation cores must agree with the JAX
precision policies (two independent implementations of the reference's
matmul.hpp arithmetic pin down its semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu import modes
from tsqr_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def _build():
    native._load()


def test_clip_mantissa_cross_language():
    rng = np.random.default_rng(0)
    xs = rng.uniform(-4, 4, 256).astype(np.float32)
    for bits in (7, 10):
        jx = np.asarray(modes.clip_mantissa(jnp.asarray(xs), bits))
        cx = np.array([native.clip_mantissa_scalar(float(x), bits)
                       for x in xs], np.float32)
        np.testing.assert_array_equal(jx, cx)


def test_nocor_gemm_matches_jax_emulator():
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (32, 48)).astype(np.float32)
    b = rng.uniform(-1, 1, (48, 24)).astype(np.float32)
    cpp = native.emu_gemm_nocor(a, b, bits=7)
    jx = np.asarray(modes.mm_bf16_nocor_emu(jnp.asarray(a), jnp.asarray(b)))
    # accumulation order differs (C++ sequential vs XLA), so compare to the
    # fp32 round-off level, far below the bf16-grade signal (~4e-3)
    assert np.max(np.abs(cpp - jx)) < 1e-4
    exact = a.astype(np.float64) @ b.astype(np.float64)
    # both must show the same bf16-grade error signature
    e_cpp = np.abs(cpp - exact).max()
    e_jx = np.abs(jx - exact).max()
    assert 0.25 < e_cpp / e_jx < 4.0


def test_cor_gemm_matches_jax_emulator():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (16, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (64, 16)).astype(np.float32)
    cpp = native.emu_gemm_cor(a, b, bits=7)
    jx = np.asarray(modes.mm_bf16x3_cor_emu(jnp.asarray(a), jnp.asarray(b)))
    assert np.max(np.abs(cpp - jx)) < 1e-5
    exact = a.astype(np.float64) @ b.astype(np.float64)
    assert np.abs(cpp - exact).max() < 1e-4  # corrected grade


def test_mixed_gemm_runs():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (8, 32)).astype(np.float32)
    b = rng.uniform(-1, 1, (32, 8)).astype(np.float32)
    cpp = native.emu_gemm_mixed(a, b, bits=7)
    exact = a.astype(np.float64) @ b.astype(np.float64)
    assert np.abs(cpp - exact).max() < 1e-4
