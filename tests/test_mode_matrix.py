"""Full mode-coverage matrix: every ComputeMode through every algorithm
path must produce finite results inside its accuracy class (the complete
explicit-instantiation coverage of the reference, blockqr.cu:436-456 +
tsqr.cu:1313-1323 + tcqr32x16.cu:1608-1646)."""

import jax.numpy as jnp
import numpy as np
import pytest

import tsqr_tpu
from tsqr_tpu import modes
from tsqr_tpu.core import cholqr, tsqr as tsqr_mod
from tsqr_tpu.utils import validation

# per-mode orthogonality acceptance (~10x intrinsic grade)
GRADE = {
    "fp32": 1e-5, "bf16": 6.1e-2, "bf16_nocor": 6.1e-2,
    "bf16x3_nocor": 1e-3, "bf16x3_cor": 1e-3, "bf16x6_cor": 1e-5,
    "bf16_nocor_emu": 6.1e-2, "tf32_nocor_emu": 1e-2,
    "bf16x3_cor_emu": 1e-3, "mixed_cor_emu": 1e-3,
}


def _rand(m, n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))


@pytest.mark.parametrize("mode", [m.value for m in modes.ALL_MODES])
def test_blockqr_all_modes(mode):
    a = _rand(1024, 48)
    q, r = tsqr_tpu.qr(a, mode, panel_width=16, leaf_rows=256)
    q64 = np.asarray(q, np.float64)
    r64 = np.asarray(r, np.float64)
    assert np.isfinite(q64).all() and np.isfinite(r64).all()
    assert validation.orthogonality(q64) < GRADE[mode]
    assert validation.residual(np.asarray(a, np.float64), q64,
                               r64) < GRADE[mode]


@pytest.mark.parametrize("mode", [m.value for m in modes.ALL_MODES])
def test_tsqr_all_modes(mode):
    a = _rand(2048, 16, seed=1)
    q, r = tsqr_mod.tsqr(a, mode, leaf_rows=256)
    q64 = np.asarray(q, np.float64)
    assert np.isfinite(q64).all()
    assert validation.orthogonality(q64) < GRADE[mode]


@pytest.mark.parametrize("mode", ["fp32", "bf16_nocor", "bf16x3_nocor",
                                  "bf16x3_cor", "bf16x6_cor"])
def test_cholqr_mxu_modes(mode):
    a = _rand(2048, 32, seed=2)
    q, r = cholqr.fastqr(a, mode, method="cholqr2")
    q64 = np.asarray(q, np.float64)
    assert validation.orthogonality(q64) < GRADE[mode]


def test_bf16_io_mode_dtypes():
    a = _rand(512, 16, seed=3)
    q, r = tsqr_mod.tsqr(a, "bf16", leaf_rows=256)
    assert q.dtype == jnp.bfloat16 and r.dtype == jnp.bfloat16
    q2, r2 = tsqr_tpu.qr(a, "bf16", leaf_rows=256)
    assert q2.dtype == jnp.bfloat16
