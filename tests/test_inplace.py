"""In-place (aliased) capacity pipelines: Q overwrites A's buffer.

The alias must be a pure optimization — bitwise-identical results to the
non-aliased pipelines — because each grid step reads its (chunk, n) block
before writing it (ops/pallas_gram.stream_pallas alias_q).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import cholqr
from tsqr_tpu.utils import validation


def _rand(m, n, dtype=jnp.float32, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (m, n),
                              jnp.float32, -1, 1).astype(dtype)


def test_cholqr1_fused_inplace_matches():
    a = _rand(512, 64, jnp.bfloat16)
    q0, r0 = cholqr.cholqr1_fused(a, "bf16", interpret=True)
    q1, r1 = cholqr.cholqr1_fused(a, "bf16", interpret=True, inplace=True)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


@pytest.mark.parametrize("variant", ["compact", "turbo"])
def test_cholqr2_fused_inplace_matches(variant):
    a = _rand(768, 64)
    q0, r0 = cholqr.cholqr2_fused(a, "bf16x6_cor", interpret=True,
                                  variant=variant)
    q1, r1 = cholqr.cholqr2_fused(a, "bf16x6_cor", interpret=True,
                                  variant=variant, inplace=True)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    assert validation.orthogonality(np.asarray(q1, np.float64)) < 5e-6


def test_cholqr3_fused_inplace_matches():
    # the robust capacity path: compact cholqr3 aliased over A must be
    # bitwise-identical to the non-aliased run
    a = _rand(768, 64)
    q0, r0 = cholqr.cholqr3_fused(a, "fp32", interpret=True,
                                  variant="compact")
    q1, r1 = cholqr.cholqr3_fused(a, "fp32", interpret=True,
                                  variant="compact", inplace=True)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    assert validation.orthogonality(np.asarray(q1, np.float64)) < 5e-6


def test_inplace_dtype_mismatch_raises():
    a = _rand(512, 64)  # f32 input, bf16 io_dtype
    with pytest.raises(ValueError, match="io_dtype == a.dtype"):
        cholqr.cholqr1_fused(a, "bf16", interpret=True, inplace=True)


def test_inplace_out_of_fused_range_raises():
    # silent fallback to the XLA variant would break the peak-HBM ~A
    # contract exactly at capacity shapes
    a = _rand(512, 32, jnp.bfloat16)
    with pytest.raises(ValueError, match="fused-kernel range"):
        cholqr.cholqr1_fused(a, "bf16", interpret=True, inplace=True)
    a2 = _rand(4096, 2048)
    with pytest.raises(ValueError, match="fused-kernel range"):
        cholqr.cholqr2_fused(a2, "bf16x6_cor", interpret=True,
                             variant="compact", inplace=True)


def test_fastqr_inplace_rejects_incompatible_variant():
    a = _rand(512, 64)
    with pytest.raises(ValueError, match="recompute pipeline"):
        cholqr.cholqr2_fused(a, "bf16x6_cor", interpret=True,
                             variant="fastest", inplace=True)


def test_compact_wide_n_raises_instead_of_degrading():
    # compact/turbo exist for capacity; the XLA fallback materializes Q1
    a = _rand(4096, 2048)
    with pytest.raises(ValueError, match="fused-kernel range"):
        cholqr.cholqr2_fused(a, "bf16x6_cor", interpret=True,
                             variant="compact")
    # narrow panels still delegate silently (BlockQR sub-panels)
    q, r = cholqr.cholqr2_fused(_rand(256, 16), "bf16x6_cor",
                                interpret=True, variant="compact")
    assert q.shape == (256, 16)


def test_fastqr_variant_on_variantless_method_raises():
    a = _rand(256, 64)
    with pytest.raises(ValueError, match="no variants"):
        cholqr.fastqr(a, "bf16x6_cor", method="cholqr2", variant="fastest")


def test_inplace_requires_recompute_pipeline():
    a = _rand(512, 64)
    with pytest.raises(ValueError, match="recompute pipeline"):
        cholqr.cholqr2_fused(a, "bf16x6_cor", interpret=True,
                             variant="safe", inplace=True)


def test_residual_regen_chunked_matches_direct():
    m, n, rc = 1024, 32, 256
    a = _rand(m, n, seed=3)
    q, r = jnp.linalg.qr(a)

    def gen_chunk(i):
        return jax.lax.dynamic_slice(a, (i * rc, 0), (rc, n))

    got = float(validation.residual_regen_chunked(gen_chunk, q, r, rc))
    want = validation.residual(np.asarray(a, np.float64),
                               np.asarray(q, np.float64),
                               np.asarray(r, np.float64))
    assert abs(got - want) <= 1e-7 + 0.5 * want
