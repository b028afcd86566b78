"""Self-validating QR driver: fast path first, robust fallback on demand.

The reference selects its algorithm statically via template modes; on TPU
we can do better: run the MXU-native CholeskyQR3, *measure* the
orthogonality on device (an (n, n) Gram — microseconds), and only if it
misses the mode's tolerance rerun with the unconditionally-stable
Householder TSQR tree.  Well-conditioned inputs (the overwhelmingly common
case) never pay the reflector path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr

Array = jax.Array

# orthogonality acceptance per mode (~10x the mode's intrinsic grade).
# The emu modes get the tolerance of the mode they emulate (a missing
# entry used to default them to 1e-4, which MIXED_COR_EMU-grade output
# can miss on perfectly valid inputs — spurious expensive fallbacks).
_TOL = {
    modes.ComputeMode.FP32: 1e-5,
    modes.ComputeMode.BF16: 5e-2,
    modes.ComputeMode.BF16_NOCOR: 5e-2,
    modes.ComputeMode.BF16X3_NOCOR: 1e-3,
    modes.ComputeMode.BF16X3_COR: 1e-4,
    modes.ComputeMode.BF16X6_COR: 1e-5,
    modes.ComputeMode.BF16_NOCOR_EMU: 5e-2,
    modes.ComputeMode.TF32_NOCOR_EMU: 1e-3,
    modes.ComputeMode.BF16X3_COR_EMU: 1e-4,
    modes.ComputeMode.MIXED_COR_EMU: 1e-3,
}


@jax.jit
def _orth_device(q: Array) -> Array:
    n = q.shape[1]
    g = jnp.matmul(q.T.astype(jnp.float32), q.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return jnp.linalg.norm(g - jnp.eye(n)) / jnp.sqrt(n)


def qr_auto(a: Array,
            mode: modes.ComputeMode | str | modes.Policy = "fp32",
            fast_method: str = "cholqr3",
            **qr_kw) -> tuple[Array, Array, str]:
    """QR with automatic fast-path/fallback selection.

    Returns (Q, R, method_used).  For n within one panel, tries the
    CholeskyQR fast path and validates; falls back to the Householder
    TSQR tree / BlockQR if the measured orthogonality misses the mode's
    tolerance (extreme condition numbers).
    """
    policy = modes.resolve(mode)
    m, n = a.shape
    tol = _TOL.get(policy.mode, 1e-4)

    # direct CholQR beats BlockQR well past n=1024 (measured: 8.9x over
    # jnp.linalg.qr at n=1024); the Gram stays tiny relative to m
    if n <= 1024:
        q, r = cholqr.fastqr(a, policy.mode.value
                             if not isinstance(mode, modes.Policy) else mode,
                             method=fast_method)
        from tsqr_tpu.utils import validation
        if m <= (1 << 16):
            orth = float(_orth_device(q))  # naive gram fine at small m
        else:
            orth = validation.orthogonality_accurate(q)
        if np.isfinite(orth) and orth < tol:
            return q, r, fast_method
    # Fallback: the Householder tree with reorthogonalization — an input
    # that defeated CholeskyQR3 is exactly the extreme-kappa case where
    # single-pass CGS loses orthogonality.  The default impl stays "jnp":
    # the whole-tree program with pallas_sb leaves has not yet been
    # demonstrated to compile on the real chip (docs/ROUND2.md item 3 —
    # the remote-compile helper dies on it), and a safety net must not be
    # the one configuration known to crash.  Once the sb-tree is proven
    # on-chip, pass impl="pallas_sb" explicitly (7x faster leaves at
    # 2^20 x 128, ops/pallas_panel_sb.py).
    qr_kw.setdefault("reorth", True)
    q, r = blockqr.qr(a, mode, **qr_kw)
    return q, r, "blockqr_tsqr"


def _gate_orth(q: Array) -> Array:
    """In-program orthogonality measurement for the ladder gates.

    On TPU, the Kahan streaming Pallas Gram at bf16x6 grade (~1e-7
    measurement error, m-independent; 4 MXU passes + one HBM read of Q
    — the cheapest full-grade gate).  Elsewhere (and for n beyond the
    kernel's VMEM range) the column-blocked XLA variant."""
    from tsqr_tpu.utils import validation

    n = q.shape[1]
    if jax.default_backend() == "tpu" and 64 <= n <= 1024:
        from tsqr_tpu.ops import pallas_gram
        p = pallas_gram.stream_pallas(q, gram_mode="bf16x6_cor")
        g = p + p.T
        return jnp.linalg.norm(g - jnp.eye(n)) / jnp.sqrt(n * 1.0)
    return validation.orthogonality_wide_device(q)


@functools.partial(jax.jit, static_argnames=("mode", "fast_method",
                                             "fast_variant", "mid_method",
                                             "mid_variant", "impl",
                                             "leaf_rows", "fanin", "reorth"))
def qr_auto_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "fp32",
                  fast_method: str = "cholqr3_fused",
                  fast_variant: str = "safe",
                  mid_method: str | None = None,
                  mid_variant: str = "compact",
                  impl: str = "jnp",
                  leaf_rows: int = 2048,
                  fanin: int = 8,
                  reorth: bool = True) -> tuple[Array, Array]:
    """Self-validating QR as ONE fused XLA program: zero host round-trips.

    :func:`qr_auto` dispatches twice (fast path, host fetch of the
    orthogonality scalar, maybe robust path).  Here the fast CholeskyQR,
    the accurate on-device orthogonality gate (:func:`_gate_orth` —
    measurement error independent of m), and the fallbacks live inside
    one jit; XLA's ``lax.cond`` executes an expensive branch only when
    the gate fails at runtime.  NaNs from a failed Cholesky also trip
    the gate (orth is NaN -> the comparison is False -> fall through).

    With ``mid_method`` set (e.g. "cholqr3_fused"/"compact"), the driver
    is a 3-tier LADDER: fast path (e.g. single-pass CholeskyQR — kappa
    <~ 10 at corrected grade), then the robust Gram pipeline (kappa <~
    1e4), then the unconditional Householder BlockQR tree.  Each tier
    pays its gate only if the previous tier failed, so the
    well-conditioned common case runs at tier-1 speed + ONE gate — this
    is the no-kappa-caveat headline configuration (bench.py).

    The untaken branches cost compile time (all tiers are traced) but
    run only on inputs that actually defeated the faster methods.
    """
    policy = modes.resolve(mode)
    tol = _TOL.get(policy.mode, 1e-4)
    pmode = mode if isinstance(mode, modes.Policy) else policy.mode.value

    n = a.shape[1]
    if (fast_method == "cholqr1_fused"
            and 64 <= n <= cholqr._fused_n_max(policy)):
        # FREE gate: G = Q^T Q accumulated inside the Q-writing pass
        # (zero extra HBM traffic, +gram MXU passes hidden under the
        # pass's HBM bound)
        q_f, r_f, g_f = cholqr.cholqr1_fused(a, pmode,
                                             return_qgram=True)
        orth_f = jnp.linalg.norm(g_f - jnp.eye(n)) / jnp.sqrt(n * 1.0)
    else:
        q_f, r_f = cholqr.fastqr(a, pmode, method=fast_method,
                                 variant=fast_variant)
        orth_f = _gate_orth(q_f)
    ok = orth_f < tol  # False for NaN: falls through

    def householder(_):
        q, r = blockqr.qr(a, policy, reorth=reorth, impl=impl,
                          leaf_rows=leaf_rows, fanin=fanin)
        return q.astype(q_f.dtype), r.astype(r_f.dtype)

    def mid(_):
        q_m, r_m = cholqr.fastqr(a, pmode, method=mid_method,
                                 variant=mid_variant)
        ok_m = _gate_orth(q_m) < tol

        def mid_ok(_):
            return q_m.astype(q_f.dtype), jnp.triu(r_m).astype(r_f.dtype)

        return jax.lax.cond(ok_m, mid_ok, householder, None)

    def fast(_):
        return q_f, jnp.triu(r_f)

    fallback = mid if mid_method is not None else householder
    return jax.lax.cond(ok, fast, fallback, None)
