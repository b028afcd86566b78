"""Self-validating QR driver: fast path first, robust fallback on demand.

The reference selects its algorithm statically via template modes; on TPU
we can do better: run the MXU-native CholeskyQR3, *measure* the
orthogonality on device (an (n, n) Gram — microseconds), and only if it
misses the mode's tolerance escalate — first to the iterated shifted
CholeskyQR (cholqr.cholqr_iter: pure Gram passes to the f32 kappa limit
~1e7), last to the unconditionally-stable Householder TSQR tree.
Well-conditioned inputs (the overwhelmingly common case) never pay the
reflector path, and almost no finite-kappa input does anymore.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr, diff

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
        if policy.mode not in cholqr._CHEAP_DOT:
            # deep-kappa retry before the reflector path: iterated
            # shifted CholeskyQR contracts any kappa up to the f32
            # representation limit (~1e7) on pure Gram/GEMM passes —
            # see cholqr.cholqr_iter
            q, r = cholqr.fastqr(a, policy.mode.value
                                 if not isinstance(mode, modes.Policy)
                                 else mode, method="cholqr_iter")
            if m <= (1 << 16):
                orth = float(_orth_device(q))
            else:
                orth = validation.orthogonality_accurate(q)
            if np.isfinite(orth) and orth < tol:
                return q, r, "cholqr_iter"
    # Fallback: the Householder tree with reorthogonalization — an input
    # that defeated CholeskyQR3 is exactly the extreme-kappa case where
    # single-pass CGS loses orthogonality.  The default impl stays "jnp":
    # the sb-leaf tree compiles on-chip only within the T*L vreg budget
    # (green at m=2^18/L=512; the m=2^20/L=2048 program SIGKILLed the
    # remote-compile helper in rounds 2-4 — data/extras.csv error rows).
    # Round 5 caps the tile pick at the proven budget
    # (tsqr._pick_sb_tiles), so impl="pallas_sb" with leaf_rows <= 512
    # (T=16) or 1024 (T=8) gives ~7x faster leaves
    # (ops/pallas_panel_sb.py) where fallback latency matters.
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


# Effective Gram/apply epsilon per mode for the PREDICTIVE tier-1 gate:
# cholqr1's orthogonality is ~ c * kappa(A)^2 * eps_gate, so the gate
# admits tier 1 when kappa2_est * eps_gate * _SAFETY < tol.  The table
# lives in core/cholqr.py (shared with the iterated method); re-exported
# here under the historical name.
_EPS_GATE = cholqr._EPS_GATE
_SAFETY = 8.0  # covers the O(1) constant in orth ~ c * kappa^2 * eps


def _kappa2_max(base_method: str, eps: float, tol: float) -> float:
    """Predictive tier-1 admission threshold on the kappa^2(A) estimate.

    cholqr1: orthogonality-driven (orth ~ kappa^2 eps must beat tol).
    cholqr2: breakdown-driven (needs kappa^2 eps << 1 for Gram #2's
      Cholesky; 0.1 budget, conservative vs the ~4e3 fp32 contract).
    cholqr3: the shifted pass contracts kappa ~5x first (module
      docstring), extending coverage 25x over cholqr2; capped at kappa
      = 1e4 (measured-flat region ends ~2e4, data/cond.csv).
    """
    if base_method == "cholqr1":
        return tol / (eps * _SAFETY)
    if base_method == "cholqr2":
        return 0.1 / eps
    return min(1e8, 2.5 / eps)


# moved to core/cholqr.py (shared with the iterated shifted method);
# re-exported here for the existing call sites (parallel/dtsqr.py, tests)
_inf_norm11 = cholqr._inf_norm11
_psd_norm2_bound = cholqr._psd_norm2_bound


@diff.differentiable(unless=lambda b: b["return_info"])
@functools.partial(jax.jit, static_argnames=("mode", "fast_method",
                                             "fast_variant", "mid_method",
                                             "mid_variant", "impl",
                                             "leaf_rows", "fanin", "reorth",
                                             "return_info", "iter_tier"))
def qr_auto_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "fp32",
                  fast_method: str = "cholqr1_fused",
                  fast_variant: str = "safe",
                  mid_method: str | None = "cholqr3_fused",
                  mid_variant: str = "compact",
                  impl: str | None = None,
                  leaf_rows: int | None = None,
                  fanin: int | None = None,
                  reorth: bool = True,
                  return_info: bool = False,
                  iter_tier: bool = True) -> tuple[Array, ...]:
    """Self-validating QR as ONE fused XLA program: the PREDICTIVE ladder.

    Tier 0 (shared, ~1 HBM pass): stream the Gram G = A^T A, Cholesky it,
    and bound kappa(A)^2 by ||G||_2 * ||(R1^T R1)^-1||_2 upper bounds
    from power-compounded inf-norms (`_psd_norm2_bound`:
    ||X^16||_inf^{1/16} >= ||X||_2 for symmetric X, <= ||X||_inf by
    submultiplicativity), so the estimate NEVER under-reports
    kappa_2(A)^2 — the gate errs only toward the safer tier — while
    overshooting true kappa^2 by at most n^{1/8} ~ 1.8x (round 4's
    X^4 bound overshot 6.3x at kappa=4, est 101 vs true 16, taxing
    kappa ~2-13 inputs with the robust tier; the sharpened bound admits
    them to tier 1).  A failed Cholesky yields NaN -> every gate is
    False -> the ladder falls through to Householder.

    Tier 1 (fast): gate kappa2_est * eps_mode * safety < tol *before any
    Q exists*; the branch then finishes the method (for cholqr1 that is
    the single remaining Q-writing pass reusing R1 — the whole ladder
    costs one (n, n) Cholesky + inf-norms over bare cholqr1_fused,
    measured ~1 ms at 2^22 x 128 on v5e).  Computing Q *inside* the
    branch is the load-bearing design point: a Q computed outside a
    ``lax.cond`` pays output-buffer copies (+12.7 ms measured) even when
    the other branch is untaken.

    Tier 2 (robust): shifted CholeskyQR3 recompute pipeline REUSING the
    shared tier-0 Gram (4 HBM passes, kappa <~ 1e4), self-measured by a
    free in-pass Q-Gram gate (cholqr3_fused(return_qgram=True)).

    Tier 3 (deep-kappa, corrected/fp32 modes): iterated shifted
    CholeskyQR (cholqr.cholqr_iter[_fused], also reusing the tier-0
    Gram) — a while_loop of shifted Gram passes contracting kappa
    geometrically to the f32-representation limit (~1e7), each pass ONE
    HBM read; self-measured by the same free gate.  Before this rung
    existed, every kappa > ~1e4 input paid the Householder tree (~150x
    the fast tier at 2^20 x 128).

    Tier 4 (unconditional): Householder BlockQR tree.

    The result carries NO kappa caveat: tiers 2-3 gate on a measured
    orthogonality, so any input that defeats the Gram methods lands on
    the reflector path.  Untaken branches cost compile time only.

    With ``return_info=True`` returns ``(q, r, info)`` where
    ``info["tier"]`` is a (1, 1) int32 device scalar (1=fast CholQR,
    2=robust shifted CholQR3, 3=iterated shifted CholQR, 4=Householder
    tree — the fused analogue of qr_auto's ``method_used`` string) and
    ``info["kappa2_est"]`` is the tier-0 bound; zero extra device work
    (the tag rides the existing ``lax.cond`` outputs).
    """
    policy = modes.resolve(mode)
    tol = _TOL.get(policy.mode, 1e-4)
    eps = _EPS_GATE.get(policy.mode, 1e-6)
    pmode = mode if isinstance(mode, modes.Policy) else policy.mode.value
    io = policy.io_dtype

    # tier-4 tree config auto-resolution (round 5): on TPU the sb-leaf
    # tree at leaf 1024 / fanin 4 (T=8, within the compile budget) runs
    # 3.7x faster than the XLA tree — 41.7 vs 152.8 ms at 2^20 x 128,
    # measured under identical conditions (data/extras.csv
    # tree_sb[l1024f4] / tree_jnp_r5 rows).  Elsewhere (and whenever the
    # caller overrides) the XLA tree remains the fallback; over-budget
    # sb configs fall back leaf-wise inside tsqr (_pick_sb_tiles).
    if impl is None:
        impl = "pallas_sb" if jax.default_backend() == "tpu" else "jnp"
    if leaf_rows is None:
        leaf_rows = 1024 if impl == "pallas_sb" else 2048
    if fanin is None:
        fanin = 4 if impl == "pallas_sb" else 8

    n = a.shape[1]
    fused = (fast_method.endswith("_fused")
             and 64 <= n <= cholqr._fused_n_max(policy)
             and jax.default_backend() == "tpu")
    a32 = a if a.dtype in (jnp.bfloat16, jnp.float32) \
        else a.astype(jnp.float32)

    # ---- tier 0: shared Gram + predictive kappa^2 bound (no Q yet) ----
    if fused:
        from tsqr_tpu.ops import pallas_gram
        g = pallas_gram.gram_pallas(a32, policy.mode.value)
    else:
        g = modes.gram(a32.astype(jnp.float32), policy)
    g = (g + g.T) * 0.5
    r1 = cholqr._chol_r(g, shift=None)
    rinv1 = cholqr._rinv(r1)
    minv = modes.mm_fp32(rinv1, rinv1.T)          # (R1^T R1)^-1 = G^-1
    kappa2_est = (_psd_norm2_bound(g) * _psd_norm2_bound(minv)).reshape(1, 1)
    base = fast_method.removesuffix("_fused")
    k2max = _kappa2_max(base, eps, tol)
    ok1 = (kappa2_est < k2max).reshape(())        # False for NaN

    if return_info:
        # tag each branch's output with its tier index so the caller can
        # observe which rung ran (branches of a lax.cond must return
        # identical pytrees, so the tag rides every branch)
        def _tag(fn, t):
            return lambda _: (*fn(_), jnp.full((1, 1), t, jnp.int32))
    else:
        def _tag(fn, t):
            return fn

    def tier1(_):
        if base == "cholqr1":
            # finish cholqr1 from the shared factor: one Q-writing pass
            if fused:
                q = pallas_gram.stream_pallas(
                    a32, (rinv1,), (policy.mode.value,), write_q=True,
                    out_dtype=io)
            else:
                q = policy.mm(a32.astype(jnp.float32), rinv1)
            return q.astype(io), jnp.triu(r1).astype(io)
        fm = fast_method if fused else fast_method.removesuffix("_fused")
        q, r = cholqr.fastqr(a, pmode, method=fm, variant=fast_variant)
        return q.astype(io), jnp.triu(r).astype(io)

    def tier3(_):
        q, r = blockqr.qr(a, policy, reorth=reorth, impl=impl,
                          leaf_rows=leaf_rows, fanin=fanin)
        return q.astype(io), r.astype(io)

    def rest(_):
        mid_fused = (mid_method.endswith("_fused")
                     and 64 <= n <= cholqr._fused_n_max(policy)
                     and jax.default_backend() == "tpu")
        if (mid_fused and mid_method == "cholqr3_fused"
                and mid_variant == "compact"
                and policy.mode not in cholqr._CHEAP_DOT):
            # robust tier reusing the shared Gram; free in-pass gate
            q_m, r_m, gq = cholqr.cholqr3_fused(
                a32, pmode, variant="compact", g1=g, return_qgram=True)
            orth_m = jnp.linalg.norm(gq - jnp.eye(n)) / jnp.sqrt(n * 1.0)
        else:
            mv = mid_variant if policy.mode not in cholqr._CHEAP_DOT \
                else "safe"
            # off the fused range/backend, delegate to the XLA sibling:
            # fastqr("*_fused") would trace compiled Pallas (a compile
            # error on CPU) or hit the compact capacity raise at
            # n > _fused_n_max — the ladder must stay compilable there
            mm = mid_method if mid_fused \
                else mid_method.removesuffix("_fused")
            try_variant = mv if mm.endswith("_fused") else "safe"
            q_m, r_m = cholqr.fastqr(a, pmode, method=mm,
                                     variant=try_variant)
            orth_m = _gate_orth(q_m)
        ok2 = orth_m < tol  # False for NaN

        def mid_ok(_):
            return q_m.astype(io), jnp.triu(r_m).astype(io)

        if policy.mode in cholqr._CHEAP_DOT or not iter_tier:
            # no iterated rung: the cheap-dot modes' Gram noise floor
            # defeats the shifted-contraction analysis (cholqr_iter);
            # iter_tier=False is the compile-safety valve (bench.py
            # falls back to it if the while_loop program ever fails to
            # compile on a backend)
            return jax.lax.cond(ok2, _tag(mid_ok, 2), _tag(tier3, 4), None)

        def tier_iter(_):
            # deep-kappa rung: iterated shifted CholeskyQR reusing the
            # shared tier-0 Gram, gated by its own measured orthogonality
            it_fused = (64 <= n <= cholqr._fused_n_max(policy)
                        and jax.default_backend() == "tpu")
            if it_fused:
                q_i, r_i, gq_i = cholqr.cholqr_iter_fused(
                    a32, pmode, g1=g, return_qgram=True)
                orth_i = (jnp.linalg.norm(gq_i - jnp.eye(n))
                          / jnp.sqrt(n * 1.0))
            else:
                q_i, r_i = cholqr.cholqr_iter(a, pmode, g1=g)
                orth_i = _gate_orth(q_i)
            ok3 = orth_i < tol  # False for NaN

            def iter_ok(_):
                return q_i.astype(io), jnp.triu(r_i).astype(io)

            return jax.lax.cond(ok3, _tag(iter_ok, 3), _tag(tier3, 4), None)

        return jax.lax.cond(ok2, _tag(mid_ok, 2), tier_iter, None)

    fallback = rest if mid_method is not None else _tag(tier3, 4)
    out = jax.lax.cond(ok1, _tag(tier1, 1), fallback, None)
    if return_info:
        q, r, tier = out
        return q, r, {"tier": tier, "kappa2_est": kappa2_est}
    return out
