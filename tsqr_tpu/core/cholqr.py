"""CholeskyQR2 / shifted CholeskyQR3: the MXU-native tall-skinny QR.

No direct reference analogue — the reference's answer to "make QR run on
matrix units" is Householder reflectors applied through WMMA tiles
(tcqr32x16.cu); on TPU the same question has a better-conditioned answer:
CholeskyQR-type methods whose entire flop volume is GEMMs (G = A^T A,
Q = A R^{-1}), which XLA maps straight onto the MXU with no per-column
dependences at all.  This module provides them as the fast path; the
Householder TSQR tree (core/tsqr.py) remains the robustness path and the
reference-parity semantics.

Numerics (Yamamoto/Fukaya et al.):
  * CholeskyQR2: orthogonality ~ eps once kappa(A)^2 * eps << 1, i.e.
    kappa <~ 1/sqrt(eps).  In fp32 (eps~6e-8): kappa <~ 4e3.
  * shifted CholeskyQR3: a shift s (see _shift_value) makes the first
    Cholesky succeed unconditionally and contracts kappa by
    ~sqrt(||G||/s) ~ 5x (measured at m=4096, n=64), after which the two
    unshifted passes polish to eps-level orthogonality.  Honest fp32
    range: kappa <~ 2e4 at these sizes — measured per-pass contraction,
    tests/test_cholqr.py.  Beyond that the Householder TSQR tree
    (core/tsqr.py) is the robustness path and core/auto.py routes to it
    automatically (fp32 Gram arithmetic fundamentally loses directions
    with sigma^2 below eps*||G||, so no fixed-pass Gram method can reach
    kappa ~ 1e6 at fp32-grade orthogonality).
  * The split-corrected modes apply naturally: G is computed with the
    policy matmul, so bf16x6_cor produces an fp32-grade Gram matrix from
    bf16 MXU passes — the same correction idea as the reference's
    fp32_tc_cor (tcqr32x16.cu:669-819), applied to a Gram product.

Distribution: across chips G is simply psum(A_loc^T A_loc) — the Gram
reduction plays the role of the reference's R-tree with one allreduce of an
(n, n) tile; see parallel/dtsqr.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import diff

Array = jax.Array


def _shift_value(g: Array, m: int, n: int) -> Array:
    """Cholesky-safeguard shift, Fukaya et al. 2020 form adapted:
    s = 11 (sqrt(m) n + n(n+1)) eps ||G||_F.

    Two changes vs the paper's 11(mn + n(n+1)) eps ||A||_2^2: ||G||_F
    replaces ||G||_2 (a cheap upper bound that is at most sqrt(n) over —
    the previously-used trace is up to n x over and was measured 16x over
    on latms spectra, wasting the preconditioner), and sqrt(m) replaces m
    in the Gram-error term (the paper's m n eps is the deterministic
    worst case; the measured accumulation error of the XLA Gram and of
    the Kahan-compensated streaming Gram is ~sqrt(m) eps ||G||).  Each
    shifted pass contracts kappa by ~sqrt(||G||/s) ~ 5x at m=4096, n=64
    (measured); a needlessly large shift contracts less.
    """
    eps = jnp.float32(6.0e-8)
    sqrt_m = jnp.sqrt(jnp.asarray(m, jnp.float32))  # m may be traced
    # (1, 1)-shaped, NOT rank-0: a rank-0 value in the dependency chain
    # forces a vector->scalar->vector round-trip that stalls the whole
    # downstream pipeline on TPU (measured +6.5 ms at 2^22 x 128 for ANY
    # data-dependent scalar — even g[0, 0]); a (1, 1) array stays on the
    # vector side and broadcasts for free.
    norm = jnp.sqrt(jnp.sum(g * g, keepdims=True))
    return (11.0 * (sqrt_m * n + n * (n + 1)) * eps) * norm


def _chol_r(g: Array, shift: float | Array = 0.0) -> Array:
    """Upper-triangular R with G (+ shift*I) = R^T R."""
    n = g.shape[-1]
    g = (g + g.T) * 0.5
    if shift is not None:
        g = g + shift * jnp.eye(n, dtype=g.dtype)
    l = jnp.linalg.cholesky(g)
    return l.T


def _q_pass(a: Array, r: Array, mm: Callable) -> Array:
    """Q = A R^{-1} as a GEMM with the explicit (n, n) inverse.

    n <= a few hundred, so inverting R costs O(n^3) ~ nothing, and the
    m-scale work stays a pure MXU GEMM instead of a triangular solve
    (which XLA would serialize into n small steps over the m axis).
    """
    n = r.shape[-1]
    rinv = jax.scipy.linalg.solve_triangular(
        r, jnp.eye(n, dtype=r.dtype), lower=False)
    return mm(a, rinv)


# ---- sublane packing for narrow panels (n <= 64) ---------------------------
# The TPU vector lane is 128 wide: an (m, 16) stream uses 16/128 of every
# vreg and the MXU contracts 16-deep — the XLA CholQR paths measured ~57x
# off the HBM roofline at the reference's FLAGSHIP n=16 axis (119.6 ms at
# 2^23 x 16 where ~3 streaming passes cost ~3 ms).  Fix: view the panel
# as (m/p, p*n) with p = 128//n — row r of the packed view is rows
# p*r .. p*r+p-1 of A concatenated (a free row-major reshape).  Then
#   * Gram: A^T A = sum of the p diagonal (n, n) blocks of the packed
#     Gram (off-diagonal blocks correlate different row offsets and are
#     simply discarded — the packed Gram pass itself runs 128 lanes
#     wide at full stream rate);
#   * apply: Q = A R^{-1} packs as Qp = Ap @ kron(I_p, R^{-1}), a
#     (p n, p n) GEMM operand — the m-scale stream again 128 lanes wide.
# Zero-padding m to a multiple of p is exact (zero rows contribute
# nothing to G and produce zero Q rows).  Each packed dot product sums
# the same n terms as the unpacked one (kron's off-block zeros are
# exact in every mode's split arithmetic), so accuracy grade is
# unchanged; the Gram's p-way partial-sum regrouping only helps.

def _pack_factor(m: int, n: int) -> int:
    """p >= 2 when packing pays: narrow panel, enough rows to matter."""
    if n > 64 or m < 1024:
        return 1
    return max(1, 128 // n)


def _pack(a32: Array, p: int) -> Array:
    m, n = a32.shape
    m_pad = -(-m // p) * p
    if m_pad != m:
        a32 = jnp.pad(a32, ((0, m_pad - m), (0, 0)))
    return a32.reshape(m_pad // p, p * n)


def _unpack(qp: Array, p: int, m: int, n: int) -> Array:
    return qp.reshape(qp.shape[0] * p, n)[:m]


def _gram_packed(ap: Array, policy: modes.Policy, p: int, n: int) -> Array:
    gp = modes.gram(ap, policy)
    if p == 1:
        return gp
    # sum of the p diagonal (n, n) blocks
    return jnp.sum(jnp.diagonal(gp.reshape(p, n, p, n), axis1=0,
                                axis2=2), axis=-1)


def _q_pass_packed(ap: Array, r: Array, mm: Callable, p: int) -> Array:
    rinv = _rinv(r.astype(jnp.float32))
    if p == 1:
        return mm(ap, rinv)
    return mm(ap, jnp.kron(jnp.eye(p, dtype=rinv.dtype), rinv))


def _cholqr2_core(ap: Array, policy: modes.Policy, p: int,
                  n: int) -> tuple[Array, Array]:
    """Two CholeskyQR iterations on a (possibly packed) panel view."""
    mm = policy.mm
    g = _gram_packed(ap, policy, p, n)
    r1 = _chol_r(g)
    q1 = _q_pass_packed(ap, r1, mm, p)
    g2 = _gram_packed(q1, policy, p, n)
    r2 = _chol_r(g2)
    q = _q_pass_packed(q1, r2, mm, p)
    return q, jnp.triu(modes.mm_fp32(r2, r1))


def cholqr1(a: Array,
            mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
            ) -> tuple[Array, Array]:
    """Single-pass CholeskyQR: orthogonality ~ kappa(A)^2 * eps_mode.

    The rational method for the low-precision-IO modes (BF16): Q is
    stored in bf16, whose rounding already floors orthogonality at
    ~1e-3, so CholeskyQR2's second iteration buys nothing there — and
    CholQR1's 4mn^2 method flops EQUAL the useful QR flop count, making
    it the only method whose MXU utilization can approach 100 % of
    useful (the ">= 50 % MXU peak" BASELINE vehicle, see
    harness/mfu.py).  For fp32-grade output use cholqr2/cholqr3.
    """
    policy = modes.resolve(mode)
    a32 = a.astype(jnp.float32)
    m, n = a32.shape
    p = _pack_factor(m, n)
    ap = _pack(a32, p) if p > 1 else a32
    g = _gram_packed(ap, policy, p, n)
    r = _chol_r(g)
    q = _q_pass_packed(ap, r, policy.mm, p)
    if p > 1:
        q = _unpack(q, p, m, n)
    return q.astype(policy.io_dtype), jnp.triu(r).astype(policy.io_dtype)


def _fused_n_max(policy: modes.Policy) -> int:
    """Widest n the streaming kernels fit in VMEM for a given mode.

    The kernels keep (n, n) residents in VMEM — Gram accumulator + Kahan
    compensation + each R-inverse and its in-kernel bf16 split parts — so
    the footprint grows as (2 + parts·n_r)·n² and blows the 100 MB scoped
    budget at n = 2048 for the multi-part corrected modes (measured:
    Mosaic VMEM-overflow compile failures in the round-2 MFU sweep, while
    every n = 1024 corrected config and n = 2048 single-part config
    compiled and ran).  Above this, the XLA variants take over — at such
    n the pipelines are MXU-pass-bound anyway, so the fused kernels'
    HBM-traffic advantage has mostly evaporated."""
    n_parts = {modes.ComputeMode.BF16X6_COR: 3,
               modes.ComputeMode.BF16X3_COR: 2}.get(policy.mode, 1)
    return 2048 if n_parts == 1 else 1024


def cholqr1_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "bf16",
                  interpret: bool = False,
                  inplace: bool = False,
                  return_qgram: bool = False):
    """Single-pass CholeskyQR on the streaming kernels: the HBM-minimal
    QR — one read of A (Gram), one read + one write (Q pass).  With bf16
    IO that is 8mn bytes total for the whole factorization.

    inplace=True writes Q over A's buffer (requires io_dtype == a.dtype;
    use via ``fastqr_inplace`` so the input is donated): peak HBM is A
    alone, which admits M=2^25 x N=128 bf16 on a 16 GB chip.

    return_qgram=True (fused range only) additionally returns G = Q^T Q,
    accumulated IN the Q-writing pass (the Kahan half-Gram of the
    in-VMEM post-dot chunk — zero extra HBM traffic): the free
    self-validation gate for the auto ladder (core/auto.qr_auto_fused).
    Returns (q, r, g)."""
    from tsqr_tpu.ops import pallas_gram

    policy = modes.resolve(mode)
    if inplace and jnp.dtype(policy.io_dtype) != a.dtype:
        raise ValueError(
            f"inplace requires io_dtype == a.dtype, got {policy.io_dtype} "
            f"vs {a.dtype}")
    if a.shape[1] < 64 or a.shape[1] > _fused_n_max(policy):
        if inplace or return_qgram:
            # the XLA fallback can honor neither the peak-HBM ~A
            # contract nor the free fused gate
            raise ValueError(
                f"inplace/return_qgram require 64 <= n <= "
                f"{_fused_n_max(policy)} (the fused-kernel range), got "
                f"n={a.shape[1]}")
        # narrow: lane-tile waste; wide: VMEM (see _fused_n_max) — XLA
        # variant either way
        return cholqr1(a, mode)

    mname = policy.mode.value
    if a.dtype not in (jnp.bfloat16, jnp.float32):
        a = a.astype(jnp.float32)
    g = pallas_gram.gram_pallas(a, mname, interpret=interpret)
    r = _chol_r(g)
    if return_qgram:
        q, p = pallas_gram.stream_pallas(a, (_rinv(r),), (mname,),
                                         write_q=True, gram_mode=mname,
                                         interpret=interpret,
                                         out_dtype=policy.io_dtype,
                                         alias_q=inplace)
        return q, jnp.triu(r).astype(policy.io_dtype), p + p.T
    q = pallas_gram.stream_pallas(a, (_rinv(r),), (mname,), write_q=True,
                                  interpret=interpret,
                                  out_dtype=policy.io_dtype,
                                  alias_q=inplace)
    return q, jnp.triu(r).astype(policy.io_dtype)


def cholqr2(a: Array,
            mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
            ) -> tuple[Array, Array]:
    """CholeskyQR2 thin QR: (m, n) -> (Q (m, n), R (n, n)).

    Fast path for kappa(A) <~ 1/sqrt(eps_f32) ~ 4e3; use cholqr3 or the
    Householder tsqr for worse conditioning.
    """
    policy = modes.resolve(mode)
    a = a.astype(jnp.float32)
    m, n = a.shape
    p = _pack_factor(m, n)
    ap = _pack(a, p) if p > 1 else a
    q, r = _cholqr2_core(ap, policy, p, n)
    if p > 1:
        q = _unpack(q, p, m, n)
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


def cholqr3(a: Array,
            mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
            ) -> tuple[Array, Array]:
    """Shifted CholeskyQR3: robust to kappa(A) <~ 2e4 in fp32 (measured;
    see module docstring — beyond that, use the Householder tree).

    Pass 1 uses a safeguarded shift so the Cholesky cannot break down;
    passes 2-3 are plain CholeskyQR (= CholeskyQR2 on the preconditioned
    Q1).  All m-scale work is GEMMs.
    """
    policy = modes.resolve(mode)
    mm = policy.mm
    a = a.astype(jnp.float32)
    m, n = a.shape
    p = _pack_factor(m, n)
    ap = _pack(a, p) if p > 1 else a
    g = _gram_packed(ap, policy, p, n)
    r1 = _chol_r(g, shift=_shift_value(g, m, n))
    q1 = _q_pass_packed(ap, r1, mm, p)
    q2, r2 = _cholqr2_core(q1, policy, p, n)
    if p > 1:
        q2 = _unpack(q2, p, m, n)
    r = jnp.triu(modes.mm_fp32(r2.astype(jnp.float32), r1))
    return q2.astype(policy.io_dtype), r.astype(policy.io_dtype)


def pack_panel(a: Array) -> Array:
    """Pack a narrow (m, n <= 64) panel into its (ceil(m/p), p*n) sublane
    view, p = 128 // n — the layout the TPU actually streams at full
    rate.

    An (m, n) array's minor axis is physically padded to 128 lanes, so
    every HBM pass over the UNPACKED layout moves 128/n times the
    logical bytes (measured: a plain f32->bf16 cast of a 2^20 x 16
    panel runs at ~80 GB/s logical vs ~800 GB/s for the packed view —
    docs/ROUND5.md profile).  Pipelines that keep panels packed
    end-to-end (`qr_packed`) skip that floor entirely; pack once at the
    boundary, unpack once at the end (each pays the padded read/write
    exactly once, which is unavoidable for unpacked IO).
    """
    m, n = a.shape
    if n > 64:
        raise ValueError(f"pack_panel wants n <= 64, got n={n}")
    return _pack(a.astype(jnp.float32), 128 // n)


def unpack_panel(qp: Array, m: int, n: int) -> Array:
    """Inverse of `pack_panel`: (rows, p*n) -> (m, n), dropping pad rows."""
    p = qp.shape[1] // n
    return _unpack(qp, p, m, n)


def qr_packed(ap: Array, n: int,
              mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
              method: str = "cholqr2") -> tuple[Array, Array]:
    """Thin QR of a sublane-PACKED tall-skinny panel, packed IO.

    ``ap`` is the (rows, p*n) view from `pack_panel` of an (m, n) panel
    (row r holds rows p*r..p*r+p-1 of A side by side); returns
    ``(qp, r)`` with Q in the same packed layout and R (n, n) upper
    triangular.  All m-scale passes run 128 lanes wide with no padded
    traffic — on the n=16 axis this is the difference between the
    ~1.3 ms padded-layout floor and ~0.2 ms true streams at 2^20 x 16
    (the reference's flagship sweep, main.cu m x 16 panels; its CUDA
    kernels never pay this because gmem has no lane padding — on TPU
    the packed contract is the equivalent design).

    Methods: "cholqr1" (bf16-grade, 1 Gram pass), "cholqr2"
    (fp32-grade, kappa <~ 4e3), "cholqr3" (shifted, kappa <~ 2e4).
    Zero pad rows (from m % p != 0) are exact: they contribute nothing
    to any Gram and stay zero in Q.
    """
    policy = modes.resolve(mode)
    rows, pn = ap.shape
    if pn % n:
        raise ValueError(f"packed width {pn} not a multiple of n={n}")
    p = pn // n
    ap = ap.astype(jnp.float32)
    if method == "cholqr1":
        g = _gram_packed(ap, policy, p, n)
        r = _chol_r(g)
        qp = _q_pass_packed(ap, r, policy.mm, p)
        return qp.astype(policy.io_dtype), jnp.triu(r).astype(policy.io_dtype)
    if method == "cholqr2":
        qp, r = _cholqr2_core(ap, policy, p, n)
        return qp.astype(policy.io_dtype), r.astype(policy.io_dtype)
    if method == "cholqr3":
        g = _gram_packed(ap, policy, p, n)
        r1 = _chol_r(g, shift=_shift_value(g, rows * p, n))
        q1 = _q_pass_packed(ap, r1, policy.mm, p)
        q2, r2 = _cholqr2_core(q1, policy, p, n)
        r = jnp.triu(modes.mm_fp32(r2.astype(jnp.float32), r1))
        return q2.astype(policy.io_dtype), r.astype(policy.io_dtype)
    raise ValueError(f"qr_packed: unknown method {method!r}")


def _rinv(r: Array) -> Array:
    n = r.shape[-1]
    return jax.scipy.linalg.solve_triangular(
        r, jnp.eye(n, dtype=r.dtype), lower=False)


def _shift_value_fused(g: Array, n: int, chunk: int) -> Array:
    """Cholesky-safeguard shift for the STREAMING (Kahan) Gram.

    The generic ``_shift_value`` budgets sqrt(m)*eps of Gram accumulation
    error — correct for a naive f32 accumulation, but the fused pipelines
    accumulate per-chunk contributions with Kahan compensation
    (ops/pallas_gram.stream_pallas), whose error is chunk-local:
    ~sqrt(chunk)*eps, INDEPENDENT of m.  Budgeting the smaller true error
    lets the shift stay ~10x smaller at m = 2^22, and since each shifted
    pass contracts kappa by ~sqrt(||G||/s), a needlessly large shift
    directly wastes kappa coverage — this is the TPU-first dividend of
    the compensated streaming Gram (no reference analogue: the CUDA code
    has no shifted CholeskyQR at all).
    """
    eps = jnp.float32(6.0e-8)
    c = jnp.sqrt(jnp.float32(chunk))
    # (1, 1)-shaped for the same no-rank-0 rule as _shift_value
    norm = jnp.sqrt(jnp.sum(g * g, keepdims=True))
    return (11.0 * (c * n + n * (n + 1)) * eps) * norm


def _compose(*factors: Array) -> Array:
    """Near-exact f32 product of small (n, n) factors (HIGHEST matmul:
    ~2^-24-grade on TPU via XLA's 6-pass decomposition, true f32 on CPU).
    Composing R-inverses into ONE factor lets a streaming pass apply a
    whole CholeskyQR iteration chain as a single corrected dot — the
    m-scale MXU cost stops growing with the number of iterations."""
    acc = factors[0].astype(jnp.float32)
    for f in factors[1:]:
        acc = modes.mm_fp32(acc, f)
    return acc


# Cheap-dot modes: a single (or triple) MXU pass per product.  For these
# the recompute-Q1 pipeline (4 HBM passes, Q1 re-derived bitwise in VMEM)
# beats writing Q1; the re-dot residual error is at the mode's own grade
# by definition.  Corrected/fp32 modes keep the write-Q1 structure: their
# dots cost 6 passes, so recomputing loses more MXU time than one HBM
# write+read round-trip costs.
_CHEAP_DOT = (modes.ComputeMode.BF16, modes.ComputeMode.BF16_NOCOR,
              modes.ComputeMode.BF16X3_NOCOR)
# Delta-trick correction mode per main mode (see stream_pallas residual).
# FP32 maps to the explicit 2-way split (bf16x3_cor), NOT bf16x3_nocor:
# lax.Precision.HIGH is unsupported inside Mosaic ("Unsupported dot
# precision: HIGH" on v5e), and the explicit split is the same 3-pass
# cost at slightly better accuracy.
_DELTA_MODE = {modes.ComputeMode.BF16X6_COR: "bf16x3_cor",
               modes.ComputeMode.FP32: "bf16x3_cor"}


def _delta(r: Array) -> Array:
    """Delta = Rinv - I, exact in f32 (Sterbenz on the near-1 diagonal)."""
    n = r.shape[-1]
    return _rinv(r) - jnp.eye(n, dtype=jnp.float32)


# ---- kappa^2(A) estimation from a Gram matrix ------------------------------
# Shared by the predictive ladder (core/auto.py) and the iterated shifted
# CholeskyQR below.  Moved here from auto.py so cholqr can use them without
# a circular import; auto re-exports them under the old names.

def _inf_norm11(x: Array) -> Array:
    # (1, 1)-shaped, not rank-0 (see _shift_value: any rank-0 in the
    # value chain stalls the downstream pipeline on TPU)
    return jnp.max(jnp.sum(jnp.abs(x), axis=1), keepdims=True)[None]


def _psd_norm2_bound(x: Array, squarings: int = 4) -> Array:
    """Rigorous upper bound on ||X||_2 for symmetric PSD X, (1,1)-shaped.

    ||X||_2 = ||X^(2^k)||_2^{1/2^k} <= ||X^(2^k)||_inf^{1/2^k} (for
    symmetric matrices the inf-norm dominates the spectral norm), and
    submultiplicativity means power compounding can only tighten the
    plain inf-norm bound: the inf-vs-spectral overshoot (up to sqrt(n))
    shrinks to its 2^k-th root.  Default k=4 (X^16): worst-case
    overshoot n^{1/16} ~ 1.35x at n=128, measured ~1.02-1.2x on latms
    spectra — sharp enough that the tier-1 gate no longer taxes
    kappa ~ 2-13 inputs with the robust tier (round-4 ladder.csv showed
    the k=2 bound overshooting 6.3x at kappa=4, est 101 vs true 16, and
    the gate at ~21 routing a perfectly benign input to tier 2).  The
    cost is ``squarings`` (n, n) MXU matmuls — noise against the m n^2
    Gram that produced X.

    Each squaring renormalizes by its inf-norm with the exponent
    accounted into the scalar prefactor (X^16's raw inf-norm would hit
    the f32 underflow floor: the scaled PSD matrix only guarantees
    ||X_hat^16||_inf >= n^-16 ~ 1e-34 at n=128), so neither overflow
    nor underflow is possible at any input scale or power.  A scale of
    0 or NaN propagates NaN, which every downstream gate reads as False
    — the safe (Householder) direction.
    """
    s = _inf_norm11(x)
    b = s
    xh = x / s
    e = 0.5
    for _ in range(squarings):
        x2 = modes.mm_fp32(xh, xh)
        t = _inf_norm11(x2)
        xh = x2 / t
        b = b * t ** e
        e *= 0.5
    return b


# Effective Gram/apply epsilon per mode for the predictive gates:
# cholqr1's orthogonality is ~ c * kappa(A)^2 * eps_gate.  Values are
# the measured orthogonality floors of each mode's Gram arithmetic
# (data/cond.csv flat levels; emu modes mirror what they emulate).
_EPS_GATE = {
    modes.ComputeMode.FP32: 6e-8,
    modes.ComputeMode.BF16X6_COR: 6e-8,
    modes.ComputeMode.BF16X3_COR: 3e-7,
    modes.ComputeMode.BF16X3_NOCOR: 3e-6,
    modes.ComputeMode.BF16: 4e-3,
    modes.ComputeMode.BF16_NOCOR: 4e-3,
    modes.ComputeMode.BF16_NOCOR_EMU: 4e-3,
    modes.ComputeMode.TF32_NOCOR_EMU: 3e-6,
    modes.ComputeMode.BF16X3_COR_EMU: 3e-7,
    modes.ComputeMode.MIXED_COR_EMU: 3e-6,
}


def _k2_of_gram(g: Array) -> Array:
    """Rigorous (1, 1)-shaped upper bound on kappa_2(X)^2 from X's Gram.

    bound(G) * bound(G^-1) via `_psd_norm2_bound`, with G^-1 formed from
    the unshifted Cholesky factor — NaN when that Cholesky fails (G
    numerically indefinite), which every gate comparison reads as
    "too ill-conditioned" (the safe direction)."""
    rinv = _rinv(_chol_r(g, shift=None))
    minv = modes.mm_fp32(rinv, rinv.T)
    return (_psd_norm2_bound(g) * _psd_norm2_bound(minv)).reshape(1, 1)


def cholqr2_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "fp32",
                  interpret: bool = False,
                  variant: str = "safe",
                  inplace: bool = False) -> tuple[Array, Array]:
    """CholeskyQR2 on the streaming Pallas kernels (ops/pallas_gram.py).

    variant selects how much of CholeskyQR2's self-correction slack is
    spent on speed (MXU passes quoted for bf16x6_cor; all keep fp32-grade
    RESIDUAL — every m-scale dot stays full precision, only Gram #1 and
    the near-identity second factor are relaxed):

    * "safe"   (kappa <~ 4e3): full precision throughout; 20 MXU passes
      (symmetric half-Gram already saves 4 vs round 1's 24).
    * "fast"   (kappa <~ 500): second factor applied via the Delta trick
      (Rinv2 = I + Delta, ||Delta|| ~ eps*kappa^2, so a 3-pass corrected
      product of the Delta term suffices); 17 passes.
    * "fastest" (kappa <~ 10): additionally Gram #1 in plain bf16 — its
      error only degrades the preconditioner, which Gram #2 measures and
      repairs; 14 passes.
    * "compact" (kappa <~ 500): HBM-capacity mode — Q1 is never
      materialized; the final pass re-derives it from A bitwise in VMEM
      (6 extra MXU passes) and applies the Delta correction.  Peak HBM
      footprint is A + Q only (vs A + Q1 + Q): the enabler for
      M=2^23 x N=128 f32 on a 16 GB chip.  ~10 % slower than "fast" at
      2^22 (measured) — use only when capacity-bound.
    * "turbo" (kappa <~ 10): "fastest" + "compact" combined — bf16
      Gram #1 AND the recompute pipeline.  HBM drops 5 passes -> 4 (the
      binding resource at n <= 128: a corrected MXU pass costs ~0.7 ms at
      m=2^22 vs ~3.9 ms per HBM pass at the chip's measured ~540 GB/s)
      for +6 MXU passes, moving the n=128 roofline from ~19.4 ms to
      ~15.5 ms at 2^22.  Same kappa contract and fp32-grade RESIDUAL
      story as "fastest"; also inherits "compact"'s A+Q-only footprint.

    Narrow panels delegate to the XLA variant: below ~half a lane tile the
    streaming kernels waste most of each (chunk, 128) lane tile (measured
    at n=16: 5.1 ms fused vs ~0.1 ms XLA for m=2^20).

    inplace=True (compact/turbo only — the pipelines whose final pass
    streams A itself) writes Q over A's buffer: peak HBM falls from A+Q
    to A alone, admitting the BASELINE target M=2^24 x N=128 at f32 IO on
    a 16 GB chip.  Requires io_dtype == a.dtype; enter via
    ``fastqr_inplace`` so the input buffer is donated."""
    from tsqr_tpu.ops import pallas_gram

    policy = modes.resolve(mode)
    if variant not in ("safe", "fast", "fastest", "compact", "turbo"):
        raise ValueError(f"cholqr2_fused: unknown variant {variant!r}")
    if inplace:
        if variant not in ("compact", "turbo"):
            raise ValueError("inplace requires the recompute pipeline "
                             "(variant 'compact' or 'turbo')")
        if jnp.dtype(policy.io_dtype) != a.dtype:
            raise ValueError(
                f"inplace requires io_dtype == a.dtype, got "
                f"{policy.io_dtype} vs {a.dtype}")
    if a.shape[1] < 64 or a.shape[1] > _fused_n_max(policy):
        if inplace:
            raise ValueError(  # see cholqr1_fused: no silent degradation
                f"inplace requires 64 <= n <= {_fused_n_max(policy)} "
                f"(the fused-kernel range), got n={a.shape[1]}")
        if variant in ("compact", "turbo") and a.shape[1] > _fused_n_max(policy):
            # the XLA fallback materializes Q1 (peak A+Q1+Q) — silently
            # abandoning the A+Q-only contract at exactly the capacity
            # shapes compact exists for would OOM (and poison the
            # process, CLAUDE.md).  Narrow panels (n < 64, e.g. BlockQR
            # sub-panels) still delegate: their footprint is small.
            raise ValueError(
                f"variant {variant!r} requires n <= {_fused_n_max(policy)} "
                f"(the fused-kernel range), got n={a.shape[1]}")
        return cholqr2(a, mode)  # see _fused_n_max / cholqr1_fused notes

    mname = policy.mode.value
    if a.dtype not in (jnp.bfloat16, jnp.float32):
        a = a.astype(jnp.float32)

    g1_mode = "bf16" if variant in ("fastest", "turbo") else mname
    g = pallas_gram.gram_pallas(a, g1_mode, interpret=interpret)
    r1 = _chol_r(g)

    if policy.mode in _CHEAP_DOT or variant in ("compact", "turbo"):
        # recompute pipeline: 4 HBM passes, no Q1 materialized
        dmode = _DELTA_MODE.get(policy.mode)
        p2 = pallas_gram.stream_pallas(a, (_rinv(r1),), (mname,),
                                       gram_mode=mname, interpret=interpret)
        r2 = _chol_r(p2 + p2.T)
        if variant in ("compact", "turbo") and dmode is not None:
            q = pallas_gram.stream_pallas(a, (_rinv(r1), _delta(r2)),
                                          (mname, dmode),
                                          residual=(False, True),
                                          write_q=True, interpret=interpret,
                                          out_dtype=policy.io_dtype,
                                          alias_q=inplace)
        else:
            q = pallas_gram.stream_pallas(a, (_rinv(r1), _rinv(r2)),
                                          (mname, mname), write_q=True,
                                          interpret=interpret,
                                          out_dtype=policy.io_dtype,
                                          alias_q=inplace)
    else:
        q1, g2 = pallas_gram.qpass_pallas(a, _rinv(r1), mname,
                                          interpret=interpret,
                                          with_gram=True)
        r2 = _chol_r(g2)
        dmode = _DELTA_MODE.get(policy.mode)
        if variant != "safe" and dmode is not None:
            q = pallas_gram.stream_pallas(q1, (_delta(r2),), (dmode,),
                                          residual=(True,), write_q=True,
                                          interpret=interpret,
                                          out_dtype=policy.io_dtype)
        else:
            q = pallas_gram.stream_pallas(q1, (_rinv(r2),), (mname,),
                                          write_q=True, interpret=interpret,
                                          out_dtype=policy.io_dtype)
    r = jnp.triu(modes.mm_fp32(r2, r1))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


# Relaxed mode for PATH-ONLY work in the robust compact pipeline: the
# middle pass's DOT only steers the preconditioner chain (its error is
# embedded in Q1', whose Gram is then measured exactly and repaired
# downstream), so a 3-pass product suffices where the contract-bearing
# passes need 6.  The middle GRAM must stay full-grade: a relaxed Gram's
# ~1e-5 entry error swamps sigma_min(G2) ~ ||G2||/kappa1^2 once
# kappa1 >~ 300, making G2 indefinite -> Cholesky NaN (hit by the
# kappa=1e4 interpret test when both were relaxed).
_RELAXED_MID = {modes.ComputeMode.BF16X6_COR: "bf16x3_cor",
                modes.ComputeMode.FP32: "bf16x3_cor",
                modes.ComputeMode.BF16X3_COR: "bf16x3_cor"}


def cholqr3_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "fp32",
                  interpret: bool = False,
                  variant: str = "safe",
                  inplace: bool = False,
                  g1: Array | None = None,
                  return_qgram: bool = False):
    """Shifted CholeskyQR3 on the streaming kernels (narrow panels
    delegate to the XLA variant).  The LAST factor always uses the Delta
    trick when available — after two iterations Q2 is near-orthonormal
    for every in-contract kappa, so Rinv3 = I + tiny holds
    unconditionally; consequently ``variant="fast"`` compiles the SAME
    program as "safe" (accepted for interface symmetry with
    cholqr2_fused).  ``variant="fastest"`` additionally computes Gram #1
    in bf16 (kappa <~ 10; see cholqr2_fused).

    ``variant="compact"`` (corrected/fp32 modes) is the ROBUST recompute
    pipeline — full cholqr3 kappa contract at cholqr2-class cost:

    * Gram #1 full-grade + shifted (``_shift_value_fused``: the Kahan
      streaming Gram's m-independent error licenses a ~10x smaller shift
      at m = 2^22 than the naive-accumulation bound, i.e. MORE kappa
      contraction per pass).
    * The middle pass re-derives Q1 from A with a RELAXED (3-pass) dot —
      path-only work whose error is repaired downstream — while its Gram
      stays full-grade (the kappa-coverage bearer; see _RELAXED_MID).
    * Passes 3-4 apply the COMPOSED factor F2 = Rinv1 Rinv2 (``_compose``,
      near-exact f32): each costs ONE full-grade dot instead of a chain,
      and because the recomputation is bitwise deterministic, the final
      Gram G3 measures EXACTLY the Q2 the last pass re-derives — the
      Delta-trick correction then holds by construction.

    5 HBM passes (4 reads of A + 1 write of Q; peak footprint A + Q
    only, vs 7 passes and A + Q1 + Q2 + Q for the write-through form) at
    4 + (3+4) + (6+4) + (6+3) = 30 MXU passes for bf16x6_cor (vs 27 for
    "safe") — a win wherever 2 HBM passes cost more than 3 MXU passes
    (n <= ~512 at v5e ratios).  This lifts the round-2 ban on recompute
    pipelines for cholqr3: the ban predated ``_compose`` — chaining
    un-composed full-grade dots would have cost 12 extra passes.

    inplace=True (compact only) writes Q over A's buffer — the robust
    pipeline at capacity shapes; enter via ``fastqr_inplace``.

    Ladder hooks (compact only; used by core/auto.qr_auto_fused):
    ``g1`` supplies a precomputed FULL-GRADE Gram of ``a`` (the ladder's
    shared tier-0 Gram), skipping pass 1 — the robust tier then costs 4
    HBM passes instead of 5.  ``return_qgram=True`` additionally returns
    G = Q^T Q accumulated inside the final Q-writing pass (zero extra HBM
    traffic — the free measured gate); the return becomes (q, r, gq)."""
    from tsqr_tpu.ops import pallas_gram

    policy = modes.resolve(mode)
    if variant not in ("safe", "fast", "fastest", "compact"):
        raise ValueError(f"cholqr3_fused: unknown variant {variant!r}")
    if (g1 is not None or return_qgram) and variant != "compact":
        raise ValueError("g1/return_qgram are compact-pipeline hooks "
                         f"(got variant {variant!r})")
    if variant == "compact" and policy.mode in _CHEAP_DOT:
        raise ValueError(
            "cholqr3_fused: the cheap-dot modes already run a recompute "
            "pipeline under every variant; 'compact' applies to the "
            "corrected/fp32 modes")
    if inplace:
        if variant != "compact":
            raise ValueError("inplace requires the recompute pipeline "
                             "(variant 'compact')")
        if jnp.dtype(policy.io_dtype) != a.dtype:
            raise ValueError(
                f"inplace requires io_dtype == a.dtype, got "
                f"{policy.io_dtype} vs {a.dtype}")
    if a.shape[1] < 64 or a.shape[1] > _fused_n_max(policy):
        if inplace or g1 is not None or return_qgram or (
                variant == "compact"
                and a.shape[1] > _fused_n_max(policy)):
            # the XLA fallback cannot honor the A+Q-only footprint (nor
            # the ladder hooks) — see cholqr2_fused: no silent
            # degradation at capacity shapes
            raise ValueError(
                f"variant 'compact' (and its ladder hooks) requires 64 "
                f"<= n <= {_fused_n_max(policy)} (the fused-kernel "
                f"range), got n={a.shape[1]}")
        return cholqr3(a, mode)  # see _fused_n_max / cholqr1_fused notes

    mname = policy.mode.value
    if a.dtype not in (jnp.bfloat16, jnp.float32):
        a = a.astype(jnp.float32)
    m, n = a.shape
    g1_mode = "bf16" if variant == "fastest" else mname
    g = (g1.astype(jnp.float32) if g1 is not None
         else pallas_gram.gram_pallas(a, g1_mode, interpret=interpret))
    chunk = pallas_gram.effective_chunk(m, n, pallas_gram.GRAM_CHUNK)
    r1 = _chol_r(g, shift=_shift_value_fused(g, n, chunk))

    if variant == "compact":
        mid = _RELAXED_MID.get(policy.mode, mname)
        p2 = pallas_gram.stream_pallas(a, (_rinv(r1),), (mid,),
                                       gram_mode=mname, interpret=interpret)
        r2 = _chol_r(p2 + p2.T)
        f2 = _compose(_rinv(r1), _rinv(r2))
        p3 = pallas_gram.stream_pallas(a, (f2,), (mname,),
                                       gram_mode=mname, interpret=interpret)
        r3 = _chol_r(p3 + p3.T)
        dmode = _DELTA_MODE.get(policy.mode)
        qg = mname if return_qgram else None
        if dmode is not None:
            out = pallas_gram.stream_pallas(a, (f2, _delta(r3)),
                                            (mname, dmode),
                                            residual=(False, True),
                                            write_q=True, gram_mode=qg,
                                            interpret=interpret,
                                            out_dtype=policy.io_dtype,
                                            alias_q=inplace)
        else:
            out = pallas_gram.stream_pallas(a, (_compose(f2, _rinv(r3)),),
                                            (mname,), write_q=True,
                                            gram_mode=qg,
                                            interpret=interpret,
                                            out_dtype=policy.io_dtype,
                                            alias_q=inplace)
        r = jnp.triu(modes.mm_fp32(r3, modes.mm_fp32(r2, r1)))
        if return_qgram:
            q, p = out
            return (q.astype(policy.io_dtype), r.astype(policy.io_dtype),
                    p + p.T)
        q = out
        return q.astype(policy.io_dtype), r.astype(policy.io_dtype)

    if policy.mode in _CHEAP_DOT:
        p2 = pallas_gram.stream_pallas(a, (_rinv(r1),), (mname,),
                                       gram_mode=mname, interpret=interpret)
        r2 = _chol_r(p2 + p2.T)
        p3 = pallas_gram.stream_pallas(a, (_rinv(r1), _rinv(r2)),
                                       (mname, mname),
                                       gram_mode=mname, interpret=interpret)
        r3 = _chol_r(p3 + p3.T)
        q = pallas_gram.stream_pallas(a, (_rinv(r1), _rinv(r2), _rinv(r3)),
                                      (mname, mname, mname), write_q=True,
                                      interpret=interpret,
                                      out_dtype=policy.io_dtype)
    else:
        q1, g2 = pallas_gram.qpass_pallas(a, _rinv(r1), mname,
                                          interpret=interpret,
                                          with_gram=True)
        r2 = _chol_r(g2)
        q2, g3 = pallas_gram.qpass_pallas(q1, _rinv(r2), mname,
                                          interpret=interpret,
                                          with_gram=True)
        r3 = _chol_r(g3)
        dmode = _DELTA_MODE.get(policy.mode)
        if dmode is not None:
            q = pallas_gram.stream_pallas(q2, (_delta(r3),), (dmode,),
                                          residual=(True,), write_q=True,
                                          interpret=interpret,
                                          out_dtype=policy.io_dtype)
        else:
            q = pallas_gram.stream_pallas(q2, (_rinv(r3),), (mname,),
                                          write_q=True, interpret=interpret,
                                          out_dtype=policy.io_dtype)
    r = jnp.triu(modes.mm_fp32(r3, modes.mm_fp32(r2, r1)))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


# ---- iterated shifted CholeskyQR: the deep-kappa Gram method ---------------

def _iter_polish_k2(policy: modes.Policy) -> float:
    """kappa^2 threshold below which an UNSHIFTED pass is attempted
    (= the CholeskyQR2 breakdown budget kappa^2 * eps <= 0.1, see
    core/auto._kappa2_max).  Advisory only: the loop verifies the
    unshifted Cholesky numerically and falls back to the shifted form
    per pass."""
    return 0.1 / _EPS_GATE.get(policy.mode, 1e-6)


# Loop exit, two measured signals (both NaN-safe — NaN keeps looping):
#
# * orthg = ||X^T X - I||_F/sqrt(n) < _ORTH_EXIT: the panel is already
#   near-orthonormal, one tail pass lands at eps grade.  For deep-kappa
#   inputs this alone is UNREACHABLE: X is recomputed from A each pass
#   (fl(A F)), which carries an ~eps*kappa(A) error floor (measured:
#   orthg plateaus at ~3e-3 for kappa(A)=1e6 while kappa(X) sits at
#   1.02), so a second signal is needed.
# * k2 < _K2_EXIT: the `_k2_of_gram` bound certifies kappa(X)^2 is
#   genuinely tiny.  A k2 threshold this small cannot be faked by the
#   Gram noise floor (the failure mode of a LARGE k2 threshold, hit by
#   the qr_regen deep-kappa test: noise ~eps*||G|| inflates sigma_min of
#   a kappa=1e6 panel so k2 saturates near ~1e6): the noise is an
#   ABSOLUTE ~eps*||G|| perturbation, so k2 < 4 implies the true
#   kappa(X)^2 <= 4 + O(eps).  The tail then factors X's EXACTLY
#   measured Gram, absorbing the recompute-floor error into R.
_ORTH_EXIT = 3e-4
_K2_EXIT = 4.0


def _iter_shifted_loop(g0: Array, gram_of_f: Callable, shift_of_g: Callable,
                       n: int, k2_polish: float, max_shifted: int):
    """The shared pass loop of the iterated method.

    State: (i, k2, orthg, F, R_total, G) where F is the composed
    preconditioner (X = A F is the current panel), R_total the composed
    R factors, G the full-grade Gram of X, k2 the `_k2_of_gram` bound
    (advisory), and orthg = ||G - I||_F/sqrt(n), the measured exit
    signal.  Each pass factors G — UNSHIFTED when the k2 bound clears
    the CholeskyQR2 budget AND the unshifted Cholesky is numerically
    finite, otherwise with the safeguard shift (never breaks down) —
    composes, and re-derives G from A (``gram_of_f``, ONE m-scale
    pass).  Loops until orthg < _ORTH_EXIT or ``max_shifted`` passes;
    NaNs in either signal keep the loop running in shifted form (the
    safe direction), and a still-bad G at exit surfaces in the tail
    Cholesky -> NaN Q, which the ladder's measured gate routes to
    Householder.

    Returns (F, R_total, G, n_passes, orthg_exit)."""
    eye = jnp.eye(n, dtype=jnp.float32)

    def orth_of(g):
        return (jnp.linalg.norm(g - eye)
                / jnp.sqrt(jnp.float32(n))).reshape(1, 1)

    def cond(st):
        i, k2, orthg, *_ = st
        converged = jnp.logical_or((orthg < _ORTH_EXIT).reshape(()),
                                   (k2 < _K2_EXIT).reshape(()))
        return jnp.logical_and(i < max_shifted,
                               jnp.logical_not(converged))

    def body(st):
        i, k2, _, f, rt, g = st
        r_u = _chol_r(g, shift=None)
        r_s = _chol_r(g, shift=shift_of_g(g))
        want_u = jnp.logical_and((k2 < k2_polish).reshape(()),
                                 jnp.logical_not(jnp.any(jnp.isnan(r_u))))
        r1 = jnp.where(want_u, r_u, r_s)
        f = modes.mm_fp32(f, _rinv(r1))
        rt = modes.mm_fp32(r1, rt)
        g = gram_of_f(f)
        return i + 1, _k2_of_gram(g), orth_of(g), f, rt, g

    # g0 is the raw Gram of A (arbitrary scale): its orth_of is
    # meaningless unless A is already orthonormal — which is exactly the
    # one case an immediate exit is correct.
    st0 = (jnp.zeros((), jnp.int32), _k2_of_gram(g0), orth_of(g0),
           eye, eye, g0)
    i, _, orthg, f, rt, g = jax.lax.while_loop(cond, body, st0)
    return f, rt, g, i, orthg


def cholqr_iter(a: Array,
                mode: modes.ComputeMode | str | modes.Policy = "fp32",
                g1: Array | None = None,
                max_shifted: int = 16) -> tuple[Array, Array]:
    """Iterated shifted CholeskyQR: deep-kappa coverage on pure GEMMs.

    A single shifted pass contracts kappa by a FIXED factor
    (~sqrt(||G||/s), independent of kappa: for sigma_min^2 << s the pass
    maps sigma_min -> sigma_min/sqrt(s) while sigma_max -> ~1), so a
    ``lax.while_loop`` of Gram passes — each ONE m-scale pass, shifted
    while the conditioning demands it, unshifted (plain CholeskyQR
    polish) once it clears the CholeskyQR2 budget — contracts ANY input
    geometrically until the panel's MEASURED ||X^T X - I|| crosses
    `_ORTH_EXIT`; a single tail pass then lands at eps grade.  Measured
    (m=2^14, n=128, bf16x6_cor, CPU): converges to ~5e-7 orthogonality
    from kappa = 5e6 in ~9 shifted + ~3 polish passes at ~2.3x
    contraction per shifted pass (the fused variant's Kahan-Gram shift
    is ~10x smaller -> ~2x fewer passes); see tests/test_cholqr.py.

    This closes the ladder's performance cliff: inputs with kappa in
    1e4..~1e7 (the f32-representation limit) previously fell through to
    the Householder tree (~150x the fast tier's cost at 2^20 x 128);
    the loop costs a handful of streaming passes instead.  Inputs the
    loop cannot contract within ``max_shifted`` passes (e.g. exactly
    rank-deficient) exit with a NaN bound, the polish Cholesky goes NaN,
    and the caller's measured gate falls through to Householder — the
    no-kappa-caveat contract is unchanged.

    No reference analogue (the CUDA library's only deep-kappa answer is
    the Householder path, tcqr32x16.cu); the method follows the shifted
    CholeskyQR3 analysis (Fukaya et al. 2020) iterated to a dynamic
    depth.  Corrected/fp32 modes only (the cheap-dot modes' ~1e-3 Gram
    noise floor defeats the contraction analysis).

    ``g1`` optionally supplies a precomputed full-grade Gram of ``a``
    (the ladder's shared tier-0 Gram), saving the first m-scale pass.
    """
    policy = modes.resolve(mode)
    if policy.mode in _CHEAP_DOT:
        raise ValueError(
            "cholqr_iter: the cheap-dot modes' Gram noise floor defeats "
            "the shifted-contraction analysis; use the corrected/fp32 "
            f"modes (got {policy.mode.value!r})")
    a32 = a.astype(jnp.float32)
    m, n = a.shape

    def gram_of_f(f):
        g = modes.gram(policy.mm(a32, f), policy)
        return (g + g.T) * 0.5

    if g1 is None:
        g0 = modes.gram(a32, policy)
        g0 = (g0 + g0.T) * 0.5
    else:
        g0 = (g1.astype(jnp.float32) + g1.astype(jnp.float32).T) * 0.5
    f, rt, g, _, _ = _iter_shifted_loop(
        g0, gram_of_f, lambda gg: _shift_value(gg, m, n), n,
        _iter_polish_k2(policy), max_shifted)

    # tail: ONE unshifted factor of the exit Gram, applied to the
    # BITWISE-recomputed panel (x below repeats the loop's last
    # fl(A F) exactly, so r2's Gram measured exactly this x and the
    # factorization absorbs the recompute floor into R — composing
    # rinv2 into F instead would re-round through the eps*kappa(A)
    # amplified path and floor orthogonality at ~3e-3 for kappa=1e6,
    # the bug the deep-kappa tests pinned)
    r2 = _chol_r(g)
    rt = modes.mm_fp32(r2, rt)
    x = policy.mm(a32, f)
    q = _q_pass(x, r2, policy.mm)
    r = jnp.triu(rt)
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


def cholqr_iter_fused(a: Array,
                      mode: modes.ComputeMode | str | modes.Policy = "fp32",
                      interpret: bool = False,
                      g1: Array | None = None,
                      return_qgram: bool = False,
                      max_shifted: int = 16):
    """:func:`cholqr_iter` on the streaming Pallas kernels.

    Each loop pass is ONE HBM read of A (`stream_pallas` applies the
    composed preconditioner F and accumulates the Kahan half-Gram of
    A F in VMEM), and the Kahan Gram's m-independent error licenses the
    ~10x smaller `_shift_value_fused` shift — more kappa contraction per
    pass than the XLA variant.  The tail is a single Q-writing pass
    applying the exit factor via the Delta trick (||Rinv - I|| <~
    _ORTH_EXIT/2 at exit by construction), with the free in-pass Q-Gram
    gate (``return_qgram=True`` -> (q, r, gq)) for the ladder.  Peak HBM
    footprint is A + Q only (no intermediate panel is ever written).

    Out-of-range n delegates to the XLA variant (unless the ladder hooks
    ``g1``/``return_qgram`` are requested, which the fallback cannot
    honor — mirrors cholqr3_fused's contract)."""
    from tsqr_tpu.ops import pallas_gram

    policy = modes.resolve(mode)
    if policy.mode in _CHEAP_DOT:
        raise ValueError(
            "cholqr_iter_fused: corrected/fp32 modes only (see "
            f"cholqr_iter), got {policy.mode.value!r}")
    if a.shape[1] < 64 or a.shape[1] > _fused_n_max(policy):
        if g1 is not None or return_qgram:
            raise ValueError(
                f"g1/return_qgram require 64 <= n <= "
                f"{_fused_n_max(policy)} (the fused-kernel range), got "
                f"n={a.shape[1]}")
        return cholqr_iter(a, mode, max_shifted=max_shifted)

    mname = policy.mode.value
    if a.dtype not in (jnp.bfloat16, jnp.float32):
        a = a.astype(jnp.float32)
    m, n = a.shape
    chunk = pallas_gram.effective_chunk(m, n, pallas_gram.GRAM_CHUNK)

    def gram_of_f(f):
        p = pallas_gram.stream_pallas(a, (f,), (mname,), gram_mode=mname,
                                      interpret=interpret)
        return p + p.T

    if g1 is None:
        g0 = pallas_gram.gram_pallas(a, mname, interpret=interpret)
    else:
        g0 = g1.astype(jnp.float32)
    g0 = (g0 + g0.T) * 0.5
    f, rt, g, _, _ = _iter_shifted_loop(
        g0, gram_of_f, lambda gg: _shift_value_fused(gg, n, chunk), n,
        _iter_polish_k2(policy), max_shifted)

    # tail: one unshifted factor of the exit Gram, applied in a single
    # Q-writing pass via the Delta trick (≙ cholqr3_fused's final pass)
    r2 = _chol_r(g)
    rt = modes.mm_fp32(r2, rt)
    dmode = _DELTA_MODE.get(policy.mode)
    qg = mname if return_qgram else None
    if dmode is not None:
        out = pallas_gram.stream_pallas(a, (f, _delta(r2)), (mname, dmode),
                                        residual=(False, True), write_q=True,
                                        gram_mode=qg, interpret=interpret,
                                        out_dtype=policy.io_dtype)
    else:
        out = pallas_gram.stream_pallas(a, (_compose(f, _rinv(r2)),),
                                        (mname,), write_q=True, gram_mode=qg,
                                        interpret=interpret,
                                        out_dtype=policy.io_dtype)
    r = jnp.triu(rt).astype(policy.io_dtype)
    if return_qgram:
        q, p = out
        return q.astype(policy.io_dtype), r, p + p.T
    return out.astype(policy.io_dtype), r


# ---- randomized (sketch-preconditioned) CholeskyQR --------------------------

def sketch_gaussian(a: Array, key: Array, l: int,
                    chunk_rows: int = 1 << 16, mesh=None) -> Array:
    """B = Ω A with Ω (l, m) Gaussian, accumulated over row chunks with
    each Ω chunk generated on the fly (``fold_in(key, i)``) — Ω itself
    is never materialized, so the sketch works at capacity shapes where
    an (l, m) Gaussian would dwarf A (l·m f32 ≈ 8.7 GB at m=2^24,
    n=128).  Per-chunk footprint: one (l, chunk) Ω block + the (l, n)
    accumulator.  Full-precision contraction always: the sketch steers
    preconditioning/pivoting decisions downstream, so its error budget
    is not the compute mode's to spend.  Shared by :func:`rand_cholqr`
    and the rank-revealing ``models.qrcp``.

    ``mesh``: row-shard A over a `parallel.mesh` Mesh — each chip
    contracts its own on-the-fly Ω block with its local rows and the
    (l, n) partials reduce in ONE psum (`parallel.dtsqr.dsketch`); B
    comes back replicated.  The draw differs from the single-chip one
    (Ω blocks are keyed per shard), same as different ``chunk_rows``
    draw different Ω — statistics, not values, are the contract."""
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        return dtsqr.dsketch(a, key, l, mesh, chunk_rows=chunk_rows)
    m, n = a.shape
    a32 = a.astype(jnp.float32)
    if m <= chunk_rows:
        return modes.mm_fp32(
            jax.random.normal(key, (l, m), jnp.float32), a32)
    nc, tail = divmod(m, chunk_rows)

    def body(i, b):
        om = jax.random.normal(jax.random.fold_in(key, i),
                               (l, chunk_rows), jnp.float32)
        ach = jax.lax.dynamic_slice(a32, (i * chunk_rows, 0),
                                    (chunk_rows, n))
        return b + modes.mm_fp32(om, ach)

    b = jax.lax.fori_loop(0, nc, body, jnp.zeros((l, n), jnp.float32))
    if tail:
        om = jax.random.normal(jax.random.fold_in(key, nc),
                               (l, tail), jnp.float32)
        b = b + modes.mm_fp32(om, a32[nc * chunk_rows:])
    return b


def rand_cholqr(a: Array,
                mode: modes.ComputeMode | str | modes.Policy = "fp32",
                seed: int = 0,
                embed: float = 2.0,
                passes: int = 2,
                mesh=None) -> tuple[Array, Array]:
    """Randomized CholeskyQR: kappa-independent stability in FIXED passes.

    Sketch-precondition, then CholeskyQR (Balabanov 2022 "randomized
    Cholesky QR"; Higgins et al. 2023 rand_cholQR):

      1. B = Ω A, Ω an (l, m) on-the-fly Gaussian, l = embed·n — an
         oblivious subspace embedding, so w.h.p. sigma(B) brackets
         sigma(A) within (1 ± ε), ε ≈ sqrt(n/l).
      2. R_s = qr(B).R on the SMALL (l, n) sketch — O(l n^2) flops.
      3. X = A R_s^{-1}: kappa(X) <= (1+ε)/(1−ε) ≈ 3-6 w.h.p.,
         INDEPENDENT of kappa(A) — the whole point.
      4. CholeskyQR on the tame X (``passes`` = 1 or 2; two passes land
         on the mode's eps floor since kappa(X)^2 eps << 1 by step 3),
         R = R_x · R_s.

    vs :func:`cholqr_iter` (the ladder's deep-kappa rung): the iterated
    method pays a DATA-DEPENDENT number of m-scale passes (~9 shifted +
    ~3 polish from kappa = 5e6), this one always costs the sketch GEMM
    (one HBM read of A, 2·l/n Gram-equivalents of MXU work) + 1 apply +
    ``passes`` CholeskyQR iterations — but is probabilistic where the
    iterated ladder rung is deterministic, which is why the ladder keeps
    the measured-gate design and this ships as an explicitly-seeded
    standalone method (``fastqr(method="rand_cholqr")`` uses seed 0).
    Deterministic given ``seed``; ``seed`` is static, so the entry stays
    differentiable through ``fastqr``'s custom QR rule.

    The sketch and the preconditioner APPLY run at full precision
    whatever the mode (a bf16-grade apply perturbs X by ~eps_bf16 ·
    kappa(A), destroying the preconditioning for kappa > ~250); the
    Gram/Q passes use the mode's arithmetic, so output lands at the
    mode's own grade.  Rank-deficient inputs: the ~eps R_s pivot
    amplifies rounding noise into the null direction, so Q comes back
    orthonormal but A != QR — detectable by the residual check (or
    non-finite if the pivot is exactly zero); same
    fall-through-to-a-measured-gate contract as every Gram method here,
    but the failure signal is the residual, not orthogonality.  No
    reference
    analogue: the CUDA library's only deep-kappa answer is the
    Householder path (reference tcqr32x16.cu).

    Requires m >= 2n (the embedding needs l = embed·n <= m sketch rows;
    near-square inputs belong to the BlockQR/TSQR paths anyway).

    ``mesh``: run multi-chip on a row-sharded A — the sketch reduces in
    one (l, n) psum (`dsketch`), the small preconditioner QR is
    replicated, and the Gram/apply passes self-distribute under GSPMD
    (computation follows sharding; the Gram contraction becomes the
    same (n, n) allreduce `dcholqr` pays).
    """
    policy = modes.resolve(mode)
    if passes not in (1, 2):
        raise ValueError(f"rand_cholqr: passes must be 1 or 2, got {passes}")
    m, n = a.shape
    l = max(int(embed * n), n + 8)
    l = -(-l // 8) * 8  # sublane-align the sketch height
    if m < l:
        raise ValueError(
            f"rand_cholqr requires m >= {l} (= embed*{n} sketch rows) "
            f"for the subspace embedding, got m={m}; use blockqr/tsqr "
            "for near-square inputs")
    a32 = a.astype(jnp.float32)
    b = sketch_gaussian(a32, jax.random.PRNGKey(seed), l, mesh=mesh)
    r_s = jnp.linalg.qr(b, mode="r")
    # canonicalize the Householder sign freedom so diag(R_s) > 0: the
    # Cholesky passes then keep diag(R) > 0 overall, making the output
    # factorization unique (hence seed-independent to eps grade)
    r_s = r_s * jnp.where(jnp.diagonal(r_s) < 0, -1.0, 1.0)[:, None]
    # full-precision apply: the preconditioner must reach X intact
    x = modes.mm_fp32(a32, _rinv(r_s))
    g = modes.gram(x, policy)
    r1 = _chol_r(g)
    q = _q_pass(x, r1, policy.mm)
    rt = modes.mm_fp32(r1, r_s)
    if passes == 2:
        g2 = modes.gram(q, policy)
        r2 = _chol_r(g2)
        rt = modes.mm_fp32(r2, rt)
        q = _q_pass(q, r2, policy.mm)
    return q.astype(policy.io_dtype), jnp.triu(rt).astype(policy.io_dtype)


_METHODS = {"cholqr1": cholqr1, "cholqr2": cholqr2, "cholqr3": cholqr3,
            "cholqr1_fused": cholqr1_fused,
            "cholqr2_fused": cholqr2_fused, "cholqr3_fused": cholqr3_fused,
            "cholqr_iter": cholqr_iter, "cholqr_iter_fused": cholqr_iter_fused,
            "rand_cholqr": rand_cholqr}


@diff.differentiable
@functools.partial(jax.jit, static_argnames=("mode", "method", "variant"))
def fastqr(a: Array,
           mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
           method: str = "cholqr3",
           variant: str = "safe") -> tuple[Array, Array]:
    """MXU-native tall-skinny QR (single jit entry point).

    methods: cholqr1/2/3 (pure XLA), cholqr{1,2,3}_fused (streaming
    Pallas kernels, TPU only), cholqr_iter[_fused] (deep-kappa iterated
    shifted loop), and rand_cholqr (sketch-preconditioned,
    kappa-independent in fixed passes; seed 0 here — call
    :func:`rand_cholqr` directly for a custom seed).  ``variant`` trades
    CholeskyQR's
    self-correction slack for MXU passes in the fused corrected methods
    (see cholqr2_fused: safe / fast / fastest); other methods accept
    only the default "safe" — a non-default variant on a method that
    cannot honor it raises instead of silently running the default.

    Caveat: "fast"/"fastest" on the fused methods are best-effort in n —
    outside the fused-kernel range (n < 64 or n > _fused_n_max) the call
    delegates to the XLA cholqr2/cholqr3, which have no variants, so the
    variant is dropped there (the XLA path is full-precision, i.e.
    strictly MORE accurate — never less).  "compact"/"turbo" raise
    instead when n is too wide, because their A+Q-only HBM contract
    cannot be honored by the XLA fallback (see cholqr2_fused).
    """
    m, n = a.shape
    if m < n:
        # ≙ the reference's wide-input rejection (blockqr.cu:407); a
        # wide Gram is singular by construction, so the Cholesky would
        # only fail later and less legibly
        raise ValueError(f"fastqr requires m >= n, got {a.shape}")
    if variant != "safe":
        if method not in ("cholqr2_fused", "cholqr3_fused"):
            raise ValueError(
                f"method {method!r} has no variants (got {variant!r}); "
                f"variants exist for cholqr2_fused/cholqr3_fused only")
        return _METHODS[method](a, mode, variant=variant)
    return _METHODS[method](a, mode)


@functools.partial(jax.jit, static_argnames=("mode", "method", "variant"),
                   donate_argnums=(0,))
def fastqr_inplace(a: Array,
                   mode: modes.ComputeMode | str | modes.Policy = "bf16",
                   method: str = "cholqr1_fused",
                   variant: str = "compact") -> tuple[Array, Array]:
    """Capacity-mode QR: A's buffer is donated and Q is written over it.

    Peak HBM is ~A alone (vs A+Q), which admits shapes where A itself
    fills half the chip: M=2^24 x N=128 f32 (cholqr2_fused compact/turbo,
    corrected modes) and M=2^25 x N=128 bf16 (cholqr1_fused).  The caller
    LOSES ``a`` — jax invalidates the donated buffer.  Requires
    io_dtype == a.dtype so the aliased kernel output can reuse the buffer
    (≙ the reference's caller-provided working memory discipline,
    tsqr.hpp:108-119, taken to its TPU conclusion)."""
    m, n = a.shape
    if m < n:
        raise ValueError(f"fastqr_inplace requires m >= n, got {a.shape}")
    if method == "cholqr1_fused":
        return cholqr1_fused(a, mode, inplace=True)
    if method == "cholqr2_fused":
        # only the recompute pipelines stream A itself in the final pass
        return cholqr2_fused(a, mode, variant=variant, inplace=True)
    if method == "cholqr3_fused":
        # the ROBUST capacity path: full cholqr3 kappa contract with
        # peak HBM ~ A alone (variant must be "compact")
        return cholqr3_fused(a, mode, variant=variant, inplace=True)
    raise ValueError(f"fastqr_inplace: unsupported method {method!r}")
