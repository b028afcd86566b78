"""Compute-mode system: runtime precision policies for every TSQR layer.

The CUDA reference threads a compile-time ``compute_mode`` template enum
through all layers (reference blockqr.hpp:12-23, tsqr.hpp:9-20, tcqr.hpp:9-20,
matmul.hpp:10-16) with constexpr mode-mapping functions and explicit
instantiation lists.  On TPU we replace that with a single runtime
:class:`ComputeMode` enum resolved to a :class:`Policy` dataclass holding the
IO dtype, the working-Q dtype (reference tsqr.hpp:25-39 ``get_working_q_type``)
and a matmul implementation.  Everything is traced under one ``jax.jit`` so a
runtime enum costs nothing — each mode is simply a different traced program.

Mode mapping (reference README.md:16-26 table -> TPU):

==================  =====================================================
reference mode      TPU-native equivalent
==================  =====================================================
fp16_notc           BF16           (bf16 IO, bf16 MXU products)
fp16_tc_nocor       BF16           (same: every TPU matmul runs on the MXU)
fp32_notc           FP32           (fp32 IO, HIGHEST-precision matmuls)
fp32_tc_nocor       BF16_NOCOR     (fp32 IO, **bf16 working Q**, bf16 MXU)
tf32_tc_nocor       BF16X3_NOCOR   (fp32 IO, one-level-split 3-pass matmul
                                    without using the low part == tf32-grade
                                    ~ lax.Precision.HIGH on TPU)
fp32_tc_cor         BF16X6_COR     (fp32 IO, 3-way bf16 split, 6 MXU passes,
                                    recovers fp32-grade accuracy — the TPU
                                    re-derivation of the reference's fp16
                                    split-correction, tcqr32x16.cu:669-819)
tf32_tc_cor         BF16X3_COR     (fp32 IO, 2-way bf16 split, 3 MXU passes)
tf32_tc_nocor_emu   BF16_NOCOR_EMU (mantissa-clipped fp32 math on any
                                    backend; cross-check device ≙
                                    matmul.hpp:86-108 tf32 emulator)
tf32_tc_cor_emu     BF16X3_COR_EMU (explicit split computed in clipped fp32
                                    ≙ matmul.hpp:26-54)
mixed_tc_cor_emu    MIXED_COR_EMU  (bf16 main product + fp32 residual terms
                                    ≙ matmul.hpp:56-84)
==================  =====================================================

Why the split-correction changes on TPU: fp16 has a 5-bit exponent, so the
reference must rescale the residual by 1024/2048 to dodge underflow
(tsqr.cu:330-412 ``CORRECTION_RESCALE``, matrix_operations.cuh:42-106).  bf16
shares fp32's 8-bit exponent, so no rescale is needed; instead bf16 has only
an 8-bit mantissa (fp16: 11), so a 2-way split captures 16 of fp32's 24
mantissa bits (~tf32_tc_cor grade) and a 3-way split (24 bits, 6 products)
is required for fp32_tc_cor-grade accuracy.  Both are provided.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# ---------------------------------------------------------------------------
# Mantissa clipping (the emulation substrate, ≙ reference matmul.hpp:18-19
# ``mantissa_length`` + cutf::experimental::cut_mantissa).
# ---------------------------------------------------------------------------

_F32_MANTISSA = 23


def clip_mantissa(x: Array, bits: int) -> Array:
    """Round an fp32 array to ``bits`` explicit mantissa bits (round-to-nearest).

    ``bits=7`` emulates bf16 operands, ``bits=10`` emulates tf32 operands —
    the TPU analogue of the reference's CUDA-core Tensor-Core emulator
    (matmul.hpp:86-108 cuts mantissas to 10 bits to fake tf32 on V100).
    """
    x = x.astype(jnp.float32)
    drop = _F32_MANTISSA - bits
    if drop <= 0:
        return x
    ix = lax.bitcast_convert_type(x, jnp.uint32)
    half = jnp.uint32(1 << (drop - 1))
    mask = jnp.uint32(0xFFFFFFFF) << drop
    # round-to-nearest-even on the kept mantissa
    lsb = (ix >> drop) & jnp.uint32(1)
    rounded = (ix + half - jnp.uint32(1) + lsb) & mask
    out = lax.bitcast_convert_type(rounded, jnp.float32)
    # preserve NaN/Inf untouched
    return jnp.where(jnp.isfinite(x), out, x)


def to_bf16(x: Array) -> Array:
    return x.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# bf16 splitting (≙ reference fp32->half+residual splitters diff32x16,
# matrix_operations.cuh:42-141; no CORRECTION_RESCALE needed for bf16).
# ---------------------------------------------------------------------------


# IMPORTANT: XLA's algebraic simplifier will destroy a naive split-corrected
# matmul under jit: it folds f32->bf16->f32 convert pairs ("excess
# precision"), turning lo = x - f32(bf16(x)) into 0, and reassociates
# dot(ah,bh) + dot(ah,bl) into dot(ah, bh+bl) with the add performed in
# bf16 — silently collapsing the correction to plain bf16 accuracy (measured:
# 2e-3 relative error under jit vs 6e-8 eager).  Every split component and
# every partial product therefore passes through lax.optimization_barrier,
# which is free at runtime but opaque to the simplifier.  This is the TPU
# analogue of the reference keeping its correction arithmetic in hand-written
# device code where no compiler could fold it (tcqr32x16.cu:669-819).
_ob = lax.optimization_barrier


def split2(x: Array) -> tuple[Array, Array]:
    """2-way bf16 split: x ≈ hi + lo, each exactly representable in bf16."""
    x = x.astype(jnp.float32)
    hi = _ob(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, _ob(lo)


def split3(x: Array) -> tuple[Array, Array, Array]:
    """3-way bf16 split: x ≈ t0 + t1 + t2 (24 mantissa bits captured)."""
    x = x.astype(jnp.float32)
    t0 = _ob(x.astype(jnp.bfloat16))
    r = x - t0.astype(jnp.float32)
    t1 = _ob(r.astype(jnp.bfloat16))
    r2 = r - t1.astype(jnp.float32)
    t2 = _ob(r2.astype(jnp.bfloat16))
    return t0, t1, t2


# ---------------------------------------------------------------------------
# Matmul implementations.  All take fp32(-castable) inputs, contract the last
# axis of ``a`` with the second-to-last axis of ``b`` (batched matmul
# semantics of jnp.matmul) and return fp32.
# ---------------------------------------------------------------------------


def _mm(a: Array, b: Array, precision) -> Array:
    return jnp.matmul(a, b, precision=precision,
                      preferred_element_type=jnp.float32)


def mm_fp32(a: Array, b: Array) -> Array:
    """fp32-grade matmul (HIGHEST = 6-pass bf16 on TPU, true fp32 on CPU)."""
    return _mm(a.astype(jnp.float32), b.astype(jnp.float32),
               lax.Precision.HIGHEST)


def mm_bf16(a: Array, b: Array) -> Array:
    """Single-pass bf16 MXU product with fp32 accumulation.

    On CPU the same semantics are expressed as an f32 dot of bf16-rounded
    operands (XLA CPU's DotThunk lacks bf16 x bf16 = f32 for some shapes);
    barriers keep the rounding from being folded away as excess precision.
    """
    import jax as _jax

    if _jax.default_backend() != "tpu":
        ar = _ob(a.astype(jnp.bfloat16)).astype(jnp.float32)
        br = _ob(b.astype(jnp.bfloat16)).astype(jnp.float32)
        return _mm(ar, br, lax.Precision.DEFAULT)
    return _mm(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
               lax.Precision.DEFAULT)


def mm_bf16x3_nocor(a: Array, b: Array) -> Array:
    """tf32-grade: native 3-pass bf16 (lax.Precision.HIGH on TPU)."""
    return _mm(a.astype(jnp.float32), b.astype(jnp.float32),
               lax.Precision.HIGH)


def mm_bf16x3_cor(a: Array, b: Array) -> Array:
    """Explicit 2-way-split corrected matmul: 3 bf16 MXU passes.

    TPU re-derivation of the reference's error-correction GEMM
    (tcqr32x16.cu:696-745: hi*hi + (hi*lo + lo*hi)/rescale): bf16 needs no
    rescale, so p = hi@hi + (hi@lo + lo@hi), all accumulated in fp32.
    """
    ah, al = split2(a)
    bh, bl = split2(b)
    p = _ob(_mm(ah, bh, lax.Precision.DEFAULT))
    p = p + (_ob(_mm(ah, bl, lax.Precision.DEFAULT))
             + _ob(_mm(al, bh, lax.Precision.DEFAULT)))
    return p


def mm_bf16x3_cor_3term(a: Array, b: Array) -> Array:
    """2-way split with the extra lo@lo term (≙ THREE_TERMS_CORRECTION,
    tcqr32x16.cu:18, 727-737)."""
    ah, al = split2(a)
    bh, bl = split2(b)
    p = _ob(_mm(al, bl, lax.Precision.DEFAULT))
    p = p + (_ob(_mm(ah, bl, lax.Precision.DEFAULT))
             + _ob(_mm(al, bh, lax.Precision.DEFAULT)))
    p = p + _ob(_mm(ah, bh, lax.Precision.DEFAULT))
    return p


def mm_bf16x6_cor(a: Array, b: Array) -> Array:
    """Explicit 3-way-split corrected matmul: 6 bf16 MXU passes, fp32 grade.

    The TPU equivalent of the reference's fp32_tc_cor accuracy class: terms
    with combined residual order >= 3 are dropped (below 2^-24 relative).
    """
    a0, a1, a2 = split3(a)
    b0, b1, b2 = split3(b)
    P = lax.Precision.DEFAULT
    p = (_ob(_mm(a0, b2, P)) + _ob(_mm(a1, b1, P)) + _ob(_mm(a2, b0, P)))
    p = p + (_ob(_mm(a0, b1, P)) + _ob(_mm(a1, b0, P)))
    p = p + _ob(_mm(a0, b0, P))
    return p


def gram(a: Array, policy: "Policy") -> Array:
    """G = A^T A under a policy, splitting A only once.

    A naive ``policy.mm(a.T, a)`` splits both ``a.T`` and ``a`` (XLA does
    not CSE the transposed copies), doubling the bf16 split memory for
    m-scale operands.  Here the splits are taken once and contracted over
    dim 0 of both sides (transposed-LHS MXU GEMM, no materialized
    transpose).
    """
    a = a.astype(jnp.float32)

    def dg(x, y):
        return lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                               precision=lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)

    mode = policy.mode
    if mode is ComputeMode.BF16X3_COR:
        a0, a1 = split2(a)
        return _ob(dg(a0, a0)) + (_ob(dg(a0, a1)) + _ob(dg(a1, a0)))
    if mode is ComputeMode.BF16X6_COR:
        a0, a1, a2 = split3(a)
        g = _ob(dg(a0, a2)) + _ob(dg(a1, a1)) + _ob(dg(a2, a0))
        g = g + (_ob(dg(a0, a1)) + _ob(dg(a1, a0)))
        return g + _ob(dg(a0, a0))
    if mode in (ComputeMode.BF16, ComputeMode.BF16_NOCOR):
        ab = a.astype(jnp.bfloat16)
        return dg(ab, ab)
    return policy.mm(a.T, a)


# --- emulation matmuls (precision-clipped fp32; ≙ matmul.hpp:26-209) -------


def mm_bf16_nocor_emu(a: Array, b: Array) -> Array:
    """bf16 MXU emulated by clipping operand mantissas to 7 bits
    (≙ tf32_tc_nocor_emu, matmul.hpp:86-108, with bf16's width)."""
    return mm_fp32(clip_mantissa(a, 7), clip_mantissa(b, 7))


def mm_tf32_nocor_emu(a: Array, b: Array) -> Array:
    """tf32 MXU emulated by clipping operand mantissas to 10 bits
    (≙ matmul.hpp:86-108)."""
    return mm_fp32(clip_mantissa(a, 10), clip_mantissa(b, 10))


def mm_bf16x3_cor_emu(a: Array, b: Array) -> Array:
    """Split-corrected product computed on clipped-fp32 'fake MXU' units
    (≙ tf32_tc_cor_emu, matmul.hpp:26-54: a·Δb + Δa·b correction)."""
    ah = clip_mantissa(a, 7)
    al = clip_mantissa(a - ah, 7)
    bh = clip_mantissa(b, 7)
    bl = clip_mantissa(b - bh, 7)
    return mm_fp32(ah, bh) + (mm_fp32(ah, bl) + mm_fp32(al, bh))


def mm_mixed_cor_emu(a: Array, b: Array) -> Array:
    """Main product in bf16 precision, residual terms in fp32
    (≙ mixed_tc_cor_emu, matmul.hpp:56-84: half main + tf32 residuals)."""
    ah = clip_mantissa(a, 7)
    al = (a.astype(jnp.float32) - ah)
    bh = clip_mantissa(b, 7)
    bl = (b.astype(jnp.float32) - bh)
    return mm_fp32(ah, bh) + (mm_fp32(ah, bl) + mm_fp32(al, bh))


# ---------------------------------------------------------------------------
# ComputeMode -> Policy
# ---------------------------------------------------------------------------


class ComputeMode(str, enum.Enum):
    """Runtime precision mode (≙ reference mtk::qr::compute_mode)."""

    FP32 = "fp32"                        # ≙ fp32_notc
    BF16 = "bf16"                        # ≙ fp16_notc / fp16_tc_nocor
    BF16_NOCOR = "bf16_nocor"            # ≙ fp32_tc_nocor
    BF16X3_NOCOR = "bf16x3_nocor"        # ≙ tf32_tc_nocor
    BF16X3_COR = "bf16x3_cor"            # ≙ tf32_tc_cor
    BF16X6_COR = "bf16x6_cor"            # ≙ fp32_tc_cor
    BF16_NOCOR_EMU = "bf16_nocor_emu"    # ≙ tf32_tc_nocor_emu (bf16 width)
    TF32_NOCOR_EMU = "tf32_nocor_emu"    # ≙ tf32_tc_nocor_emu
    BF16X3_COR_EMU = "bf16x3_cor_emu"    # ≙ tf32_tc_cor_emu
    MIXED_COR_EMU = "mixed_cor_emu"      # ≙ mixed_tc_cor_emu

    def __str__(self) -> str:  # CSV-friendly
        return self.value


@dataclasses.dataclass(frozen=True)
class Policy:
    """Resolved precision policy threaded through every layer.

    Attributes:
      mode: the originating ComputeMode.
      io_dtype: dtype of A/Q/R at the public API boundary
        (≙ get_io_type, tsqr.hpp:25-31).
      work_dtype: dtype the intermediate Q/R tree factors are stored in
        (≙ get_working_q_type, tsqr.hpp:33-39 — fp32_tc_nocor stores
        working Q in half; BF16_NOCOR stores it in bf16).
      mm: matmul implementation used for every reflector application and
        tree product (the panel/tree kernels' math, ≙ tcqr32x16.cu).
      corrected: True for split-corrected modes (drives harness labels).
    """

    mode: ComputeMode
    io_dtype: jnp.dtype
    work_dtype: jnp.dtype
    mm: Callable[[Array, Array], Array]
    corrected: bool = False

    @property
    def name(self) -> str:
        return self.mode.value

    @property
    def trailing_mm(self) -> Callable[[Array, Array], Array]:
        """Matmul for the BlockQR-level (trailing/projection/fix-up) GEMMs.

        ≙ the reference's cuBLAS math-mode switch (blockqr.cu:61-68): only
        fp16_tc_nocor / fp32_tc_nocor run trailing GEMMs in TENSOR_OP
        math; every other mode — including ALL corrected modes — uses
        CUBLAS_DEFAULT_MATH, i.e. plain fp32 GEMMs.  The TPU equivalent
        of an fp32 cuBLAS GEMM is the 6-pass HIGHEST matmul, which XLA
        lowers with on-the-fly operand splitting — no HBM-materialized
        split copies, unlike the explicit corrected ``mm`` (measured >4x
        faster on wide trailing updates at m=n=2^14).
        """
        if self.mode in (ComputeMode.BF16, ComputeMode.BF16_NOCOR):
            return self.mm
        return mm_fp32


_POLICIES = {
    ComputeMode.FP32: Policy(ComputeMode.FP32, jnp.float32, jnp.float32,
                             mm_fp32),
    ComputeMode.BF16: Policy(ComputeMode.BF16, jnp.bfloat16, jnp.bfloat16,
                             mm_bf16),
    ComputeMode.BF16_NOCOR: Policy(ComputeMode.BF16_NOCOR, jnp.float32,
                                   jnp.bfloat16, mm_bf16),
    ComputeMode.BF16X3_NOCOR: Policy(ComputeMode.BF16X3_NOCOR, jnp.float32,
                                     jnp.float32, mm_bf16x3_nocor),
    ComputeMode.BF16X3_COR: Policy(ComputeMode.BF16X3_COR, jnp.float32,
                                   jnp.float32, mm_bf16x3_cor, corrected=True),
    ComputeMode.BF16X6_COR: Policy(ComputeMode.BF16X6_COR, jnp.float32,
                                   jnp.float32, mm_bf16x6_cor, corrected=True),
    ComputeMode.BF16_NOCOR_EMU: Policy(ComputeMode.BF16_NOCOR_EMU,
                                       jnp.float32, jnp.float32,
                                       mm_bf16_nocor_emu),
    ComputeMode.TF32_NOCOR_EMU: Policy(ComputeMode.TF32_NOCOR_EMU,
                                       jnp.float32, jnp.float32,
                                       mm_tf32_nocor_emu),
    ComputeMode.BF16X3_COR_EMU: Policy(ComputeMode.BF16X3_COR_EMU,
                                       jnp.float32, jnp.float32,
                                       mm_bf16x3_cor_emu, corrected=True),
    ComputeMode.MIXED_COR_EMU: Policy(ComputeMode.MIXED_COR_EMU,
                                      jnp.float32, jnp.float32,
                                      mm_mixed_cor_emu, corrected=True),
}


def resolve(mode: ComputeMode | str | Policy) -> Policy:
    """Resolve a mode name / enum / policy into a Policy."""
    if isinstance(mode, Policy):
        return mode
    if isinstance(mode, str) and not isinstance(mode, ComputeMode):
        mode = ComputeMode(mode)
    return _POLICIES[mode]


ALL_MODES = tuple(ComputeMode)
MXU_MODES = (ComputeMode.BF16, ComputeMode.BF16_NOCOR,
             ComputeMode.BF16X3_NOCOR, ComputeMode.BF16X3_COR,
             ComputeMode.BF16X6_COR)
EMU_MODES = (ComputeMode.BF16_NOCOR_EMU, ComputeMode.TF32_NOCOR_EMU,
             ComputeMode.BF16X3_COR_EMU, ComputeMode.MIXED_COR_EMU)
