"""Pallas streaming kernels for CholeskyQR: fused Gram / Q-pass pipelines.

Why these exist (roofline math for m=2^22, n=128 fp32 on one v5e,
819 GB/s HBM, ~197 bf16 TFLOP/s MXU):

* A naive corrected Gram ``modes.gram(a, policy)`` materializes the bf16
  split components of A in HBM (2-3 copies) before the MXU products.  The
  streaming kernel splits each (C, n) chunk *in VMEM* and accumulates the
  split products into an (n, n) f32 accumulator that never leaves VMEM:
  exactly one HBM read of A.
* At n=128 in bf16x6_cor the bound is the **MXU pass count**, not HBM:
  each corrected product is 6 rank-m MXU passes (2mn^2 flops each,
  ~0.7 ms/pass at m=2^22), so CholeskyQR2's three products cost
  24 passes ~ 16.7 ms while its HBM traffic costs ~13 ms.  Two structural
  cuts applied here:

  1. **Symmetric half-Gram**: G = A^T A is symmetric, and so is every
     split cross-term pair dg(x_i, x_j) + dg(x_j, x_i).  The kernel
     accumulates P = 0.5*sum_i dg(x_i, x_i) + sum_{i<j} dg(x_i, x_j) and
     the caller forms G = P + P^T: a bf16x6 Gram drops from 6 MXU passes
     to 4, bf16x3 from 3 to 2.
  2. **Chained in-VMEM dot passes**: one kernel applies a whole sequence
     Q = A R1^{-1} R2^{-1} ... chunk-wise in VMEM (each factor at its own
     precision) and/or accumulates the half-Gram of the result.  Because
     the recomputation is bitwise deterministic, CholeskyQR2 never has to
     write its intermediate Q1 to HBM: pass 3 re-derives Q1 from A with
     ONE cheap extra dot instead of a 2.1 GB write + read
     (5 HBM passes -> 4).

Net effect (cholqr2_fused, bf16x6_cor, n=128): 24 MXU passes + 5 HBM
passes -> 20 + 4 with a full-precision first iteration, or 13 + 4 with a
sloppy first iteration (see core/cholqr.py for when that is licensed).

This is the TPU re-expression of the reference's "keep the panel resident
and drive products through the matrix unit" kernel strategy
(tcqr32x16.cu), applied to the Gram form instead of reflectors.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsqr_tpu import modes

Array = jax.Array

# Streaming chunk rows per grid step.  Measured on the v5e chip
# (data/bw.csv, m=2^22 n=128): Q-writing passes peak at 4096 (666 GB/s
# implied vs 654 at 8192), while Gram-only passes peak at 8192
# (590 vs 570 for x6; 745 vs 668 for bf16 — 91 % of the 819 GB/s spec,
# 97 % of the 773 GB/s pure-read ceiling a gridded Pallas kernel gets).
# The per-call VMEM cap in stream_pallas shrinks either automatically at
# wide n (chunk <= 2^20 / n).
DEFAULT_CHUNK = 4096
GRAM_CHUNK = 8192


def _mode_parts(x: Array, mode: modes.ComputeMode):
    """Split a VMEM-resident f32 operand into MXU parts for ``mode``.

    Returns (parts, precision, order): x ≈ sum(parts); product terms whose
    combined residual order exceeds ``order`` are dropped (they fall below
    the mode's accuracy class — ≙ the reference dropping Δa·Δb unless
    THREE_TERMS_CORRECTION, tcqr32x16.cu:18, 727-737).
    """
    M = modes.ComputeMode
    if mode is M.FP32:
        return [x], lax.Precision.HIGHEST, 0
    if mode in (M.BF16, M.BF16_NOCOR):
        return [x.astype(jnp.bfloat16)], lax.Precision.DEFAULT, 0
    if mode is M.BF16X3_NOCOR:
        return [x], lax.Precision.HIGH, 0
    if mode is M.BF16X3_COR:
        x0 = x.astype(jnp.bfloat16)
        x1 = (x - x0.astype(jnp.float32)).astype(jnp.bfloat16)
        return [x0, x1], lax.Precision.DEFAULT, 1
    if mode is M.BF16X6_COR:
        x0 = x.astype(jnp.bfloat16)
        r = x - x0.astype(jnp.float32)
        x1 = r.astype(jnp.bfloat16)
        x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
        return [x0, x1, x2], lax.Precision.DEFAULT, 2
    raise ValueError(f"unsupported in-kernel mode {mode}")


def _dot_mode(x: Array, r: Array, mode: modes.ComputeMode) -> Array:
    """Split-corrected x @ r of VMEM-resident f32 operands.

    The split products of each residual ORDER are fused into one MXU
    call by stacking along the CONTRACTION axis:
    sum_i x_i @ r_{s-i} = [x_0 | ... | x_s] @ [r_s; ...; r_0] — the MXU
    accumulates the partial products internally in f32, so the (C, n)
    f32 VPU adds of a call-per-term formulation disappear entirely (at
    m=2^22, n=128 those adds plus the extra invocations cost ~30 % of
    each pass on v5e: measured 1.04 ms/pass vs the 0.70 ms flops bound).
    Every bucket's left operand is a PREFIX of one concatenated
    [x_0 | x_1 | ...] buffer, so the splits are copied once per chunk.
    Bucket sums are added smallest-order-first as before; within a
    bucket the MXU's internal f32 accumulation replaces explicit adds
    (same accuracy class, not bitwise-identical to the per-term form).
    """
    xp, prec, order = _mode_parts(x, mode)
    rp, _, _ = _mode_parts(r, mode)
    n = r.shape[-1]

    def mmp(u, v):
        return jnp.matmul(u, v, precision=prec,
                          preferred_element_type=jnp.float32)

    if len(xp) == 1 and len(rp) == 1:
        return mmp(xp[0], rp[0])

    xcat = jnp.concatenate(xp, axis=-1)            # (C, p*n)
    acc = None
    for s in range(order, -1, -1):  # smallest bucket first
        pairs = [(i, s - i) for i in range(len(xp))
                 if 0 <= s - i < len(rp)]
        if not pairs:
            continue
        k = pairs[-1][0]                           # prefix x_0..x_k
        rstack = (rp[pairs[0][1]] if len(pairs) == 1
                  else jnp.concatenate([rp[j] for _, j in pairs], axis=0))
        t = mmp(xcat[..., :(k + 1) * n], rstack)
        acc = t if acc is None else acc + t
    return acc


def _gram_half(x: Array, mode: modes.ComputeMode) -> Array:
    """Half-Gram P of one VMEM chunk: X^T X = P + P^T (contract dim 0).

    Like :func:`_dot_mode`, the cross-part products are batched into one
    MXU call per left part (x_i^T [x_i | ... | x_{order-i}]) with the
    output slices combined on the VPU in the same smallest-first order —
    bitwise-identical results, fewer/wider MXU invocations (2 instead of
    4 for bf16x6_cor)."""
    xp, prec, order = _mode_parts(x, mode)
    n = x.shape[-1]

    def dg(u, v):
        return lax.dot_general(u, v, (((0,), (0,)), ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)

    # ys[i] = x_i^T [x_i | ... | x_{ki}] (only j >= i needed: j < i pairs
    # are covered by symmetry, i == j carries the 0.5 factor)
    ys = {}
    for i in range(len(xp)):
        ki = min(order - i, len(xp) - 1)
        if ki < i:
            continue
        xcat = (xp[i] if ki == i
                else jnp.concatenate(xp[i:ki + 1], axis=-1))
        ys[i] = dg(xp[i], xcat)
    acc = None
    for s in range(order, -1, -1):  # smallest terms first
        for i in range(len(xp)):
            j = s - i
            if i <= j < len(xp) and i in ys:
                t = ys[i][..., (j - i) * n:(j - i + 1) * n]
                if i == j:
                    t = 0.5 * t
                acc = t if acc is None else acc + t
    return acc


def _pad_chunks(a: Array, chunk: int) -> Array:
    m = a.shape[0]
    m_pad = -(-m // chunk) * chunk
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))
    return a


def _resolve_mode(mode) -> modes.ComputeMode:
    return modes.resolve(mode).mode


def effective_chunk(m: int, n: int, chunk: int = DEFAULT_CHUNK) -> int:
    """Rows per grid step after the VMEM / small-m clamps (the chunk
    ``stream_pallas`` actually uses — callers needing the accumulation
    granularity, e.g. the fused-shift error budget, ask here)."""
    return min(chunk, max(512, ((1 << 20) // n) & ~7),
               -(-m // 512) * 512)


@functools.partial(jax.jit, static_argnames=(
    "dot_modes", "write_q", "gram_mode", "chunk", "interpret", "out_dtype",
    "residual", "alias_q"))
def stream_pallas(a: Array,
                  rinvs: tuple[Array, ...] = (),
                  dot_modes: tuple[str, ...] = (),
                  write_q: bool = False,
                  gram_mode: str | None = None,
                  chunk: int = DEFAULT_CHUNK,
                  interpret: bool = False,
                  out_dtype=None,
                  residual: tuple[bool, ...] = (),
                  alias_q: bool = False):
    """One streaming pass over A: chained dots + optional fused half-Gram.

    Per (chunk, n) VMEM block: x = A_chunk; then x = x @ rinvs[i] at
    dot_modes[i] precision for each i; optionally writes x to the Q output
    and/or accumulates the Kahan-compensated half-Gram P of x at
    ``gram_mode`` precision (caller forms G = P + P^T).

    residual[i]=True makes step i compute x += x @ rinvs[i] instead (pass
    Delta = Rinv - I): when Rinv is near the identity — every CholeskyQR
    iteration after the first — the x @ Delta term is ~||Delta|| small, so
    a cheap 3-pass corrected product suffices where the plain form needs
    6 (the f32 add re-attaches the identity part exactly).

    Returns [q] if write_q, + [p_half] if gram_mode — as a tuple in that
    order (single element unpacked).

    alias_q=True writes Q into A's buffer (``input_output_aliases``): each
    grid step reads its (chunk, n) block before overwriting it, so the
    result is unchanged, but peak HBM drops from A+Q to A alone — the
    enabler for capacity shapes like M=2^24 x N=128 f32 on a 16 GB chip.
    Requires write_q and out_dtype == a.dtype; pair with a donated input
    (``fastqr_inplace``) so XLA reuses the caller's buffer end-to-end.
    """
    assert len(rinvs) == len(dot_modes)
    assert write_q or gram_mode is not None
    if alias_q:
        assert write_q, "alias_q requires write_q"
        assert jnp.dtype(out_dtype if out_dtype is not None
                         else a.dtype) == a.dtype, (
            "alias_q requires out_dtype == a.dtype")
    if not residual:
        residual = (False,) * len(rinvs)
    assert len(residual) == len(rinvs)
    m, n = a.shape
    # keep the scoped-VMEM footprint (chunk block + splits + (n, n)
    # accumulators) under the limit at wide n (n=2048 with chunk=1024
    # measured 102.9M vs the 100M budget), and don't pad small m up to a
    # full default chunk (lane-padding waste bounded at ~512 rows).
    # The VMEM clamp is floored to a sublane multiple (8) so interior
    # blocks stay (8, 128)-tile aligned for non-power-of-two n.
    chunk = effective_chunk(m, n, chunk)
    a = _pad_chunks(a, chunk)
    m_pad = a.shape[0]
    dot_ms = tuple(_resolve_mode(d) for d in dot_modes)
    gram_m = _resolve_mode(gram_mode) if gram_mode is not None else None
    out_dtype = jnp.dtype(out_dtype if out_dtype is not None else a.dtype)
    n_r = len(rinvs)
    rinvs = tuple(r.astype(jnp.float32) for r in rinvs)

    def kernel(*refs):
        a_ref = refs[0]
        r_refs = refs[1:1 + n_r]
        pos = 1 + n_r
        q_ref = refs[pos] if write_q else None
        pos += int(write_q)
        g_ref = refs[pos] if gram_m is not None else None
        comp_ref = refs[-1] if gram_m is not None else None  # scratch

        # NOTE: the f32 upcast is LOAD-BEARING even for bf16 IO + bf16
        # mode: Mosaic rejects a NATIVE-bf16 lhs in the dim-0-contraction
        # Gram ("Bad lhs type" on tpu.matmul, measured on v5e) — a bf16
        # value RE-CAST from f32 compiles fine.  Do not "optimize" the
        # round-trip away without a compiled test of the bf16-input Gram.
        x = a_ref[:, :].astype(jnp.float32)
        for r_ref, md, res in zip(r_refs, dot_ms, residual):
            y = _dot_mode(x, r_ref[:, :].astype(jnp.float32), md)
            x = x + y if res else y
        if write_q:
            q_ref[:, :] = x.astype(q_ref.dtype)
        if gram_m is not None:
            # Kahan-compensated accumulation across chunks: a naive f32
            # sum over m/chunk contributions caps orthogonality at ~1e-4
            # for m = 2^22 (measured); compensation restores ~chunk-local
            # error.
            @pl.when(pl.program_id(0) == 0)
            def _():
                g_ref[:, :] = jnp.zeros((n, n), jnp.float32)
                comp_ref[:, :] = jnp.zeros((n, n), jnp.float32)
            contrib = _gram_half(x, gram_m)
            y = contrib - comp_ref[:, :]
            t = g_ref[:, :] + y
            comp_ref[:, :] = (t - g_ref[:, :]) - y
            g_ref[:, :] = t

    nn_spec = pl.BlockSpec((n, n), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((chunk, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [nn_spec] * n_r
    out_specs, out_shapes = [], []
    if write_q:
        out_specs.append(pl.BlockSpec((chunk, n), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((m_pad, n), out_dtype))
    if gram_m is not None:
        out_specs.append(nn_spec)
        out_shapes.append(jax.ShapeDtypeStruct((n, n), jnp.float32))

    # MXU passes per chunk, for the cost model
    n_pass = sum({modes.ComputeMode.BF16X6_COR: 6,
                  modes.ComputeMode.BF16X3_COR: 3}.get(md, 1)
                 for md in dot_ms)
    if gram_m is not None:
        n_pass += {modes.ComputeMode.BF16X6_COR: 4,
                   modes.ComputeMode.BF16X3_COR: 2}.get(gram_m, 1)

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // chunk,),
        input_output_aliases={0: 0} if alias_q else {},
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=(tuple(out_shapes) if len(out_shapes) > 1
                   else out_shapes[0]),
        scratch_shapes=([pltpu.VMEM((n, n), jnp.float32)]
                        if gram_m is not None else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pass * m_pad * n * n,
            bytes_accessed=(a.dtype.itemsize * m_pad * n
                            + out_dtype.itemsize * m_pad * n * int(write_q)
                            + 4 * n * n),
            transcendentals=0),
    )(a, *rinvs)
    outs = list(out) if isinstance(out, (tuple, list)) else [out]
    if write_q:
        outs[0] = outs[0][:m]
    return tuple(outs) if len(outs) > 1 else outs[0]


@functools.partial(jax.jit, static_argnames=("mode", "chunk", "interpret"))
def gram_pallas(a: Array, mode: str = "fp32", chunk: int = GRAM_CHUNK,
                interpret: bool = False) -> Array:
    """G = A^T A with in-VMEM splitting: exactly one HBM read of A."""
    p = stream_pallas(a, gram_mode=modes.resolve(mode).mode.value,
                      chunk=chunk, interpret=interpret)
    return p + p.T


@functools.partial(jax.jit, static_argnames=("mode", "chunk", "interpret",
                                             "with_gram"))
def qpass_pallas(a: Array, rinv: Array, mode: str = "fp32",
                 chunk: int = DEFAULT_CHUNK, interpret: bool = False,
                 with_gram: bool = True):
    """Q = A @ Rinv streamed chunk-wise; optionally also G = Q^T Q fused.

    Returns Q, or (Q, G) when with_gram — the fusion that makes
    CholeskyQR2's second Gram free.
    """
    mname = modes.resolve(mode).mode.value
    if with_gram:
        q, p = stream_pallas(a, (rinv,), (mname,), write_q=True,
                             gram_mode=mname, chunk=chunk,
                             interpret=interpret, out_dtype=jnp.float32)
        return q, p + p.T
    return stream_pallas(a, (rinv,), (mname,), write_q=True,
                         chunk=chunk, interpret=interpret,
                         out_dtype=jnp.float32)
