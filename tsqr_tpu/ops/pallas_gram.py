"""Pallas streaming kernels for CholeskyQR: fused Gram and Q-pass.

Why these exist (HBM-bandwidth math for m=2^20, n=128 fp32):

* A naive corrected Gram ``modes.gram(a, policy)`` materializes the bf16
  split components of A in HBM (2-3 copies, ~1.5 GB written + read back)
  before the MXU products.  The streaming kernel splits each (C, n) chunk
  *in VMEM* and accumulates the split products into an (n, n) f32
  accumulator that never leaves VMEM: exactly one read of A.
* CholeskyQR2's second iteration re-reads Q1 to form its Gram.  The fused
  Q-pass computes Q1 = A R^{-1} chunk-wise and accumulates G2 = Q1^T Q1
  on the fly: one read of A, one write of Q1, no second pass.

Net effect: corrected CholeskyQR2 touches HBM 5x(m*n*4) bytes total
(read A twice, write Q1/Q2, read Q1) — the roofline for any two-iteration
Gram method.

This is the TPU re-expression of the reference's "keep the panel resident
and drive products through the matrix unit" kernel strategy
(tcqr32x16.cu), applied to the Gram form instead of reflectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsqr_tpu import modes

Array = jax.Array

DEFAULT_CHUNK = 1024


def _gram_terms(x: Array, mode: modes.ComputeMode) -> Array:
    """Split-corrected X^T X of one VMEM-resident chunk (contract dim 0)."""

    def dg(u, v, prec=lax.Precision.DEFAULT):
        return lax.dot_general(u, v, (((0,), (0,)), ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)

    if mode is modes.ComputeMode.FP32:
        return dg(x, x, lax.Precision.HIGHEST)
    if mode in (modes.ComputeMode.BF16, modes.ComputeMode.BF16_NOCOR):
        xb = x.astype(jnp.bfloat16)
        return dg(xb, xb)
    if mode is modes.ComputeMode.BF16X3_NOCOR:
        return dg(x, x, lax.Precision.HIGH)
    if mode is modes.ComputeMode.BF16X3_COR:
        x0 = x.astype(jnp.bfloat16)
        x1 = (x - x0.astype(jnp.float32)).astype(jnp.bfloat16)
        g = dg(x0, x0)
        return g + (dg(x0, x1) + dg(x1, x0))
    if mode is modes.ComputeMode.BF16X6_COR:
        x0 = x.astype(jnp.bfloat16)
        r = x - x0.astype(jnp.float32)
        x1 = r.astype(jnp.bfloat16)
        x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
        g = dg(x0, x2) + dg(x1, x1) + dg(x2, x0)
        g = g + (dg(x0, x1) + dg(x1, x0))
        return g + dg(x0, x0)
    raise ValueError(f"unsupported in-kernel gram mode {mode}")


def _pad_chunks(a: Array, chunk: int) -> Array:
    m = a.shape[0]
    m_pad = -(-m // chunk) * chunk
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))
    return a


@functools.partial(jax.jit, static_argnames=("mode", "chunk", "interpret"))
def gram_pallas(a: Array, mode: str = "fp32", chunk: int = DEFAULT_CHUNK,
                interpret: bool = False) -> Array:
    """G = A^T A with in-VMEM splitting: exactly one HBM read of A."""
    policy = modes.resolve(mode)
    a = _pad_chunks(a.astype(jnp.float32), chunk)
    m_pad, n = a.shape

    def kernel(a_ref, g_ref, comp_ref):
        # Kahan-compensated accumulation across chunks: the naive f32 sum
        # over m/chunk contributions caps orthogonality at ~1e-4 for
        # m = 2^22 (measured); compensation restores ~chunk-local error.
        @pl.when(pl.program_id(0) == 0)
        def _():
            g_ref[:, :] = jnp.zeros((n, n), jnp.float32)
            comp_ref[:, :] = jnp.zeros((n, n), jnp.float32)
        contrib = _gram_terms(a_ref[:, :].astype(jnp.float32), policy.mode)
        y = contrib - comp_ref[:, :]
        t = g_ref[:, :] + y
        comp_ref[:, :] = (t - g_ref[:, :]) - y
        g_ref[:, :] = t

    return pl.pallas_call(
        kernel,
        grid=(m_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * n, bytes_accessed=4 * (m_pad * n + n * n),
            transcendentals=0),
    )(a)


@functools.partial(jax.jit, static_argnames=("mode", "chunk", "interpret",
                                             "with_gram"))
def qpass_pallas(a: Array, rinv: Array, mode: str = "fp32",
                 chunk: int = DEFAULT_CHUNK, interpret: bool = False,
                 with_gram: bool = True):
    """Q = A @ Rinv streamed chunk-wise; optionally also G = Q^T Q fused.

    Returns Q, or (Q, G) when with_gram — the fusion that makes
    CholeskyQR2's second Gram free.
    """
    policy = modes.resolve(mode)
    m = a.shape[0]
    a = _pad_chunks(a.astype(jnp.float32), chunk)
    m_pad, n = a.shape
    rinv = rinv.astype(jnp.float32)

    def dot_rinv(x, r):
        if policy.mode in (modes.ComputeMode.BF16,
                           modes.ComputeMode.BF16_NOCOR):
            return jnp.matmul(x.astype(jnp.bfloat16),
                              r.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        if policy.mode is modes.ComputeMode.BF16X3_COR:
            x0 = x.astype(jnp.bfloat16)
            x1 = (x - x0.astype(jnp.float32)).astype(jnp.bfloat16)
            r0 = r.astype(jnp.bfloat16)
            r1 = (r - r0.astype(jnp.float32)).astype(jnp.bfloat16)
            mmb = lambda u, v: jnp.matmul(u, v,
                                          preferred_element_type=jnp.float32)
            return mmb(x0, r0) + (mmb(x0, r1) + mmb(x1, r0))
        if policy.mode is modes.ComputeMode.BF16X6_COR:
            x0 = x.astype(jnp.bfloat16)
            xr = x - x0.astype(jnp.float32)
            x1 = xr.astype(jnp.bfloat16)
            x2 = (xr - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            r0 = r.astype(jnp.bfloat16)
            rr = r - r0.astype(jnp.float32)
            r1 = rr.astype(jnp.bfloat16)
            r2 = (rr - r1.astype(jnp.float32)).astype(jnp.bfloat16)
            mmb = lambda u, v: jnp.matmul(u, v,
                                          preferred_element_type=jnp.float32)
            g = mmb(x0, r2) + mmb(x1, r1) + mmb(x2, r0)
            g = g + (mmb(x0, r1) + mmb(x1, r0))
            return g + mmb(x0, r0)
        prec = (lax.Precision.HIGH
                if policy.mode is modes.ComputeMode.BF16X3_NOCOR
                else lax.Precision.HIGHEST)
        return jnp.matmul(x, r, precision=prec,
                          preferred_element_type=jnp.float32)

    if with_gram:
        def kernel(a_ref, rinv_ref, q_ref, g_ref, comp_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                g_ref[:, :] = jnp.zeros((n, n), jnp.float32)
                comp_ref[:, :] = jnp.zeros((n, n), jnp.float32)
            q = dot_rinv(a_ref[:, :].astype(jnp.float32), rinv_ref[:, :])
            q_ref[:, :] = q
            contrib = _gram_terms(q, policy.mode)
            y = contrib - comp_ref[:, :]
            t = g_ref[:, :] + y
            comp_ref[:, :] = (t - g_ref[:, :]) - y
            g_ref[:, :] = t

        q, g = pl.pallas_call(
            kernel,
            grid=(m_pad // chunk,),
            in_specs=[pl.BlockSpec((chunk, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((chunk, n), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((n, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
                       jax.ShapeDtypeStruct((n, n), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * m_pad * n * n,
                bytes_accessed=4 * (2 * m_pad * n + 2 * n * n),
                transcendentals=0),
        )(a, rinv)
        return q[:m], g

    def kernel(a_ref, rinv_ref, q_ref):
        q_ref[:, :] = dot_rinv(a_ref[:, :].astype(jnp.float32),
                               rinv_ref[:, :])

    q = pl.pallas_call(
        kernel,
        grid=(m_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * n,
            bytes_accessed=4 * 2 * m_pad * n, transcendentals=0),
    )(a, rinv)
    return q[:m]
