"""Pallas TPU kernel: batched fused Householder panel QR.

The TPU rebuild of the reference panel kernel ``qr32x16_batched_kernel``
(tcqr32x16.cu:1471-1532) + ``qr32x16_core`` (tcqr32x16.cu:1373-1469):

* One Pallas program per leaf tile (the Pallas grid plays the role of the
  reference's 4-tiles-per-threadblock batching).
* The (L, n) panel lives **transposed** in VMEM as (n, L): the Householder
  column loop then indexes the *sublane* dimension with static indices
  (the loop over the panel's n columns is Python-unrolled — n is static),
  which Mosaic compiles to cheap row selects, instead of dynamic
  lane-dimension gathers.
* Reflectors are accumulated in compact-WY form (Y^T, T) per column block;
  the trailing-panel update and the thin-Q build are three MXU GEMMs per
  block — the TPU-idiomatic replacement for the reference's dense
  H = I - 2uu^T per-reflector WMMA products (make_h/update_qr,
  tcqr32x16.cu:117-991).
* Q is written back **transposed** (n, L), exactly like the reference's
  transposed Q store ``s2g32x32_16x32_t_2w`` (tcqr32x16.cu:1522-1526,
  matrix_copy.cuh:139-162); the TSQR backward contraction consumes it
  directly as a transposed-LHS MXU matmul, so no relayout is ever paid.
* Norms are accumulated in fp32 (≙ get_norm2_32, tcqr32x16.cu:71-95; the
  NORM2_IN_DP fp64 option is unnecessary on TPU — fp32 accumulation over
  <= 4096-row leaves is exact enough, and TPUs have no fast fp64).

Precision modes enter through ``mm``: every GEMM inside the kernel is routed
through the policy matmul, so bf16 / split-corrected variants reuse one
kernel body (the reference instead carries six hand-written WMMA
specializations per mode, tcqr32x16.cu:139-459).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsqr_tpu import modes

Array = jax.Array


def _make_kernel(n: int, L: int, block: int, mm: Callable):
    """Kernel factory.  The panel state lives in VMEM scratch refs (Mosaic
    has no value-level dynamic_update_slice; static ref slices are the
    supported mutation path — the analogue of the reference's shared-memory
    tile, tcqr32x16.cu:1483-1497).

    Scratch:
      at_s (n, L): the transposed panel, updated in place.
      yt_s (n, L): reflector vectors (Y^T), one per row.
      t_s (nblocks*block, block): stacked compact-WY T blocks.
    """
    f32 = jnp.float32
    nblocks = -(-n // block)

    def kernel(a_ref, qt_ref, r_ref, at_s, yt_s, t_s):
        lane_ids = lax.broadcasted_iota(jnp.int32, (1, L), 1)
        at_s[:, :] = a_ref[0].T.astype(f32)
        yt_s[:, :] = jnp.zeros((n, L), f32)
        t_s[:, :] = jnp.zeros((nblocks * block, block), f32)

        for bi in range(nblocks):
            c0 = bi * block
            nb = min(block, n - c0)
            r0 = bi * block  # row offset of this T block inside t_s
            # ---- column loop: nb reflectors, statically unrolled ----
            for k in range(nb):
                j = c0 + k
                x = jnp.where(lane_ids >= j, at_s[j:j + 1, :], 0.0)  # (1, L)
                norm2 = jnp.sum(x * x)
                norm = jnp.sqrt(norm2)
                xj = x[0, j]
                sign = jnp.where(xj >= 0.0, f32(1.0), f32(-1.0))
                v = x + jnp.where(lane_ids == j, sign * norm, 0.0)
                vnorm2 = norm2 + 2.0 * sign * norm * xj + norm2
                beta = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
                # rank-1 update of the block's remaining rows:
                # A[:, j:c0+nb] -= beta v (v^T A)   (at-layout)
                blk = at_s[j:c0 + nb, :]                        # (nb-k, L)
                w = mm(blk, v.T)                                # (nb-k, 1)
                at_s[j:c0 + nb, :] = blk - (beta * w) * v
                # compact-WY recurrence:
                # T = [[T, -beta T (Y^T v)], [0, beta]]
                if k > 0:
                    yv = mm(yt_s[c0:j, :], v.T)                 # (k, 1)
                    tcol = -beta * mm(t_s[r0:r0 + k, :k], yv)   # (k, 1)
                    t_s[r0:r0 + k, k:k + 1] = tcol
                t_s[r0 + k:r0 + k + 1, k:k + 1] = jnp.reshape(beta, (1, 1))
                yt_s[j:j + 1, :] = v
            # ---- trailing update: A_rest -= Y T^T (Y^T A_rest) ----
            if c0 + nb < n:
                rest = at_s[c0 + nb:, :]                        # (nr, L)
                yb = yt_s[c0:c0 + nb, :]                        # (nb, L)
                p = mm(rest, yb.T)                              # (nr, nb)
                p = mm(p, t_s[r0:r0 + nb, :nb])                 # (nr, nb)
                at_s[c0 + nb:, :] = rest - mm(p, yb)

        # ---- R extraction: upper triangle of the first n lanes ----
        r = at_s[:, :n].T
        row_ids = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        r_ref[0] = jnp.where(row_ids <= col_ids, r, 0.0).astype(r_ref.dtype)

        # ---- thin-Q build (transposed), blocks in reverse:
        # Q -= Y T (Y^T Q)  =>  Qt -= ((Qt Y) T^T) Y^T   (at-layout) ----
        qt = jnp.where(
            lax.broadcasted_iota(jnp.int32, (n, L), 0)
            == lax.broadcasted_iota(jnp.int32, (n, L), 1), f32(1.0), f32(0.0))
        for bi in reversed(range(nblocks)):
            c0 = bi * block
            nb = min(block, n - c0)
            r0 = bi * block
            yb = yt_s[c0:c0 + nb, :]                            # (nb, L)
            p = mm(qt, yb.T)                                    # (n, nb)
            p = mm(p, t_s[r0:r0 + nb, :nb].T)                   # (n, nb)
            qt = qt - mm(p, yb)
        qt_ref[0] = qt.astype(qt_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "block", "interpret"))
def panel_qr_pallas(a: Array,
                    mode: str = "fp32",
                    block: int = 16,
                    interpret: bool = False) -> tuple[Array, Array]:
    """Batched panel QR: (B, L, n) -> (Qt (B, n, L), R (B, n, n)).

    NOTE: returns Q **transposed** per tile (reference stores Q^T too,
    tcqr32x16.cu:1522-1526).  Use ``qt.transpose(0, 2, 1)`` or feed the
    transposed form straight into the TSQR backward contraction.
    """
    policy = modes.resolve(mode)
    b, L, n = a.shape
    assert L >= n
    block = min(block, n)
    mm = _kernel_mm(policy, interpret)
    kernel = _make_kernel(n, L, block, mm)
    nblocks = -(-n // block)
    out_dtype = jnp.float32
    qt, r = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, L, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, n, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, n, L), out_dtype),
                   jax.ShapeDtypeStruct((b, n, n), out_dtype)),
        scratch_shapes=[pltpu.VMEM((n, L), jnp.float32),
                        pltpu.VMEM((n, L), jnp.float32),
                        pltpu.VMEM((nblocks * block, block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # tree-node tiles (fanin*n rows) exceed the default 16 MB scoped
            # window; v5e has 128 MB VMEM per core
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * L * n * n * 2), bytes_accessed=4 * (2 * L * n + n * n),
            transcendentals=n),
    )(a.astype(jnp.float32))
    return qt, r


def _kernel_mm(policy: modes.Policy, interpret: bool) -> Callable:
    """In-kernel matmul for a policy.

    Mosaic does not lower ``lax.optimization_barrier`` — and does not need
    it: unlike XLA's algebraic simplifier it never folds the split
    correction (no convert-pair elision, no dot reassociation), so compiled
    kernels use barrier-free splits.  Interpret mode, however, executes the
    kernel jaxpr through XLA CPU where the folding hazard is real, so it
    keeps the barriered policy matmuls from modes.py.
    """
    if interpret:
        return policy.mm

    def dot(x, y, prec):
        return jnp.matmul(x, y, precision=prec,
                          preferred_element_type=jnp.float32)

    def split2(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def split3(x):
        t0 = x.astype(jnp.bfloat16)
        r = x - t0.astype(jnp.float32)
        t1 = r.astype(jnp.bfloat16)
        t2 = (r - t1.astype(jnp.float32)).astype(jnp.bfloat16)
        return t0, t1, t2

    mode = policy.mode
    if mode is modes.ComputeMode.BF16X3_COR:
        def mm3(x, y):
            xh, xl = split2(x)
            yh, yl = split2(y)
            P = lax.Precision.DEFAULT
            return dot(xh, yh, P) + (dot(xh, yl, P) + dot(xl, yh, P))
        return mm3
    if mode is modes.ComputeMode.BF16X6_COR:
        def mm6(x, y):
            x0, x1, x2 = split3(x)
            y0, y1, y2 = split3(y)
            P = lax.Precision.DEFAULT
            p = dot(x0, y2, P) + dot(x1, y1, P) + dot(x2, y0, P)
            p = p + (dot(x0, y1, P) + dot(x1, y0, P))
            return p + dot(x0, y0, P)
        return mm6
    return policy.mm
