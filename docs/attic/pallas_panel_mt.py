"""Multi-tile Pallas panel QR: T tiles share one serial reflector chain.

Why: the single-tile kernel (pallas_panel.py) spends ~1 us per Householder
column step on latency (norm reduction -> scalar -> rank-1), and Mosaic
executes grid programs sequentially on the one TensorCore — 2048 leaves x
128 columns of serial latency dominate.  This kernel packs T tiles
side-by-side in the lane dimension (at_s is (n, T*L), tile t owns lanes
[t*L, (t+1)*L)), so every column-step op covers T tiles at once:

* per-tile reductions (norms, x_j, Y^T v) become one MXU product with a
  constant lane->tile segment matrix (T*L, T);
* per-tile scalar broadcasts become one product with its transpose;
* the compact-WY T matrix is replaced by a forward-accumulated
  W = -(v + W (Y^T v)) * beta representation (Bischof-Van Loan I + W Y^T),
  whose recurrence is elementwise in lane space — no batched small
  matmuls needed.  The SAME W serves elimination (R = A + Y (W^T A)) and
  the Q build (Q = I + W (Y^T I)).

Throughput-bound block GEMMs (trailing updates, Q build) run per tile with
static lane slices — T independent MXU dots pipeline fine.

This is the TPU analogue of the reference batching 4 tiles per thread
block (qr32x16_batched_kernel, tcqr32x16.cu:1483-1486): there it hides
memory latency across warps; here it hides the reflector chain's serial
latency across lanes.

STATUS — experimental, currently SLOWER than the single-tile kernel
(measured v5e, 2048 leaves of 512x128 fp32: 552 ms at T=4 vs 240 ms
single-tile vs 247 ms vmapped-XLA).  The segment-matrix products sit on
the serial critical path at HIGHEST precision (6 MXU passes each) and the
Q-build Wq rebuild doubles the chain length.

A v2 replacing the segment matmuls with lane-split reshapes
(x.reshape(T, L).sum(axis=1) / broadcast_to + reshape) plus a full-width
Wq stash was prototyped: it passes interpret-mode tests, and the reshape
primitives compile in ISOLATION, but inside the full kernel Mosaic's
layout inference rejects the same shape casts ("infer-vector-layout:
unsupported shape cast", vector<2048xf32> -> vector<4x512xf32>) when the
operand is a computed value rather than a direct ref load.  Next attempt
should either (a) stage the operands through a small VMEM scratch ref so
the reshape sees a ref-load layout, or (b) use an interleaved lane packing
(tile = lane % T) so pltpu.repeat provides the broadcast and a (L, T)
reshape the reduction.  Kept because the kernel is correct (interpret +
on-TPU tests) and the lane-packing machinery is the right skeleton.
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


def _make_mt_kernel(n: int, L: int, T: int, block: int, mm: Callable):
    f32 = jnp.float32
    TL = T * L
    nblocks = -(-n // block)

    def kernel(a_ref, qt_ref, r_ref, at_s, yt_s, wq_s, qacc_s):
        lane = lax.broadcasted_iota(jnp.int32, (1, TL), 1)
        lane_in_tile = lane % L
        tile_of_lane = lane // L
        # segment matrix: seg[lane, t] = 1 if lane belongs to tile t
        seg_rows = lax.broadcasted_iota(jnp.int32, (TL, T), 0) // L
        seg_cols = lax.broadcasted_iota(jnp.int32, (TL, T), 1)
        seg = jnp.where(seg_rows == seg_cols, f32(1.0), f32(0.0))  # (TL, T)

        def seg_reduce(x):    # (r, TL) -> (r, T): per-tile lane sums
            return jax.lax.dot_general(
                x, seg, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=f32)

        def seg_expand(x):    # (r, T) -> (r, TL): per-tile broadcast
            return jax.lax.dot_general(
                x, seg, (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=f32)

        # pack T tiles: at_s[:, t*L:(t+1)*L] = a_ref[t].T
        for t in range(T):
            at_s[:, t * L:(t + 1) * L] = a_ref[t].T.astype(f32)

        for bi in range(nblocks):
            c0 = bi * block
            nb = min(block, n - c0)
            # ---- column loop: shared serial chain across all T tiles ----
            for k in range(nb):
                j = c0 + k
                x = jnp.where(lane_in_tile >= j, at_s[j:j + 1, :], 0.0)
                xj_sel = jnp.where(lane_in_tile == j, x, 0.0)
                red = seg_reduce(jnp.concatenate([x * x, xj_sel], axis=0))
                norm2 = red[0:1, :]                            # (1, T)
                xj = red[1:2, :]                               # (1, T)
                norm = jnp.sqrt(norm2)
                sign = jnp.where(xj >= 0.0, f32(1.0), f32(-1.0))
                vnorm2 = norm2 + 2.0 * sign * norm * xj + norm2
                beta = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
                bcast = seg_expand(
                    jnp.concatenate([sign * norm, beta], axis=0))  # (2, TL)
                v = x + jnp.where(lane_in_tile == j, bcast[0:1, :], 0.0)
                beta_full = bcast[1:2, :]
                # rank-1 update of this block's remaining rows:
                blk = at_s[j:c0 + nb, :]                       # (nb-k, TL)
                w = seg_reduce(blk * v)                        # (nb-k, T)
                at_s[j:c0 + nb, :] = blk - (seg_expand(w) * beta_full) * v
                # forward-W recurrence: wq_k = -beta (v + Wq (Y^T v))
                if k > 0:
                    yv = seg_reduce(yt_s[c0:j, :] * v)         # (k, T)
                    u = jnp.sum(wq_s[0:k, :] * seg_expand(yv), axis=0,
                                keepdims=True)                 # (1, TL)
                else:
                    u = jnp.zeros((1, TL), f32)
                wq_s[k:k + 1, :] = -beta_full * (v + u)
                yt_s[j:j + 1, :] = v
            # ---- trailing update per tile: A_rest += Y (Wq^T A_rest) ----
            if c0 + nb < n:
                for t in range(T):
                    lo, hi = t * L, (t + 1) * L
                    rest = at_s[c0 + nb:, lo:hi]               # (nr, L)
                    yb = yt_s[c0:c0 + nb, lo:hi]               # (nb, L)
                    wq = wq_s[:nb, lo:hi]                      # (nb, L)
                    # at-layout: rest_new^T = rest^T + Y (Wq^T rest^T)
                    # -> rest += (rest wq^T) yb
                    p = mm(rest, wq.T)                         # (nr, nb)
                    at_s[c0 + nb:, lo:hi] = rest + mm(p, yb)
            # ---- fold Wq of this block into the Q accumulation ----
            # Q build needs per-block (Y, Wq); we materialize Q directly
            # per block in reverse below, so stash Wq per block in yt/wq?
            # Instead: apply this block's (I + Wq Y^T) to the running
            # thin-Q accumulator C^T stored in qt_ref (see below).

        # ---- R extraction ----
        # R lives in at_s rows 0..n, first tile's lanes? No: each tile has
        # its own R in its lane range, rows 0..n, lanes [t*L, t*L+n).
        for t in range(T):
            r = at_s[:, t * L:t * L + n].T
            ri = lax.broadcasted_iota(jnp.int32, (n, n), 0)
            ci = lax.broadcasted_iota(jnp.int32, (n, n), 1)
            r_ref[t] = jnp.where(ri <= ci, r, 0.0).astype(r_ref.dtype)

        # ---- thin-Q build ----
        # Q = (I + Wq_1 Y_1^T)(I + Wq_2 Y_2^T)...(I + Wq_nb Y_nb^T) I_thin
        # The per-block Wq scratch was overwritten; rebuild per block via
        # the stored Y (cheap: one pass of the same recurrence per block,
        # no at_s updates).  Blocks applied right-to-left onto C (n-wide).
        qacc_s[:, :] = jnp.where(
            jnp.equal(lax.broadcasted_iota(jnp.int32, (n, TL), 0),
                      lane_in_tile), f32(1.0), f32(0.0))      # I_thin^T packed
        for bi in reversed(range(nblocks)):
            c0 = bi * block
            nb = min(block, n - c0)
            # rebuild Wq for this block from Y (same recurrence; beta is
            # recoverable: beta = 2/||v||^2 and v = yt row)
            for k in range(nb):
                j = c0 + k
                v = yt_s[j:j + 1, :]
                vnorm2 = seg_reduce(v * v)                     # (1, T)
                beta = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
                beta_full = seg_expand(beta)
                if k > 0:
                    yv = seg_reduce(yt_s[c0:j, :] * v)
                    u = jnp.sum(wq_s[0:k, :] * seg_expand(yv), axis=0,
                                keepdims=True)
                else:
                    u = jnp.zeros((1, TL), f32)
                wq_s[k:k + 1, :] = -beta_full * (v + u)
            # apply: C^T += (C^T wq^T_t) y_t  per tile (at-layout transpose
            # of C += Wq (Y^T C))
            for t in range(T):
                lo, hi = t * L, (t + 1) * L
                cpart = qacc_s[:, lo:hi]                       # (n, L)
                yb = yt_s[c0:c0 + nb, lo:hi]
                wq = wq_s[:nb, lo:hi]
                p = mm(cpart, yb.T)                            # (n, nb)
                qacc_s[:, lo:hi] = cpart + mm(p, wq)
        for t in range(T):
            qt_ref[t] = qacc_s[:, t * L:(t + 1) * L].astype(qt_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "block", "tiles",
                                             "interpret"))
def panel_qr_pallas_mt(a: Array,
                       mode: str = "fp32",
                       block: int = 16,
                       tiles: int = 4,
                       interpret: bool = False) -> tuple[Array, Array]:
    """Batched panel QR, T tiles per program: (B, L, n) -> (Qt, R).

    Returns (Qt (B, n, L), R (B, n, n)) like panel_qr_pallas.
    B must be a multiple of ``tiles`` (pad the batch upstream).
    """
    policy = modes.resolve(mode)
    b, L, n = a.shape
    T = tiles
    assert b % T == 0, f"batch {b} must divide by tiles {T}"
    assert L >= n
    block = min(block, n)
    from tsqr_tpu.ops.pallas_panel import _kernel_mm
    mm = _kernel_mm(policy, interpret)
    kernel = _make_mt_kernel(n, L, T, block, mm)
    qt, r = pl.pallas_call(
        kernel,
        grid=(b // T,),
        in_specs=[pl.BlockSpec((T, L, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((T, n, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((T, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, n, L), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, n), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((n, T * L), jnp.float32),
                        pltpu.VMEM((n, T * L), jnp.float32),
                        pltpu.VMEM((block, T * L), jnp.float32),
                        pltpu.VMEM((n, T * L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * T * L * n * n),
            bytes_accessed=4 * T * (2 * L * n + n * n),
            transcendentals=n),
    )(a.astype(jnp.float32))
    return qt, r
