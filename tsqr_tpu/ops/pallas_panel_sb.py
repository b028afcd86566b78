"""Sublane-batched multi-tile Pallas panel QR: T tiles per program, tile
index in the SUBLANE dimension.

Third take on the reference's batched panel kernel (qr32x16_batched_kernel,
tcqr32x16.cu:1471-1532; 4 tiles per thread block).  Why this layout wins
where the superseded lane-packed take (docs/attic/pallas_panel_mt.py, kept
out of the production surface) stalled:

* pallas_panel.py (single tile/program): correct, but Mosaic runs grid
  programs sequentially on the one TensorCore, so 2048 leaf programs x
  128 serial Householder steps x ~1 us of per-step latency dominate
  (~240 ms at 2^20 x 128).
* pallas_panel_mt (attic) packed T tiles side-by-side in the LANE dimension;
  per-tile reductions then needed either segment-matrix MXU products
  (serial-critical-path HIGHEST GEMMs — measured slower) or value-level
  reshapes that Mosaic's layout inference rejects.
* Here the panel state is (n, T, L) with T = 8 tiles filling the sublane
  dimension exactly: a per-tile reduction is a plain minor-axis reduce of
  a (T, L) slice, a per-tile scalar broadcast is a (T, 1) -> (T, L)
  broadcast — native vector ops, no reshapes, no segment products.  The
  trailing-update / Q-build GEMMs run per tile on 2D ref slices
  (at_s[rows, t, :] — static-index loads carry their own layout, dodging
  the value-reshape limits entirely).

Reflector bookkeeping uses the forward-accumulated block-W form
(Bischof-Van Loan Q = I + W Y^T): w_k = -beta_k (v_k + W_{<k} (Y_{<k}^T
v_k)), whose recurrence is elementwise in (T, L) space; the SAME (W, Y)
pair serves the trailing elimination (A += Y (W^T A)) and the thin-Q
build (Q = (I + W Y^T) I_thin), so nothing is rebuilt... except the
per-block W during the reverse-order Q build, which re-runs the cheap
recurrence from the stored Y (the scratch is reused across blocks).

Cites: reference intra-block batching tcqr32x16.cu:50-51, 1483-1486;
transposed panel residency ≙ shared-memory tile tcqr32x16.cu:1487-1497;
transposed Q store ≙ s2g32x32_16x32_t_2w tcqr32x16.cu:1522-1526.
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

DEFAULT_TILES = 8  # fills the (8, 128) sublane tile exactly


def _make_sb_kernel(n: int, L: int, T: int, block: int, mm: Callable):
    f32 = jnp.float32
    nblocks = -(-n // block)

    def kernel(a_ref, qt_ref, r_ref, at_s, yt_s, wq_s, qacc_s):
        lane = lax.broadcasted_iota(jnp.int32, (T, L), 1)  # row index in A

        # pack: at_s[:, t, :] = a_ref[t].T  (panel transposed per tile)
        for t in range(T):
            at_s[:, t, :] = a_ref[t].T.astype(f32)

        def wq_recurrence(k, c0, v, beta):
            """w_k = -beta (v + sum_{i<k} wq_i * (y_i . v)) — one 3D
            broadcast-multiply + minor reduce + leading reduce (Mosaic
            lowers all three natively; probed on v5e)."""
            if k == 0:
                return -beta * v
            yv = jnp.sum(yt_s[c0:c0 + k, :, :] * v[None], axis=2,
                         keepdims=True)                       # (k, T, 1)
            u = jnp.sum(wq_s[0:k, :, :] * yv, axis=0)         # (T, L)
            return -beta * (v + u)

        for bi in range(nblocks):
            c0 = bi * block
            nb = min(block, n - c0)
            # ---- column loop: one serial chain drives all T tiles ----
            for k in range(nb):
                j = c0 + k
                x = jnp.where(lane >= j, at_s[j, :, :], 0.0)   # (T, L)
                norm2 = jnp.sum(x * x, axis=1, keepdims=True)  # (T, 1)
                norm = jnp.sqrt(norm2)
                xj = jnp.sum(jnp.where(lane == j, x, 0.0), axis=1,
                             keepdims=True)                    # (T, 1)
                sign = jnp.where(xj >= 0.0, f32(1.0), f32(-1.0))
                v = x + jnp.where(lane == j, sign * norm, 0.0)
                vnorm2 = norm2 + 2.0 * sign * norm * xj + norm2
                beta = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
                # rank-1 update of this block's remaining rows (rows of
                # at = columns of A) as one 3D broadcast/reduce pair
                blk = at_s[j:c0 + nb, :, :]                    # (nbk, T, L)
                w = jnp.sum(blk * v[None], axis=2,
                            keepdims=True)                     # (nbk, T, 1)
                at_s[j:c0 + nb, :, :] = blk - (w * beta[None]) * v[None]
                wq_s[k, :, :] = wq_recurrence(k, c0, v, beta)
                yt_s[j, :, :] = v
            # ---- trailing update per tile: at_rest += (at_rest wq^T) y ----
            if c0 + nb < n:
                for t in range(T):
                    rest = at_s[c0 + nb:n, t, :]               # (nr, L)
                    yb = yt_s[c0:c0 + nb, t, :]                # (nb, L)
                    wq = wq_s[0:nb, t, :]                      # (nb, L)
                    p = mm(rest, wq.T)                         # (nr, nb)
                    at_s[c0 + nb:n, t, :] = rest + mm(p, yb)

        # ---- R extraction: first n lanes (= first n rows of A) of each
        # tile's transposed panel, upper triangle ----
        ri = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        for t in range(T):
            r = at_s[:, t, :n].T
            r_ref[t] = jnp.where(ri <= ci, r, 0.0).astype(r_ref.dtype)

        # ---- thin-Q build (transposed): Q^T packed as qacc (n, T, L).
        # Q = (I + W_1 Y_1^T)...(I + W_last Y_last^T) I_thin, blocks
        # applied right-to-left; in Q^T layout per tile the block step
        # Q += W (Y^T Q) becomes cpart += (cpart yb^T) wq. ----
        qi = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
        qacc_s[:, :, :] = jnp.where(
            jnp.broadcast_to(qi, (n, T, L))
            == jnp.broadcast_to(lane[None], (n, T, L)), f32(1.0), f32(0.0))
        for bi in reversed(range(nblocks)):
            c0 = bi * block
            nb = min(block, n - c0)
            # rebuild this block's W from stored Y (beta = 2/||v||^2)
            for k in range(nb):
                v = yt_s[c0 + k, :, :]
                vnorm2 = jnp.sum(v * v, axis=1, keepdims=True)
                beta = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
                wq_s[k, :, :] = wq_recurrence(k, c0, v, beta)
            for t in range(T):
                cpart = qacc_s[:, t, :]                        # (n, L)
                yb = yt_s[c0:c0 + nb, t, :]
                wq = wq_s[0:nb, t, :]
                p = mm(cpart, yb.T)                            # (n, nb)
                qacc_s[:, t, :] = cpart + mm(p, wq)
        for t in range(T):
            qt_ref[t] = qacc_s[:, t, :].astype(qt_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "block", "tiles",
                                             "interpret"))
def panel_qr_pallas_sb(a: Array,
                       mode: str = "fp32",
                       block: int = 16,
                       tiles: int = DEFAULT_TILES,
                       interpret: bool = False) -> tuple[Array, Array]:
    """Sublane-batched panel QR: (B, L, n) -> (Qt (B, n, L), R (B, n, n)).

    Q is returned transposed per tile like panel_qr_pallas.  B must be a
    multiple of ``tiles`` (pad the batch upstream).
    """
    from tsqr_tpu.ops.pallas_panel import _kernel_mm

    policy = modes.resolve(mode)
    b, L, n = a.shape
    T = tiles
    assert b % T == 0, f"batch {b} must divide by tiles {T}"
    assert L >= n
    block = min(block, n)
    mm = _kernel_mm(policy, interpret)
    kernel = _make_sb_kernel(n, L, T, block, mm)
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
        scratch_shapes=[pltpu.VMEM((n, T, L), jnp.float32),
                        pltpu.VMEM((n, T, L), jnp.float32),
                        pltpu.VMEM((block, T, L), jnp.float32),
                        pltpu.VMEM((n, T, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * T * L * n * n),
            bytes_accessed=4 * T * (2 * L * n + n * n),
            transcendentals=n),
    )(a.astype(jnp.float32))
    return qt, r
