"""TSQR: communication-avoiding tall-skinny QR as one fused XLA program.

Re-expresses the reference TSQR driver (tsqr.cu:1064-1279) TPU-first:

* The reference round-trips to the host **per tree level** (kernel launches +
  ``cudaStreamSynchronize`` at tsqr.cu:1112-1260).  Here the whole tree —
  leaf batched QR, forward R-reduction, final QR, backward Q reconstruction —
  is Python-unrolled inside a single ``jax.jit``; XLA sees one static graph
  and schedules it without any host involvement.
* The reference uses 32-row leaves and a strictly binary tree
  (``get_batch_size_log2(m) = max(5, ceil(log2 m)) - 5``, tsqr.cu:39-44) with
  ragged leaf sizes carried in a device list (tsqr.cu:1088-1093).  TPU wants
  large MXU-aligned tiles, so leaves default to ~2048 rows (multiple of the
  8-sublane fp32 tile) with at most ``leaf_rows``-ish zero padding, and the
  tree fan-in is configurable (4 or 8 gives (fanin*n, n) node QRs — chunky
  MXU work and a shallower tree).
* The forward/backward node products are batched GEMMs routed through the
  :class:`~tsqr_tpu.modes.Policy` matmul (split-corrected for *_cor modes),
  i.e. the reference's per-mode WMMA specializations (tsqr.cu:143-1061)
  collapse into one code path parameterized by the matmul policy.

Zero-padding correctness: QR([A; 0]) = ([Q; 0], R) holds exactly for the
masked Householder used here — padded rows never enter a reflector, so the
R factors and the reconstructed Q rows for real data are unaffected, and
padded Q rows come out exactly 0.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import diff
from tsqr_tpu.ops import householder

Array = jax.Array

# defaults tuned on v5e (m=2^20, n=128 sweep: leaf 2048/block 24 runs the
# fp32 tree in 85 ms vs 247 ms with 512/8 — see docs/ROUND1.md)
DEFAULT_LEAF_ROWS = 2048
DEFAULT_FANIN = 8
DEFAULT_BLOCK = 24

# Above this many leaf elements (m_pad * n), the leaf QR and the layer-0
# backward product run as a sequential lax.map over leaf chunks of
# ~LEAF_CHUNK_ELEMS instead of one whole-batch vmap.  The blocked
# Householder leaf holds ~9 live panel-sized f32 temps (r, y_all, q, WY
# products, corrected-mode bf16 splits); at m=2^22 x 128 that is ~18 GB —
# past the v5e's 15.75 GB HBM (measured compile-time OOM) — while the
# chunked form bounds the live temps at ~9 * LEAF_CHUNK_ELEMS * 4 B
# (~2.3 GB) for the same math.  Below the threshold nothing changes (the
# whole-batch form compiles smaller and schedules freer).
LEAF_SEQ_THRESHOLD = 1 << 28
LEAF_CHUNK_ELEMS = 1 << 26


def _leaf_chunks(bs: int, elems_per_leaf: int) -> int:
    """Number of sequential leaf chunks (1 = whole-batch vmap)."""
    if bs * elems_per_leaf <= LEAF_SEQ_THRESHOLD:
        return 1
    target = max(1, LEAF_CHUNK_ELEMS // elems_per_leaf)  # leaves per chunk
    s = 1
    while s < bs and bs // s > target:
        s *= 2
    return s


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_tree(m: int, n: int, leaf_rows: int = DEFAULT_LEAF_ROWS,
              fanin: int = DEFAULT_FANIN) -> tuple[int, int, int]:
    """Choose (batch_size, leaf_rows, m_padded) for an (m, n) panel.

    ≙ get_batch_size_log2 / sub-m list construction (tsqr.cu:39-44,
    1088-1093), but with equal MXU-aligned leaves + zero padding instead of
    ragged leaves, and fan-in a power of two (2/4/8).
    """
    assert fanin & (fanin - 1) == 0 and fanin >= 2
    leaf_rows = max(leaf_rows, _round_up(2 * n, 8))
    if m <= leaf_rows:
        mp = _round_up(m, 8)
        return 1, mp, mp
    n_leaves = -(-m // leaf_rows)
    bs = fanin
    while bs < n_leaves:
        bs *= fanin
    # equal leaves, 8-row aligned; padding overhead <= 8*bs rows (< 2 %)
    L = max(_round_up(-(-m // bs), 8), _round_up(n, 8))
    return bs, L, bs * L


def _pad_rows(a: Array, m_pad: int) -> Array:
    m = a.shape[0]
    if m_pad == m:
        return a
    return jnp.pad(a, ((0, m_pad - m), (0, 0)))


def _batched_qr(a: Array, mm: Callable, block: int) -> tuple[Array, Array]:
    """QR of a (B, rows, n) batch via vmapped blocked Householder."""
    fn = functools.partial(householder.blocked_householder_qr, mm=mm,
                           block=block)
    return jax.vmap(fn)(a)


def _make_batched_qr(policy: modes.Policy, impl: str, block: int,
                     sb_tiles: int | None = None) -> Callable:
    """Batched-QR factory: (B, rows, n) -> (Q (B,rows,n), R (B,n,n))."""
    if impl == "jnp":
        return lambda x: _batched_qr(x, policy.mm, block)
    if impl in ("pallas", "pallas_interpret"):
        from tsqr_tpu.ops import pallas_panel  # local: keep CPU import light

        def call(x):
            qt, r = pallas_panel.panel_qr_pallas(
                x, mode=policy.mode.value, block=block,
                interpret=(impl == "pallas_interpret"))
            # transposed-Q output feeds the backward dot_general for free
            return qt.transpose(0, 2, 1), r
        return call
    if impl in ("pallas_sb", "pallas_sb_interpret"):
        # sublane-batched multi-tile kernel: T tiles share one serial
        # reflector chain (7x faster than the single-tile kernel at
        # 2^20 x 128, measured v5e).  Small/ragged batches (the top tree
        # levels) fall back to the vmapped XLA path — they are tiny.
        from tsqr_tpu.ops import pallas_panel_sb

        def call(x):
            B, L = x.shape[0], x.shape[1]
            T = sb_tiles if sb_tiles else _pick_sb_tiles(B, L)
            if T is None or B % T != 0:
                return _batched_qr(x, policy.mm, block)
            qt, r = pallas_panel_sb.panel_qr_pallas_sb(
                x, mode=policy.mode.value, block=block, tiles=T,
                interpret=(impl == "pallas_sb_interpret"))
            return qt.transpose(0, 2, 1), r
        return call
    raise ValueError(f"unknown impl {impl!r}")


# Largest (tiles * leaf_rows) with an on-chip compile record for the sb
# kernel.  The kernel's column chain is fully Python-unrolled (~n serial
# steps over (T, L)-shaped values), so Mosaic's compile memory scales
# with T*L/1024 vregs per live value times the unrolled op count: T=16,
# L=512 (8 vregs/value) compiles green on the tunnel's remote-compile
# helper (tests/test_tpu_compiled.py::test_whole_tree_sb_leaves_compiled
# at m=2^18) while T=16, L=2048 (32 vregs/value) gets the helper
# SIGKILLed (data/extras.csv error rows, rounds 2-4).
SB_TL_BUDGET = 8192


def _pick_sb_tiles(B: int, L: int) -> int | None:
    """Tile count for the sb panel kernel, or None for the XLA fallback.

    16 tiles/chain beats 8 when the batch allows it (23.5 vs 24.7 ms at
    2^20 x 128, measured v5e), but only within the compile budget: T*L
    <= SB_TL_BUDGET, above which the remote-compile helper has died on
    every attempt.  Callers wanting a bigger config anyway (e.g. a
    compile-probe script) pass ``sb_tiles`` explicitly."""
    for T in (16, 8):
        if B % T == 0 and T * L <= SB_TL_BUDGET:
            return T
    return None


@diff.differentiable(unless=lambda b: (not b["want_q"])
                     or b["collect_level_q"])
@functools.partial(jax.jit, static_argnames=("mode", "leaf_rows", "fanin",
                                             "leaf_qr", "impl", "block",
                                             "collect_level_q", "want_q",
                                             "tree_impl", "seq_chunks",
                                             "sb_tiles"))
def tsqr(a: Array,
         mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
         leaf_rows: int = DEFAULT_LEAF_ROWS,
         fanin: int = DEFAULT_FANIN,
         leaf_qr: Callable | None = None,
         impl: str = "jnp",
         block: int = DEFAULT_BLOCK,
         collect_level_q: bool = False,
         want_q: bool = True,
         tree_impl: str = "jnp",
         seq_chunks: int | None = None,
         sb_tiles: int | None = None):
    """Thin QR of a tall-skinny (m, n) matrix: returns (Q (m, n), R (n, n)).

    ≙ mtk::tsqr::tsqr16 (tsqr.hpp:108-140) generalized to n up to 128+.

    Args:
      a: (m, n) with m >= n.
      mode: precision policy (see :mod:`tsqr_tpu.modes`).
      leaf_rows: target leaf tile height (rounded to MXU-friendly sizes).
      fanin: tree fan-in (2 = reference binary tree; 8 default for TPU).
      leaf_qr: optional override for the leaf-level batched QR,
        signature (B, L, n) -> (Q, R).
      impl: "jnp" (vmapped blocked Householder), "pallas" (VMEM-resident
        fused panel kernel, TPU only) or "pallas_interpret" (CPU debugging).
      block: intra-panel WY block width.
      collect_level_q: also return the per-tree-level Q factor batches for
        instrumentation (≙ the EVALUATE_EACH_SMALL_Q compile-time flag,
        tsqr.cu:25, 1219-1250, which runs multi_orthogonality on every
        level's Q tiles) — returns (q, r, [level Qs]).
      tree_impl: batched-QR impl for the INNER tree levels (default
        "jnp").  The tree nodes are small (fanin*n, n) QRs where the
        Pallas panel kernels buy nothing, and each distinct shape would
        compile its own kernel instantiation — the round-2
        whole-tree-with-sb-leaves program that killed the tunnel's
        remote-compile helper carried exactly those extra
        instantiations.  ``impl`` now selects the LEAF kernel only.
      seq_chunks: sequential leaf-chunk count for the m-scale stages
        (leaf QR + layer-0 backward product), run as a ``lax.map`` so
        only one chunk's temporaries are live at a time.  None (default)
        auto-selects: 1 below LEAF_SEQ_THRESHOLD elements, else enough
        chunks to bound live leaf temps near LEAF_CHUNK_ELEMS — this is
        what lets the Householder tree (and the auto ladder's tier-3
        branch) fit HBM at m = 2^22 x 128 and beyond.
      sb_tiles: tile count for the ``pallas_sb`` leaf kernel.  None
        (default) auto-selects within the compile budget
        (`_pick_sb_tiles`: T*L <= SB_TL_BUDGET, falling back to the XLA
        leaf path above it); an explicit value forces that tile count
        regardless — the compile-probe escape hatch.
      want_q: False compiles the forward-only (compute-R) program — the
        backward Q reconstruction (and any leaf Q build it alone consumes)
        is absent from the fused graph, returning (None, R).  This is both
        the R-only user path (least squares, Gram-free preconditioning) and
        the honest MEASURE_QR_TIME vehicle (tsqr.cu:24, 1095-1098,
        1269-1278): compute-Q time = t(full) - t(R-only) of two *real*
        fused programs, not separately-jitted phase estimates.
    """
    policy = modes.resolve(mode)
    m, n = a.shape
    if m < n:
        raise ValueError(f"tsqr requires m >= n, got {a.shape}")
    a = a.astype(jnp.float32)
    mm = policy.mm
    if leaf_qr is None:
        leaf_qr = _make_batched_qr(policy, impl, block, sb_tiles)
    batched_qr = _make_batched_qr(policy, tree_impl, block)

    bs, L, m_pad = plan_tree(m, n, leaf_rows, fanin)
    a = _pad_rows(a, m_pad)

    if bs == 1:
        q, r = leaf_qr(a[None])
        r_out = r[0].astype(policy.io_dtype)
        # unused Q (want_q=False) is DCE'd by XLA, including the leaf
        # WY Q-build GEMMs it alone consumes
        q_out = q[0, :m].astype(policy.io_dtype) if want_q else None
        return (q_out, r_out, [q]) if collect_level_q else (q_out, r_out)

    # ---- forward: leaf QR then R-reduction tree (≙ tsqr.cu:1102-1172) ----
    leaves = a.reshape(bs, L, n)
    seq = _leaf_chunks(bs, L * n) if seq_chunks is None else seq_chunks
    if seq > 1 and bs % seq == 0:
        def _leaf_step(x):
            qc, rc = leaf_qr(x)
            return qc.astype(policy.work_dtype), rc
        q0, r = jax.lax.map(_leaf_step, leaves.reshape(seq, bs // seq, L, n))
        q0 = q0.reshape(bs, L, n)
        r = r.reshape(bs, *r.shape[2:])
    else:
        seq = 1
        q0, r = leaf_qr(leaves)
        q0 = q0.astype(policy.work_dtype)

    qs: list[Array] = []
    widths: list[int] = []
    while r.shape[0] > 1:
        b = r.shape[0]
        f = min(fanin, b)
        stacked = r.reshape(b // f, f * n, n)
        qk, r = batched_qr(stacked)
        qs.append(qk.astype(policy.work_dtype))
        widths.append(f)

    r_out = jnp.triu(r[0])

    if not want_q:
        r_only = r_out.astype(policy.io_dtype)
        return (None, r_only, [q0] + qs) if collect_level_q \
            else (None, r_only)

    # ---- backward: Q reconstruction down the tree (≙ tsqr.cu:1205-1259) --
    # c starts as the root Q reshaped into per-child n x n blocks.
    c = qs[-1].astype(jnp.float32)  # (1, f*n, n)
    c = c.reshape(widths[-1], n, n)
    for qk, f in zip(reversed(qs[:-1]), reversed(widths[:-1])):
        prod = mm(qk.astype(jnp.float32), c)          # (bk, f*n, n)
        c = prod.reshape(prod.shape[0] * f, n, n)
    if seq > 1:
        q = jax.lax.map(
            lambda t: mm(t[0].astype(jnp.float32), t[1]),
            (q0.reshape(seq, bs // seq, L, n),
             c.reshape(seq, bs // seq, n, n)))
    else:
        q = mm(q0.astype(jnp.float32), c)             # (bs, L, n)
    q = q.reshape(m_pad, n)[:m]
    if collect_level_q:
        return (q.astype(policy.io_dtype), r_out.astype(policy.io_dtype),
                [q0] + qs)
    return q.astype(policy.io_dtype), r_out.astype(policy.io_dtype)


def get_batch_size(m: int, leaf_rows: int = DEFAULT_LEAF_ROWS,
                   fanin: int = DEFAULT_FANIN) -> int:
    """Leaf count of the tree (≙ mtk::tsqr::get_batch_size, tsqr.hpp:23)."""
    return plan_tree(m, 1, leaf_rows, fanin)[0]


def get_batch_size_log2(m: int, leaf_rows: int = DEFAULT_LEAF_ROWS) -> int:
    """Tree depth in binary-equivalent levels
    (≙ get_batch_size_log2, tsqr.hpp:22 / tsqr.cu:39-44)."""
    import math
    return int(math.log2(get_batch_size(m, leaf_rows, 2)))


def get_working_q_size(m: int, n: int, leaf_rows: int = DEFAULT_LEAF_ROWS,
                       fanin: int = DEFAULT_FANIN) -> int:
    """Elements of tree Q storage (≙ get_working_q_size, blockqr.hpp:55;
    reference formula wq = n*m + 2n^2(bs-1), tsqr.cu:47-52)."""
    bs, L, m_pad = plan_tree(m, n, leaf_rows, fanin)
    wq = m_pad * n
    b = bs
    while b > 1:
        f = min(fanin, b)
        wq += (b // f) * f * n * n
        b //= f
    return wq


def get_working_r_size(m: int, n: int, leaf_rows: int = DEFAULT_LEAF_ROWS,
                       fanin: int = DEFAULT_FANIN) -> int:
    """Elements of ping-pong R storage (≙ get_working_r_size,
    blockqr.hpp:56; reference wr = 1.5 n^2 bs, tsqr.cu:54-60)."""
    bs, _, _ = plan_tree(m, n, leaf_rows, fanin)
    return 2 * bs * n * n


def working_memory_elems(m: int, n: int, leaf_rows: int = DEFAULT_LEAF_ROWS,
                         fanin: int = DEFAULT_FANIN) -> int:
    """Peak intermediate elements of the fused tree, for the speed harness
    (≙ wq = n*m + 2n^2(bs-1), wr = 1.5 n^2 bs, tsqr.cu:47-60)."""
    return (get_working_q_size(m, n, leaf_rows, fanin)
            + get_working_r_size(m, n, leaf_rows, fanin))
