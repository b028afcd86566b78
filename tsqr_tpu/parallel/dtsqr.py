"""Distributed TSQR / BlockQR over a 1-D device mesh (shard_map + ICI).

No reference analogue exists (the reference is single-GPU; SURVEY.md §5
'distributed communication backend: none').  This module is the
BASELINE.json north-star extension: the top log2(n_chips) levels of the
TSQR R-tree run over the interconnect.

Design (communication-avoiding, latency-bound payloads):

  * the (m, n) operand is row-sharded: each chip owns an (m/D, n) shard;
  * forward: each chip runs the fused local TSQR (one XLA program) on its
    shard -> (Q_local, R_local);
  * cross-chip: ``all_gather`` of the D tiny (n, n) R factors (D*n^2
    elements -- e.g. 8 chips x 128^2 fp32 = 512 KiB total) and a
    *redundant* small QR of the stacked (D*n, n) on every chip.  For the
    pod sizes this library targets, one all-gather beats a pairwise
    ppermute tree: the payload is latency-bound either way and the
    redundant QR removes the Q-broadcast round-trip entirely;
  * backward: chip d multiplies its local Q by its own (n, n) block of the
    tree Q -- no further communication.

Total bytes on ICI per factorization: D * n^2 * 4 (one all-gather),
independent of m.  That is the communication-optimal TSQR bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tsqr_tpu import modes
from tsqr_tpu.core import diff
from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.ops import householder
from tsqr_tpu.parallel.mesh import ROWS_AXIS

Array = jax.Array


def _local_policy(policy: modes.Policy) -> modes.Policy:
    """Keep fp32 IO inside the distributed composition."""
    return modes.Policy(policy.mode, jnp.float32, policy.work_dtype,
                        policy.mm, policy.corrected)


def _row_axes(mesh: Mesh, axis):
    """Reduction axes of the row sharding.  On a multi-axis mesh (e.g.
    make_mesh2d's (slices, chips)) rows shard over ALL axes and
    ``lax.psum`` takes the axis tuple directly, so every Gram-psum
    driver (dcholqr, dqr, dqr_auto) is hierarchy-agnostic — XLA lowers
    the tuple psum into per-axis (ICI, then DCN) reduction stages."""
    if axis == ROWS_AXIS and len(mesh.axis_names) > 1:
        return tuple(mesh.axis_names)
    return axis


def _axes_size(mesh: Mesh, axis) -> int:
    if isinstance(axis, tuple):
        size = 1
        for ax in axis:
            size *= mesh.shape[ax]
        return size
    return mesh.shape[axis]


def _linear_index(axis):
    """axis_index generalized to an axis tuple: the row-major linear
    position, matching both P((a, b), None) shard order and the
    stacking order of ``all_gather`` over the same tuple."""
    if not isinstance(axis, tuple):
        return lax.axis_index(axis)
    idx = 0
    for ax in axis:
        idx = idx * lax.psum(1, ax) + lax.axis_index(ax)
    return idx


def _ici_rtree_butterfly(r_loc: Array, axis: str, n_dev: int,
                         mm) -> tuple[Array, Array]:
    """Pairwise-exchange (butterfly) R-tree over ICI: log2(D) ``ppermute``
    rounds of ONE (n, n) payload each, vs the all-gather tree's D·(n, n)
    in one round.  At pod scale (large D) this keeps both the per-chip
    payload and the redundant root QR at (2n, n) instead of (D·n, n) —
    the SURVEY §5 pairwise-tree alternative.  Every chip finishes with
    the replicated top R and its own (n, n) backward transform c such
    that Q_shard = Q_local · c."""
    n = r_loc.shape[1]
    idx = lax.axis_index(axis)
    r = r_loc
    c = jnp.eye(n, dtype=jnp.float32)
    k = 1
    while k < n_dev:
        perm = [(i, i ^ k) for i in range(n_dev)]
        r_partner = lax.ppermute(r, axis, perm)
        bit = (idx // k) % 2          # top (0) or bottom (1) of my pair
        top = jnp.where(bit == 0, r, r_partner)
        bot = jnp.where(bit == 0, r_partner, r)
        q_k, r = householder.blocked_householder_qr(
            jnp.concatenate([top, bot], axis=0), mm=mm)   # (2n, n) QR
        # both pair members factor the identical stacked matrix, so r (and
        # ultimately the root R) is bit-identical on every chip
        c = mm(c, lax.dynamic_slice(q_k, (bit * n, 0), (n, n)))
        k *= 2
    return c, r


def _tsqr_shard(a_shard: Array, policy: modes.Policy, axis: str,
                n_dev: int, tree: str = "allgather",
                **tsqr_kw) -> tuple[Array, Array]:
    """Per-shard body: local tree + ICI R-reduction + local Q update."""
    n = a_shard.shape[1]
    mm = policy.mm
    q_loc, r_loc = tsqr_mod.tsqr(a_shard, _local_policy(policy), **tsqr_kw)
    if tree == "butterfly":
        # n_dev drives the Python-level round count, so it must be the
        # real mesh size (a wrong value silently skips reduction rounds)
        assert not isinstance(axis, tuple), \
            "butterfly rides ONE axis; use dtsqr_hier for 2-D meshes"
        assert n_dev >= 1 and n_dev & (n_dev - 1) == 0, \
            f"butterfly tree needs a true power-of-two device count, " \
            f"got n_dev={n_dev}"
        c, r_top = _ici_rtree_butterfly(r_loc.astype(jnp.float32), axis,
                                        n_dev, mm)
        return mm(q_loc.astype(jnp.float32), c), r_top
    # ---- cross-chip R-tree: one all-gather of (n, n) factors ----
    rs = lax.all_gather(r_loc.astype(jnp.float32), axis, axis=0,
                        tiled=True)                      # (D*n, n)
    q_tree, r_top = householder.blocked_householder_qr(rs, mm=mm)
    idx = _linear_index(axis)
    c = lax.dynamic_slice(q_tree, (idx * n, 0), (n, n))   # my (n, n) block
    q_shard = mm(q_loc.astype(jnp.float32), c)
    return q_shard, r_top


@diff.differentiable
def dtsqr(a: Array, mesh: Mesh,
          mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
          axis: str = ROWS_AXIS, tree: str = "allgather",
          **tsqr_kw) -> tuple[Array, Array]:
    """Distributed thin QR of a row-sharded (m, n): Q row-sharded like A,
    R (n, n) replicated.

    tree: "allgather" (default — one all-gather + redundant (D·n, n) root
    QR; optimal at the mesh sizes a single pod slice gives) or
    "butterfly" (log2(D) pairwise ppermute rounds, (2n, n) node QRs —
    bounds per-chip work/payload independent of D for large meshes).
    A 2-D (slices, chips) mesh works with the allgather tree (one flat
    gather over both axes); prefer dtsqr_hier there, which crosses the
    slow DCN axis exactly once."""
    policy = modes.resolve(mode)
    axis = _row_axes(mesh, axis)
    n_dev = _axes_size(mesh, axis)
    m, n = a.shape
    assert m % n_dev == 0, f"m={m} must divide over {n_dev} devices"
    assert m // n_dev >= n, "each shard must stay tall"
    if tree == "butterfly":
        assert n_dev & (n_dev - 1) == 0, "butterfly tree needs 2^k devices"

    fn = shard_map(
        functools.partial(_tsqr_shard, policy=policy, axis=axis,
                          n_dev=n_dev, tree=tree, **tsqr_kw),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P()),
        check_vma=False,
    )
    q, r = fn(a.astype(jnp.float32))
    return q.astype(policy.io_dtype), jnp.triu(r).astype(policy.io_dtype)


def _tsqr_shard_hier(a_shard: Array, policy: modes.Policy,
                     slice_axis: str, chip_axis: str, n_chips: int,
                     **tsqr_kw) -> tuple[Array, Array]:
    """Per-shard body of the two-level tree: local fused TSQR, then a
    butterfly R-tree over the CHIP axis (ICI: log2(chips) rounds of one
    (n, n) payload), then ONE all-gather of the per-slice roots over the
    SLICE axis (DCN: high latency wants the fewest rounds, so a single
    gather + redundant (slices*n, n) root QR beats a pairwise tree
    there) — nested TSQR composition, Q correction c_chip @ c_slice."""
    n = a_shard.shape[1]
    mm = policy.mm
    q_loc, r_loc = tsqr_mod.tsqr(a_shard, _local_policy(policy), **tsqr_kw)
    # stage 1 — ICI within the slice
    c1, r_slice = _ici_rtree_butterfly(r_loc.astype(jnp.float32),
                                       chip_axis, n_chips, mm)
    # stage 2 — one DCN round across slices (r_slice is replicated
    # within each slice, so every chip runs the redundant root QR and
    # no Q-broadcast round-trip crosses DCN)
    rs = lax.all_gather(r_slice, slice_axis, axis=0, tiled=True)
    q_tree, r_top = householder.blocked_householder_qr(rs, mm=mm)
    sidx = lax.axis_index(slice_axis)
    c2 = lax.dynamic_slice(q_tree, (sidx * n, 0), (n, n))
    return mm(q_loc.astype(jnp.float32), mm(c1, c2)), r_top


@diff.differentiable
def dtsqr_hier(a: Array, mesh: Mesh,
               mode: modes.ComputeMode | str | modes.Policy = "fp32",
               slice_axis: str = "slices", chip_axis: str = "chips",
               **tsqr_kw) -> tuple[Array, Array]:
    """Multi-slice distributed thin QR over a 2-D (slices, chips) mesh
    (`mesh.make_mesh2d`): the interconnect hierarchy maps onto the TSQR
    tree — chip-axis levels ride ICI (butterfly, latency-bound (n, n)
    payloads), and exactly ONE all-gather crosses DCN (slices·n² bytes,
    independent of m).  The reference has no distributed backend at
    all (SURVEY §5); the 1-D `dtsqr` covers a single slice — this is
    the multi-slice composition SURVEY §5 reserves DCN for.

    Rows shard slice-major over both axes (`mesh.row_sharding` on a 2-D
    mesh); Q comes back sharded like A, R (n, n) replicated."""
    policy = modes.resolve(mode)
    n_slices = mesh.shape[slice_axis]
    n_chips = mesh.shape[chip_axis]
    m, n = a.shape
    n_dev = n_slices * n_chips
    assert m % n_dev == 0, f"m={m} must divide over {n_dev} devices"
    assert m // n_dev >= n, "each shard must stay tall"
    assert n_chips & (n_chips - 1) == 0, "ICI butterfly needs 2^k chips"

    fn = shard_map(
        functools.partial(_tsqr_shard_hier, policy=policy,
                          slice_axis=slice_axis, chip_axis=chip_axis,
                          n_chips=n_chips, **tsqr_kw),
        mesh=mesh,
        in_specs=P((slice_axis, chip_axis), None),
        out_specs=(P((slice_axis, chip_axis), None), P()),
        check_vma=False,
    )
    q, r = fn(a.astype(jnp.float32))
    return q.astype(policy.io_dtype), jnp.triu(r).astype(policy.io_dtype)


def _dblockqr_shard(a_shard: Array, policy: modes.Policy, axis: str,
                    n_dev: int, panel_width: int, reorth: bool,
                    **tsqr_kw) -> tuple[Array, Array]:
    """Per-shard BlockQR: trailing GEMMs need a psum over the row axis
    (Q^T A_b is a contraction over the sharded m dimension); everything
    else is local.  ≙ block_qr_core / _reorthogonalization_core
    (blockqr.cu:45-390) with cuBLAS GEMMs replaced by psum-reduced local
    GEMMs and TSQR replaced by the ICI tree above.  The panel loop runs
    as a lax.fori_loop over equal-width panels (body traced once, O(1)
    compile time in n — see core/blockqr.py module docstring); a ragged
    final panel gets one statically traced epilogue step."""
    from tsqr_tpu.core.blockqr import _panel_step

    mm = policy.trailing_mm  # ≙ cuBLAS DEFAULT_MATH for cor modes, see modes.py
    m_loc, n = a_shard.shape
    nb = min(panel_width, n)
    psum = functools.partial(lax.psum, axis_name=axis)

    def _tsqr_local(x):
        return _tsqr_shard(x, policy, axis, n_dev, **tsqr_kw)

    def _dpanel_step(qc, rc, a_b, c0, _mm, _tsqr, _axis, _reorth,
                     first=False):
        # the local panel step with the projection contractions
        # psum-reduced over the sharded m axis (single source of truth
        # for the CGS2 algebra: core/blockqr._panel_step)
        return _panel_step(qc, rc, a_b, c0, _mm, _tsqr, _reorth,
                           first=first, reduce=psum)

    q = jnp.zeros((m_loc, n), jnp.float32)
    r = jnp.zeros((n, n), jnp.float32)
    if n <= nb:
        q, r = _dpanel_step(q, r, a_shard, 0, mm, _tsqr_local, axis, reorth,
                            first=True)
        return q, jnp.triu(r)

    n_full = n // nb
    w_tail = n - n_full * nb

    def body(b, carry):
        qc, rc = carry
        c0 = b * nb
        a_b = lax.dynamic_slice(a_shard, (0, c0), (m_loc, nb))
        return _dpanel_step(qc, rc, a_b, c0, mm, _tsqr_local, axis, reorth)

    q, r = _dpanel_step(q, r, a_shard[:, :nb], 0, mm, _tsqr_local, axis,
                        reorth, first=True)
    q, r = lax.fori_loop(1, n_full, body, (q, r))
    if w_tail:
        q, r = _dpanel_step(q, r, a_shard[:, n_full * nb:], n_full * nb,
                            mm, _tsqr_local, axis, reorth)
    return q, jnp.triu(r)


def _dcholqr_shard(a_shard: Array, policy: modes.Policy, axis: str,
                   method: str) -> tuple[Array, Array]:
    """Per-shard CholeskyQR: G = psum(A_loc^T A_loc) — the Gram reduction
    IS the communication-avoiding step (one (n, n) allreduce replaces the
    whole R-tree); everything else is local MXU GEMMs."""
    from tsqr_tpu.core import cholqr

    mm = policy.mm
    n = a_shard.shape[1]

    def gram_psum(x):
        return lax.psum(modes.gram(x, policy), axis)

    g = gram_psum(a_shard)
    if method == "cholqr3":
        m_glob = a_shard.shape[0] * lax.psum(1, axis)
        r1 = cholqr._chol_r(g, shift=cholqr._shift_value(g, m_glob, n))
    else:
        r1 = cholqr._chol_r(g)
    q1 = cholqr._q_pass(a_shard, r1, mm)
    g2 = gram_psum(q1)
    r2 = cholqr._chol_r(g2)
    q2 = cholqr._q_pass(q1, r2, mm)
    r = modes.mm_fp32(r2, r1)
    if method == "cholqr3":
        g3 = gram_psum(q2)
        r3 = cholqr._chol_r(g3)
        q2 = cholqr._q_pass(q2, r3, mm)
        r = modes.mm_fp32(r3, r)
    return q2, jnp.triu(r)


@diff.differentiable
def dcholqr(a: Array, mesh: Mesh,
            mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
            method: str = "cholqr3",
            axis: str = ROWS_AXIS) -> tuple[Array, Array]:
    """Distributed MXU-native tall-skinny QR of a row-sharded (m, n):
    Q row-sharded like A, R (n, n) replicated.  Communication: two or
    three (n, n) psums total, independent of m.  On a 2-D
    (slices, chips) mesh the psums reduce over both axes (ICI + DCN
    stages) with no code change — pass the mesh from make_mesh2d."""
    policy = modes.resolve(mode)
    axis = _row_axes(mesh, axis)
    n_dev = _axes_size(mesh, axis)
    m, n = a.shape
    assert m % n_dev == 0 and m // n_dev >= n

    fn = shard_map(
        functools.partial(_dcholqr_shard, policy=policy, axis=axis,
                          method=method),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P()),
        check_vma=False,
    )
    q, r = fn(a.astype(jnp.float32))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


def _dqr_auto_shard(a_shard: Array, policy: modes.Policy, axis: str,
                    n_dev: int, tol: float, eps: float,
                    return_info: bool = False,
                    **tsqr_kw) -> tuple[Array, ...]:
    """Per-shard PREDICTIVE ladder (the distributed core/auto design).

    The tier-0 Gram psum is ALSO the kappa-estimator's input: because
    G = psum(A_loc^T A_loc) is replicated, every chip computes the same
    rigorous kappa^2(A) bound (power-compounded PSD inf-norms dominate
    spectral norms — auto._psd_norm2_bound) and the `lax.cond` predicate is replicated
    by construction, so all chips take the same branch and the
    collectives inside each branch stay globally consistent."""
    from tsqr_tpu.core import auto, cholqr

    mm = policy.mm
    n = a_shard.shape[1]
    k2max = auto._kappa2_max("cholqr1", eps, tol)

    def gram_psum(x):
        return lax.psum(modes.gram(x, policy), axis)

    # ---- tier 0: shared psum'd Gram + predictive kappa^2 bound ----
    g = gram_psum(a_shard)
    g = (g + g.T) * 0.5
    r1 = cholqr._chol_r(g, shift=None)
    rinv1 = cholqr._rinv(r1)
    minv = modes.mm_fp32(rinv1, rinv1.T)
    kappa2_est = (auto._psd_norm2_bound(g) * auto._psd_norm2_bound(minv))
    ok1 = (kappa2_est < k2max).reshape(())        # False for NaN

    if return_info:
        # tier tag rides every cond branch (replicated, like the Gram)
        def _tag(fn, t):
            return lambda _: (*fn(_), jnp.full((1, 1), t, jnp.int32))
    else:
        def _tag(fn, t):
            return fn

    def tier1(_):
        # finish cholqr1 from the shared factor: one local MXU pass,
        # ZERO additional communication
        return mm(a_shard, rinv1), jnp.triu(r1)

    def tier4(_):
        q, r = _dblockqr_shard(a_shard, policy, axis, n_dev,
                               panel_width=n, reorth=True, **tsqr_kw)
        return q, jnp.triu(r)

    def rest(_):
        # tier 2: shifted distributed CholeskyQR3 REUSING the shared
        # Gram (2 more (n, n) psums + one gate psum, independent of m)
        m_glob = a_shard.shape[0] * lax.psum(1, axis)
        r1s = cholqr._chol_r(g, shift=cholqr._shift_value(g, m_glob, n))
        q1 = cholqr._q_pass(a_shard, r1s, mm)
        g2 = gram_psum(q1)
        r2 = cholqr._chol_r(g2)
        q2 = cholqr._q_pass(q1, r2, mm)
        g3 = gram_psum(q2)
        r3 = cholqr._chol_r(g3)
        q3 = cholqr._q_pass(q2, r3, mm)
        r_m = modes.mm_fp32(r3, modes.mm_fp32(r2, r1s))
        # measured gate: one more (n, n) psum (the local Grams are the
        # only m-scale cost; tier 2 already pays CholeskyQR3's passes)
        gq = gram_psum(q3)
        orth_m = jnp.linalg.norm(gq - jnp.eye(n)) / jnp.sqrt(n * 1.0)
        ok2 = orth_m < tol

        def mid_ok(_):
            return q3, jnp.triu(r_m)

        if policy.mode in cholqr._CHEAP_DOT:
            # no iterated rung for the cheap-dot modes (cholqr_iter)
            return lax.cond(ok2, _tag(mid_ok, 2), _tag(tier4, 4), None)

        def tier_iter(_):
            # tier 3: iterated shifted CholeskyQR, distributed — the
            # shared while_loop (cholqr._iter_shifted_loop) with a
            # psum'd Gram; one (n, n) allreduce per shifted pass, the
            # same D-independent traffic bound as every Gram driver.
            # The loop state is replicated (g is), so all chips run the
            # same trip count and the collectives stay consistent.
            def gram_of_f(f):
                gg = gram_psum(mm(a_shard, f))
                return (gg + gg.T) * 0.5

            f, rt, gexit, _, _ = cholqr._iter_shifted_loop(
                g, gram_of_f,
                lambda gg: cholqr._shift_value(gg, m_glob, n),
                n, cholqr._iter_polish_k2(policy), 16)
            # single tail factor, applied to the BITWISE-recomputed
            # shard panel (see cholqr.cholqr_iter: composing into F
            # would floor orthogonality at ~eps*kappa(A))
            r2i = cholqr._chol_r(gexit)
            rt2 = modes.mm_fp32(r2i, rt)
            x = mm(a_shard, f)
            q_i = cholqr._q_pass(x, r2i, mm)
            r_i = jnp.triu(rt2)
            gq_i = gram_psum(q_i)
            orth_i = jnp.linalg.norm(gq_i - jnp.eye(n)) / jnp.sqrt(n * 1.0)
            ok3 = orth_i < tol  # False for NaN

            def iter_ok(_):
                return q_i, r_i

            return lax.cond(ok3, _tag(iter_ok, 3), _tag(tier4, 4), None)

        return lax.cond(ok2, _tag(mid_ok, 2), tier_iter, None)

    out = lax.cond(ok1, _tag(tier1, 1), rest, None)
    if return_info:
        q, r, tier = out
        return q, r, tier, kappa2_est
    return out


@diff.differentiable(unless=lambda b: b["return_info"])
def dqr_auto(a: Array, mesh: Mesh,
             mode: modes.ComputeMode | str | modes.Policy = "fp32",
             axis: str = ROWS_AXIS, return_info: bool = False,
             **tsqr_kw) -> tuple[Array, ...]:
    """Distributed self-validating QR: the predictive 4-tier ladder of
    ``core/auto.qr_auto_fused`` lifted to a row-sharded mesh.  Q comes
    back row-sharded, R (n, n) replicated; the fast tier costs ONE
    (n, n) psum of communication, the robust tier four — independent of
    m either way.  The static-mode reference cannot express this; it is
    the natural composition of this library's two TPU-first ideas
    (Gram-psum distribution + runtime self-validation).

    ``return_info=True`` appends ``{"tier", "kappa2_est"}`` exactly as
    ``qr_auto_fused`` does; both values are replicated across the mesh
    (deterministic functions of the psum'd Gram).  2-D (slices, chips)
    meshes work unchanged (psum over both axes)."""
    from tsqr_tpu.core import auto

    policy = modes.resolve(mode)
    axis = _row_axes(mesh, axis)
    n_dev = _axes_size(mesh, axis)
    m, n = a.shape
    assert m % n_dev == 0 and m // n_dev >= n
    tol = auto._TOL.get(policy.mode, 1e-4)
    eps = auto._EPS_GATE.get(policy.mode, 1e-6)

    out_specs = (P(axis, None), P()) if not return_info else \
        (P(axis, None), P(), P(), P())
    fn = shard_map(
        functools.partial(_dqr_auto_shard, policy=policy, axis=axis,
                          n_dev=n_dev, tol=tol, eps=eps,
                          return_info=return_info, **tsqr_kw),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=out_specs,
        check_vma=False,
    )
    if return_info:
        q, r, tier, k2 = fn(a.astype(jnp.float32))
        return (q.astype(policy.io_dtype), r.astype(policy.io_dtype),
                {"tier": tier, "kappa2_est": k2})
    q, r = fn(a.astype(jnp.float32))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


@diff.differentiable
def dqr(a: Array, mesh: Mesh,
        mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
        reorth: bool = False, panel_width: int = 128,
        axis: str = ROWS_AXIS, **tsqr_kw) -> tuple[Array, Array]:
    """Distributed BlockQR of a row-sharded (m, n), n can exceed the panel
    width: Q row-sharded, R replicated.  ≙ mtk::qr::qr lifted to a mesh.
    2-D (slices, chips) meshes work unchanged (psum over both axes)."""
    policy = modes.resolve(mode)
    axis = _row_axes(mesh, axis)
    n_dev = _axes_size(mesh, axis)
    m, n = a.shape
    if n > m:
        raise ValueError(f"BlockQR requires m >= n, got {a.shape}")
    assert m % n_dev == 0 and m // n_dev >= min(panel_width, n)
    if tsqr_kw.get("tree") == "butterfly":
        assert n_dev & (n_dev - 1) == 0, "butterfly tree needs 2^k devices"

    fn = shard_map(
        functools.partial(_dblockqr_shard, policy=policy, axis=axis,
                          n_dev=n_dev, panel_width=panel_width,
                          reorth=reorth, **tsqr_kw),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P()),
        check_vma=False,
    )
    q, r = fn(a.astype(jnp.float32))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


def dqr_regen(gen_chunk, m: int, n: int, mesh: Mesh,
              mode: modes.ComputeMode | str | modes.Policy = "bf16",
              method: str = "cholqr2",
              chunk_rows: int = 1 << 21,
              axis: str = ROWS_AXIS) -> tuple[Array, dict]:
    """Matrix-free distributed streamed QR: ``core.ooc.qr_regen`` lifted
    to a mesh.  A is defined by ``gen_chunk(i)`` over GLOBAL chunk
    indices; device d generates chunks [d*c, (d+1)*c) locally, so the
    per-device HBM footprint is one (chunk_rows, n) tile regardless of m
    — the beyond-HBM envelope scales with the POD, not the chip.

    Communication: one (n, n) psum per Gram pass plus one (n, n) + two
    scalar psums for the streamed metrics — the same m-independent
    D*n^2 ICI bound as ``dcholqr`` (module docstring).  Returns
    (R replicated, {orthogonality, residual, rinv}); Q is never
    materialized — a consumer applies ``info["rinv"]`` to its own
    locally-generated chunks.
    """
    from tsqr_tpu.core import ooc

    policy = modes.resolve(mode)
    axis = _row_axes(mesh, axis)
    n_dev = _axes_size(mesh, axis)
    assert m % (chunk_rows * n_dev) == 0, (m, chunk_rows, n_dev)
    per_dev = m // chunk_rows // n_dev

    def shard_body():
        d = _linear_index(axis)

        def local_gen(i):
            return gen_chunk(d * per_dev + i)

        return ooc._regen_body(
            local_gen, per_dev, n, chunk_rows, policy, method,
            reduce=lambda x: lax.psum(x, axis))

    fn = shard_map(shard_body, mesh=mesh, in_specs=(),
                   out_specs=(P(), P(), P(), P()), check_vma=False)
    r, orth, resid, rinv = jax.jit(fn)()
    return r, {"orthogonality": orth, "residual": resid, "rinv": rinv}


def dsketch(a: Array, key: Array, l: int, mesh: Mesh,
            axis: str = ROWS_AXIS, chunk_rows: int = 1 << 16) -> Array:
    """Distributed Gaussian sketch B = Omega A of a row-sharded (m, n).

    Each chip generates its own Omega column-block on the fly
    (``fold_in(key, shard_index)`` — Omega is never materialized
    anywhere) and contracts it with its local rows; the (l, n) partials
    reduce in ONE psum.  Communication: l*n*4 bytes on ICI, independent
    of m — the same m-independent bound as the Gram reduction
    (``dcholqr``).  B comes back replicated on every chip, ready for
    the small pivoted QR / preconditioner QR that consumes it
    (`core.cholqr.rand_cholqr`, `models.qrcp`).

    The draw differs from the single-chip `sketch_gaussian` (blocks are
    keyed per shard) — the embedding STATISTICS are the contract, not
    the values, exactly as with a different ``chunk_rows``.
    """
    from tsqr_tpu.core import cholqr

    axis = _row_axes(mesh, axis)
    n_dev = _axes_size(mesh, axis)
    m, n = a.shape
    assert m % n_dev == 0, f"m={m} must divide over {n_dev} devices"

    def shard_fn(a_shard):
        k_loc = jax.random.fold_in(key, _linear_index(axis))
        b_loc = cholqr.sketch_gaussian(a_shard.astype(jnp.float32),
                                       k_loc, l, chunk_rows=chunk_rows)
        return lax.psum(b_loc, axis)

    fn = shard_map(shard_fn, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(), check_vma=False)
    return fn(a)
