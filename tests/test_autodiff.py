"""Reverse-mode differentiation through the QR entry points.

The reference CUDA library has no autodiff surface; this is a
framework-level capability of the TPU/JAX rebuild (core/diff.py): every
``(a, ...) -> (Q, R)`` entry — whatever tier, method, Pallas kernel or
``lax.while_loop`` produced the factors — carries a ``jax.custom_vjp``
built from the classical reduced-QR adjoint, which needs only the
primal outputs.

Methodology: gradients are compared against ``jnp.linalg.qr``'s
independent rule THROUGH A SIGN-NORMALIZED LOSS.  Different methods may
return (Q, R) differing by column signs; multiplying by
``sign(diag(R))`` inside the loss makes it the same function of A for
every method (the positive-diagonal reduced QR is unique for full-rank
A), so the gradients must agree — ``jnp.sign`` contributes zero
derivative, matching the local constancy of the sign choice.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsqr_tpu.core import blockqr, cholqr
from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.core.auto import qr_auto_fused
from tsqr_tpu.utils import latms


def _sign_norm(q, r):
    s = jnp.sign(jnp.diagonal(r))
    s = jnp.where(s == 0, 1.0, s)
    return q * s[None, :], r * s[:, None]


def _loss_of(qr_fn, w1, w2):
    def loss(x):
        q, r = qr_fn(x)
        qn, rn = _sign_norm(q.astype(jnp.float32), r.astype(jnp.float32))
        return jnp.vdot(qn, w1) + jnp.vdot(rn, w2)
    return loss


def _setup(m=96, n=24, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))
    w1 = jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(-1, 1, (n, n)).astype(np.float32))
    return a, w1, w2


@pytest.mark.parametrize("name,qr_fn", [
    ("fastqr_cholqr2", lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")),
    ("fastqr_cholqr3", lambda x: cholqr.fastqr(x, "fp32", method="cholqr3")),
    ("blockqr", lambda x: blockqr.qr(x, "fp32")),
    ("tsqr", lambda x: tsqr_mod.tsqr(x, "fp32")),
    ("ladder", lambda x: qr_auto_fused(x, "fp32")),
])
def test_grad_matches_jnp_qr(name, qr_fn):
    a, w1, w2 = _setup()
    g_ref = jax.grad(_loss_of(jnp.linalg.qr, w1, w2))(a)
    g = jax.grad(_loss_of(qr_fn, w1, w2))(a)
    err = float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))
    assert err < 1e-5, f"{name}: {err}"


def test_jvp_matches_jnp_qr():
    # forward mode: the custom_jvp tangent rule vs jnp.linalg.qr's,
    # through the sign-normalized map (jnp.sign has zero tangent)
    a, _, _ = _setup()
    rng = np.random.default_rng(11)
    da = jnp.asarray(rng.uniform(-1, 1, a.shape).astype(np.float32))

    def norm_qr(qr_fn):
        return lambda x: _sign_norm(*[o.astype(jnp.float32)
                                      for o in qr_fn(x)])

    (qn_r, rn_r), (dq_r, dr_r) = jax.jvp(norm_qr(jnp.linalg.qr), (a,), (da,))
    for name, qr_fn in [
        ("fastqr", lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")),
        ("ladder", lambda x: qr_auto_fused(x, "fp32")),
    ]:
        _, (dq, dr) = jax.jvp(norm_qr(qr_fn), (a,), (da,))
        for got, ref in [(dq, dq_r), (dr, dr_r)]:
            err = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
            assert err < 1e-5, f"{name}: {err}"


def test_second_order_ad():
    # the jvp rule's primal call is RE-ENTRANT (diff.py): each
    # differentiation order peels one custom-rule level, so
    # hessian/grad-of-grad work even through the ladder's while_loop
    rng = np.random.default_rng(10)
    a = jnp.asarray(rng.uniform(-1, 1, (32, 6)).astype(np.float32))

    def sn_loss(qr_fn):
        def f(x):
            q, r = qr_fn(x)
            s = jnp.sign(jnp.diagonal(r))
            s = jnp.where(s == 0, 1.0, s)
            return jnp.sum((r * s[:, None]) ** 3)
        return f

    h = jax.hessian(sn_loss(
        lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")))(a)
    h_ref = jax.hessian(sn_loss(jnp.linalg.qr))(a)
    err = float(jnp.linalg.norm(h - h_ref) / jnp.linalg.norm(h_ref))
    assert err < 1e-5, err

    gg = jax.grad(lambda x: jnp.sum(jax.grad(
        sn_loss(lambda y: qr_auto_fused(y, "fp32")))(x) ** 2))(a)
    assert bool(jnp.all(jnp.isfinite(gg)))


def test_vjp_transpose_matches_explicit_adjoint():
    # reverse mode is DERIVED (linearize + transpose of the tangent
    # rule); the classical explicit adjoint in diff.qr_adjoint is the
    # independent closed form both must agree with
    from tsqr_tpu.core import diff
    a, _, _ = _setup(seed=12)
    rng = np.random.default_rng(12)
    fn = lambda x: cholqr.fastqr(x, "fp32", method="cholqr2")
    (q, r), vjp = jax.vjp(fn, a)
    dq = jnp.asarray(rng.uniform(-1, 1, q.shape).astype(np.float32))
    dr = jnp.asarray(rng.uniform(-1, 1, r.shape).astype(np.float32))
    (da_derived,) = vjp((dq, dr))
    da_explicit = diff.qr_adjoint(q, r, dq, dr)
    err = float(jnp.linalg.norm(da_derived - da_explicit)
                / jnp.linalg.norm(da_explicit))
    assert err < 1e-5, err


def test_grad_jit_and_eager_agree():
    a, w1, w2 = _setup()
    loss = _loss_of(lambda x: cholqr.fastqr(x, "fp32", method="cholqr2"),
                    w1, w2)
    g_e = jax.grad(loss)(a)
    g_j = jax.jit(jax.grad(loss))(a)
    np.testing.assert_allclose(np.asarray(g_j), np.asarray(g_e),
                               rtol=1e-5, atol=1e-7)


def test_grad_corrected_mode_tracks_fp32():
    # bf16x6_cor forward error ~1e-7 grade => its (Q, R), and hence the
    # adjoint, sit within ~1e-5 of the fp32 path's
    a, w1, w2 = _setup(seed=1)
    g32 = jax.grad(_loss_of(
        lambda x: cholqr.fastqr(x, "fp32", method="cholqr2"), w1, w2))(a)
    gc = jax.grad(_loss_of(
        lambda x: cholqr.fastqr(x, "bf16x6_cor", method="cholqr2"),
        w1, w2))(a)
    err = float(jnp.linalg.norm(gc - g32) / jnp.linalg.norm(g32))
    assert err < 1e-4, err


def test_grad_bf16_io_finite():
    # bf16 io: (Q, R) come back bfloat16; cotangents are upcast in the
    # adjoint and dA lands back in A's dtype
    a, w1, w2 = _setup(seed=2)
    g = jax.grad(_loss_of(lambda x: cholqr.fastqr(x, "bf16"), w1, w2))(a)
    assert g.dtype == a.dtype
    assert bool(jnp.all(jnp.isfinite(g)))
    g32 = jax.grad(_loss_of(
        lambda x: cholqr.fastqr(x, "fp32", method="cholqr1"), w1, w2))(a)
    err = float(jnp.linalg.norm(g - g32) / jnp.linalg.norm(g32))
    assert err < 5e-2, err  # bf16-grade forward => bf16-grade adjoint


def test_grad_through_ladder_deep_kappa():
    # kappa ~3e5 routes the ladder into the iterated tier (a
    # lax.while_loop, which has no reverse-mode rule): the custom_vjp
    # at the entry boundary is what makes this differentiable at all
    m, n = 2048, 24
    # Tiers 2-3 self-gate on *measured* orthogonality, so the kappa that
    # first overwhelms the shifted-CholQR3 tier is platform-dependent
    # (true-f32 CPU Gram survives deeper kappa than the TPU's bf16-grade
    # default matmul).  Probe upward until the ladder actually takes the
    # while_loop tier rather than hardcoding one kappa.
    a = info = None
    for kappa in (3e5, 1e6, 3e7, 3e8):
        cand, _ = latms.rand_matrix_with_cond(
            jax.random.PRNGKey(3), m, n, kappa)
        cand = cand.astype(jnp.float32)
        _, _, cinfo = qr_auto_fused(cand, "fp32", return_info=True)
        if int(cinfo["tier"][0, 0]) >= 3:
            a, info = cand, cinfo
            break
    assert info is not None, "no probed kappa reached the iterated tier"
    rng = np.random.default_rng(3)
    w1 = jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(-1, 1, (n, n)).astype(np.float32))
    g = jax.grad(_loss_of(lambda x: qr_auto_fused(x, "fp32"), w1, w2))(a)
    g_ref = jax.grad(_loss_of(jnp.linalg.qr, w1, w2))(a)
    # eps-grade (Q, R) from the iterated tier => the adjoint tracks the
    # reference rule to ~forward accuracy even at deep kappa
    err = float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))
    assert err < 5e-3, err

    # kappa ~1e6: gradient must at least exist and be finite
    a6, _ = latms.rand_matrix_with_cond(jax.random.PRNGKey(4), m, n, 1e6)
    g6 = jax.grad(_loss_of(lambda x: qr_auto_fused(x, "fp32"), w1, w2))(
        a6.astype(jnp.float32))
    assert bool(jnp.all(jnp.isfinite(g6)))


def test_grad_square_and_ragged_shapes():
    for m, n, seed in [(24, 24, 5), (100, 13, 6)]:
        a, w1, w2 = _setup(m, n, seed)
        g_ref = jax.grad(_loss_of(jnp.linalg.qr, w1, w2))(a)
        g = jax.grad(_loss_of(
            lambda x: cholqr.fastqr(x, "fp32", method="cholqr2"),
            w1, w2))(a)
        err = float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))
        assert err < 1e-5, (m, n, err)


def test_info_and_rvalue_paths_unwrapped():
    # flag combinations that change the return arity keep their plain,
    # non-differentiable behavior
    a, _, _ = _setup()
    out = qr_auto_fused(a, "fp32", return_info=True)
    assert len(out) == 3 and isinstance(out[2], dict)
    qn, r = tsqr_mod.tsqr(a, "fp32", want_q=False)
    assert qn is None
    assert r.shape == (a.shape[1], a.shape[1])


def test_grad_distributed_drivers():
    # the same adjoint lifts to the mesh drivers for free: backward is
    # plain jnp on the row-sharded Q / replicated R, so GSPMD shards it
    from tsqr_tpu.parallel import dtsqr, mesh as mesh_mod
    assert len(jax.devices()) >= 8
    mesh8 = mesh_mod.make_mesh(8)
    m, n = 256, 16
    a, w1, w2 = _setup(m, n, seed=8)
    ax = jax.device_put(a, mesh_mod.row_sharding(mesh8))
    g_ref = jax.grad(_loss_of(jnp.linalg.qr, w1, w2))(a)
    for name, fn in [
        ("dtsqr", lambda x: dtsqr.dtsqr(x, mesh8, "fp32", leaf_rows=32)),
        ("dcholqr", lambda x: dtsqr.dcholqr(x, mesh8, "fp32",
                                            method="cholqr2")),
        ("dqr_auto", lambda x: dtsqr.dqr_auto(x, mesh8, "fp32",
                                              leaf_rows=32)),
    ]:
        g = jax.grad(_loss_of(fn, w1, w2))(ax)
        err = float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))
        assert err < 1e-5, f"{name}: {err}"


def test_svd_consumer_grad():
    # tsqr_svd = our differentiable QR + jnp.linalg.svd on R: gradients
    # of the singular values flow end-to-end and match jnp.linalg.svd's
    from tsqr_tpu.models import svd as svd_mod
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.uniform(-1, 1, (64, 8)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 1.5, (8,)).astype(np.float32))

    def loss_ours(x):
        _, s, _ = svd_mod.tsqr_svd(x, "fp32", method="cholqr2")
        return jnp.vdot(s, w)

    def loss_ref(x):
        return jnp.vdot(jnp.linalg.svd(x, compute_uv=False), w)

    g = jax.grad(loss_ours)(a)
    g_ref = jax.grad(loss_ref)(a)
    err = float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))
    assert err < 1e-4, err


def test_training_through_qr_converges():
    # the capability in its actual use: optimize a matrix through the
    # factorization (nearest-orthonormal-factor objective: drive A's R
    # factor toward the identity => A toward its own Q).  20 GD steps
    # through jit(grad(loss)) must reduce the loss monotonically-ish
    # and by >100x
    rng = np.random.default_rng(13)
    a0 = jnp.asarray((np.vstack([np.eye(24), np.zeros((24, 24))])
                      + 0.3 * rng.standard_normal((48, 24))
                      ).astype(np.float32))

    @jax.jit
    def loss(x):
        _, r = cholqr.fastqr(x, "fp32", method="cholqr2")
        s = jnp.sign(jnp.diagonal(r))
        s = jnp.where(s == 0, 1.0, s)
        return jnp.sum((r * s[:, None] - jnp.eye(24)) ** 2)

    step = jax.jit(lambda x: x - 0.2 * jax.grad(loss)(x))
    losses = [float(loss(a0))]
    x = a0
    for _ in range(20):
        x = step(x)
        losses.append(float(loss(x)))
    assert losses[-1] < losses[0] / 100, losses[::5]
    # at the optimum A ~ its own orthonormal factor
    xn = np.asarray(x, np.float64)
    assert np.linalg.norm(xn.T @ xn - np.eye(24)) / np.sqrt(24) < 1e-2


def test_lstsq_end_to_end_grad():
    # argmin differentiation through the consumer: x(A, b) via our QR +
    # triangular solve vs the same solve through jnp.linalg.qr
    # package re-exports the lstsq FUNCTION over the submodule name
    import tsqr_tpu.models.lstsq  # noqa: F401
    lstsq_mod = sys.modules["tsqr_tpu.models.lstsq"]
    rng = np.random.default_rng(7)
    m, n = 80, 12
    a = jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (m,)).astype(np.float32))

    def loss_ours(a_, b_):
        x = lstsq_mod.lstsq(a_, b_, "fp32")
        return jnp.sum(x * x)

    def loss_ref(a_, b_):
        q, r = jnp.linalg.qr(a_)
        x = jax.scipy.linalg.solve_triangular(r, q.T @ b_, lower=False)
        return jnp.sum(x * x)

    ga, gb = jax.grad(loss_ours, argnums=(0, 1))(a, b)
    ga_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    assert float(jnp.linalg.norm(ga - ga_r)
                 / jnp.linalg.norm(ga_r)) < 1e-4
    assert float(jnp.linalg.norm(gb - gb_r)
                 / jnp.linalg.norm(gb_r)) < 1e-4
