"""Automatic differentiation for the QR entry points.

The CUDA reference is a factorization library with no autodiff story; a
JAX-native framework owes its users ``jax.grad`` / ``jax.jvp`` through
the factorization (training through a QR layer, argmin-differentiation
of the least-squares consumer, forward-mode Jacobians, ...).  The
forward paths here are NOT naively differentiable — the predictive
ladder runs a ``lax.while_loop`` (no reverse-mode rule), the fused
pipelines are Pallas kernels (no AD at all) — and tracing AD through
them would be the wrong program anyway: it would rematerialize every
intermediate panel of every Gram pass.

The TPU-native answer is a custom differentiation rule at the
entry-point boundary.  For ANY smooth map A -> (Q, R) with A = QR,
Q^T Q = I and R upper triangular — every method in this library,
whatever tier, pass-count, or kernel produced the factors — the
derivative depends only on the primal OUTPUTS.  The rule is attached as
a ``jax.custom_jvp`` (the tangent rule below, same identity behind
``jnp.linalg.qr``'s); reverse mode is derived by JAX's linearize +
transpose, and :func:`qr_adjoint` states the classical explicit adjoint

    M  = (Q^T dQ - dQ^T Q) + (R dR^T - dR R^T)
    dA = Q (dR + tril(M) R^{-T}) + (dQ - Q Q^T dQ) R^{-T}

which the tests assert the derived transpose agrees with — an
independent correctness check on both.  Either direction costs two
(m, n) GEMMs plus (n, n) triangular solves, independent of the forward
method; the kernels stay opaque.

Caveats (shared with ``jnp.linalg.qr``'s rule): requires m >= n (all
entries already enforce this) and a full-rank R — at exact rank
deficiency the factorization itself is non-unique and the derivative
blows up with R^{-1}.
"""

from __future__ import annotations

import functools
import inspect

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes

Array = jax.Array


def qr_tangent(q: Array, r: Array, da: Array) -> tuple[Array, Array]:
    """Tangents (dQ, dR) from the primal (Q, R) and input tangent dA.

    The unique solution of the differentiated constraints
    dA = dQ R + Q dR, dQ^T Q + Q^T dQ = 0, dR upper triangular:
    with X = dA R^{-1} and S = Q^T X,

        dO = tril(S, -1) - tril(S, -1)^T          (antisymmetric part)
        dQ = X - Q (S - dO)
        dR = (S - dO) R

    Computed in f32 whatever the io dtype; the caller casts back.
    """
    f32 = jnp.float32
    q, r, da = q.astype(f32), r.astype(f32), da.astype(f32)
    x = lax.linalg.triangular_solve(r, da, left_side=False, lower=False)
    s = modes.mm_fp32(q.T, x)
    low = jnp.tril(s, -1)
    do = low - low.T
    dq = x - modes.mm_fp32(q, s - do)
    dr = modes.mm_fp32(s - do, r)
    return dq, dr


def qr_adjoint(q: Array, r: Array, dq: Array, dr: Array) -> Array:
    """Cotangent dA from (Q, R, dQ, dR): the classical explicit reduced-QR
    adjoint.  Not on the AD path (reverse mode is derived by transposing
    :func:`qr_tangent`); kept as the closed form the tests check the
    derived transpose against.

    The strictly-lower triangle of dR is discarded first: R's lower
    zeros are structural, so cotangents there cannot flow.
    """
    f32 = jnp.float32
    q, r = q.astype(f32), r.astype(f32)
    dq, dr = dq.astype(f32), jnp.triu(dr.astype(f32))
    qdq = modes.mm_fp32(q.T, dq)
    m_ = (qdq - qdq.T) + (modes.mm_fp32(r, dr.T) - modes.mm_fp32(dr, r.T))

    def rtsolve(x):  # x @ R^{-T}
        return jax.scipy.linalg.solve_triangular(r, x.T, lower=False).T

    return (modes.mm_fp32(q, dr + rtsolve(jnp.tril(m_)))
            + rtsolve(dq - modes.mm_fp32(q, qdq)))


def differentiable(fn=None, *, unless=None):
    """Decorator: jvp + (derived) vjp differentiability in ``a`` for an
    ``(a, ...) -> (Q, R)`` entry point, via :func:`qr_tangent`.

    All non-array arguments select the method/precision and are
    non-differentiable by construction (they enter the ``custom_jvp``
    closure, not its signature).  ``unless(bound_args)`` returning True
    skips wrapping — for flag combinations that change the return arity
    (e.g. ``return_info=True``), which keep their plain behavior.

    A call whose extra arguments are unhashable (e.g. an array-valued
    kwarg) falls back to the undecorated entry: still correct, just not
    differentiable — the wrapped ``custom_jvp`` object is cached per
    (static args) so repeated calls under jit re-use one trace cache
    entry.
    """
    if fn is None:
        return functools.partial(differentiable, unless=unless)
    sig = inspect.signature(fn)

    @functools.lru_cache(maxsize=256)
    def _jvp_fn(args, kwargs_items):
        kwargs = dict(kwargs_items)

        @jax.custom_jvp
        def qr_d(a):
            return fn(a, *args, **kwargs)

        @qr_d.defjvp
        def _rule(primals, tangents):
            (a,), (da,) = primals, tangents
            # re-entrant primal call: under higher-order AD `a` is itself
            # a differentiation tracer, and calling qr_d (not the raw fn)
            # peels one custom-rule level per order instead of tracing AD
            # into the while_loop/Pallas internals — this is what makes
            # jax.hessian / grad-of-grad work through every entry
            q, r = qr_d(a)
            dq, dr = qr_tangent(q, r, da)
            return (q, r), (dq.astype(q.dtype), dr.astype(r.dtype))

        return qr_d

    @functools.wraps(fn)
    def wrapper(a, *args, **kwargs):
        if unless is not None:
            ba = sig.bind(a, *args, **kwargs)
            ba.apply_defaults()
            if unless(ba.arguments):
                return fn(a, *args, **kwargs)
        try:
            qr_d = _jvp_fn(args, tuple(sorted(kwargs.items())))
        except TypeError:  # unhashable extra arg: plain, non-diff call
            return fn(a, *args, **kwargs)
        return qr_d(a)

    return wrapper
