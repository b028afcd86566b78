"""Reverse-mode differentiation for the QR entry points.

The CUDA reference is a factorization library with no autodiff story; a
JAX-native framework owes its users ``jax.grad`` through the
factorization (training through a QR layer, argmin-differentiation of
the least-squares consumer, ...).  The forward paths here are NOT
naively differentiable — the predictive ladder runs a
``lax.while_loop`` (no reverse-mode rule), the fused pipelines are
Pallas kernels (no AD at all) — and tracing reverse-mode through them
would be the wrong program anyway: it would rematerialize every
intermediate panel of every Gram pass.

The TPU-native answer is a ``jax.custom_vjp`` at the entry-point
boundary.  For ANY smooth map A -> (Q, R) with A = QR, Q^T Q = I and R
upper triangular — every method in this library, whatever tier,
pass-count, or kernel produced the factors — the adjoint depends only
on the primal OUTPUTS (the classical reduced-QR adjoint, same identity
behind ``jnp.linalg.qr``'s rule):

    M  = (Q^T dQ - dQ^T Q) + (R dR^T - dR R^T)
    dA = Q (dR + tril(M) R^{-T}) + (dQ - Q Q^T dQ) R^{-T}

so the kernels stay opaque and backward costs two (m, n) GEMMs plus two
(n, n)-by-n triangular solves, independent of the forward method.

Caveats (shared with ``jnp.linalg.qr``'s rule): requires m >= n (all
entries already enforce this) and a full-rank R — at exact rank
deficiency the factorization itself is non-unique and the adjoint blows
up with R^{-T}.  Only reverse mode is provided; forward-mode (jvp)
through a ``custom_vjp`` function raises by JAX's rules.
"""

from __future__ import annotations

import functools
import inspect

import jax
import jax.numpy as jnp

from tsqr_tpu import modes

Array = jax.Array


def qr_adjoint(q: Array, r: Array, dq: Array, dr: Array) -> Array:
    """Cotangent dA from (Q, R, dQ, dR) of any valid reduced QR.

    Computed in f32 whatever the io dtype (bf16 cotangents are upcast;
    the caller casts dA back to A's dtype).  The strictly-lower
    triangle of dR is discarded first: R's lower zeros are structural,
    so cotangents there cannot flow (d tril-part = 0 exactly).
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
    """Decorator: reverse-mode differentiability in ``a`` for an
    ``(a, ...) -> (Q, R)`` entry point, via :func:`qr_adjoint`.

    All non-array arguments select the method/precision and are
    non-differentiable by construction (they enter the ``custom_vjp``
    closure, not its signature).  ``unless(bound_args)`` returning True
    skips wrapping — for flag combinations that change the return arity
    (e.g. ``return_info=True``), which keep their plain behavior.

    A call whose extra arguments are unhashable (e.g. an array-valued
    kwarg) falls back to the undecorated entry: still correct, just not
    differentiable — the wrapped ``custom_vjp`` object is cached per
    (input dtype, static args) so repeated calls under jit re-use one
    trace cache entry.
    """
    if fn is None:
        return functools.partial(differentiable, unless=unless)
    sig = inspect.signature(fn)

    @functools.lru_cache(maxsize=256)
    def _vjp_fn(a_dtype, args, kwargs_items):
        kwargs = dict(kwargs_items)

        @jax.custom_vjp
        def qr_d(a):
            return fn(a, *args, **kwargs)

        def fwd(a):
            out = fn(a, *args, **kwargs)
            return out, out

        def bwd(res, cot):
            q, r = res
            dq, dr = cot
            return (qr_adjoint(q, r, dq, dr).astype(a_dtype),)

        qr_d.defvjp(fwd, bwd)
        return qr_d

    @functools.wraps(fn)
    def wrapper(a, *args, **kwargs):
        if unless is not None:
            ba = sig.bind(a, *args, **kwargs)
            ba.apply_defaults()
            if unless(ba.arguments):
                return fn(a, *args, **kwargs)
        try:
            qr_d = _vjp_fn(jnp.dtype(a.dtype),
                           args, tuple(sorted(kwargs.items())))
        except TypeError:  # unhashable extra arg: plain, non-diff call
            return fn(a, *args, **kwargs)
        return qr_d(a)

    return wrapper
