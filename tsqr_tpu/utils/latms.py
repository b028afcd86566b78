"""Condition-number-controlled random test matrices (LAPACK-latms style).

≙ reference src/latms.{hpp,cu}: A = U diag(s) V^T with U, V the Q factors of
Gaussian random matrices (latms.cu:24-86 via cusolver geqrf/orgqr), diagonal
assembly (latms.cu:88-96), and two GEMMs (latms.cu:101-120); plus
``get_cond`` = s_max / s_min via SVD (latms.cu:128-170).  The TPU rebuild
uses jax.random + jnp.linalg.qr/svd — all MXU-friendly dense ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnums=(1, 2))
def latms(key: Array, m: int, n: int, s: Array) -> Array:
    """A (m, n) = U diag(s) V^T with prescribed singular values s (len n).

    ≙ mtk::utils::latms (latms.hpp:7-13).
    """
    k_u, k_v = jax.random.split(key)
    gu = jax.random.normal(k_u, (m, n), jnp.float32)
    gv = jax.random.normal(k_v, (n, n), jnp.float32)
    u, _ = jnp.linalg.qr(gu)
    v, _ = jnp.linalg.qr(gv)
    us = u * s[None, :].astype(jnp.float32)
    return jnp.matmul(us, v.T, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


@jax.jit
def get_cond(a: Array) -> Array:
    """Condition number s_max / s_min (≙ mtk::utils::get_cond,
    latms.hpp:15-19, via gesvd latms.cu:128-170)."""
    s = jnp.linalg.svd(a.astype(jnp.float32), compute_uv=False)
    return s[0] / s[-1]


def rand_matrix_with_cond(key: Array, m: int, n: int, cond: float,
                          max_tries: int = 8) -> tuple[Array, float]:
    """Random (m, n) with measured condition number >= 0.9 * cond.

    ≙ get_rand_matrix_with_cond_number (test_cond.cu:20-76): singular values
    sampled uniformly in [1/sqrt(cond), 1] with extremes pinned so the target
    is hit, regenerating until measured/target >= 0.9 (test_cond.cu:45-60).
    """
    target = float(cond)
    for _ in range(max_tries):
        key, k_s, k_a = jax.random.split(key, 3)
        # interior singular values s_i ~ U(1/sqrt(cond), 1) following the
        # reference protocol (test_cond.cu:29-38), then pin s_0 = 1,
        # s_{n-1} = 1/cond so cond(A) = cond exactly in exact arithmetic.
        s = jax.random.uniform(k_s, (n,), jnp.float32,
                               minval=target ** -0.5, maxval=1.0)
        s = jnp.sort(s)[::-1]
        s = s.at[0].set(1.0).at[n - 1].set(1.0 / target)
        a = latms(k_a, m, n, s)
        measured = float(get_cond(a))
        if measured >= 0.9 * target:
            return a, measured
    return a, measured
