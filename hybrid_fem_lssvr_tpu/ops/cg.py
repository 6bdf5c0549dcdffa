"""Preconditioned conjugate gradients for the matrix-free 2D FEM solve.

Replaces the reference's sparse direct solve (``Hybrid-FEM-LSSVR.py:138``)
in the 2D regime where banded elimination no longer applies.  Pure
``lax.while_loop`` — compiler-friendly control flow, no host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual: jnp.ndarray  # final ||r||_2


def cg(apply_A: Callable, b: jnp.ndarray, x0=None, M_inv=None,
       tol: float = 1e-12, maxiter: int = 1000,
       dot_fn: Callable = None) -> CGResult:
    """Solve A x = b; A SPD via ``apply_A``; optional diagonal preconditioner
    ``M_inv`` (elementwise inverse-diagonal array or callable).

    ``dot_fn`` overrides the inner product — the distributed slab solve
    passes an ownership-masked, ``psum``-reduced dot so duplicated interface
    rows are counted once across devices."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M_inv is None:
        precond = lambda r: r
    elif callable(M_inv):
        precond = M_inv
    else:
        precond = lambda r: M_inv * r

    dot = dot_fn if dot_fn is not None else (lambda u, v: jnp.sum(u * v))

    r0 = b - apply_A(x0)
    z0 = precond(r0)
    p0 = z0
    gamma0 = dot(r0, z0)
    bnorm = jnp.sqrt(dot(b, b)) + jnp.asarray(1e-30, b.dtype)

    def cond(state):
        x, r, p, gamma, k = state
        return (jnp.sqrt(dot(r, r)) > tol * bnorm) & (k < maxiter)

    def body(state):
        x, r, p, gamma, k = state
        Ap = apply_A(p)
        alpha = gamma / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        gamma_new = dot(r, z)
        beta = gamma_new / gamma
        p = z + beta * p
        return (x, r, p, gamma_new, k + 1)

    x, r, _, _, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, gamma0, jnp.asarray(0, jnp.int32))
    )
    return CGResult(x=x, iters=k, residual=jnp.sqrt(dot(r, r)))
