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


def bicgstab(apply_A: Callable, b: jnp.ndarray, x0=None, M_inv=None,
             tol: float = 1e-12, maxiter: int = 1000,
             dot_fn: Callable = None) -> CGResult:
    """Preconditioned BiCGStab (van der Vorst) for nonsymmetric/indefinite
    systems — the 2D coarse stage for advection (b . grad u) and Helmholtz
    (c < 0) operators, where CG's SPD requirement fails.

    Same matrix-free interface as :func:`cg`; ``M_inv`` acts as a right
    preconditioner applied to the search directions.  Breakdown of either
    inner product (rho or omega ~ 0) exits the loop with the best iterate so
    far — the caller observes it as a nonzero final residual."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M_inv is None:
        precond = lambda r: r
    elif callable(M_inv):
        precond = M_inv
    else:
        precond = lambda r: M_inv * r

    dot = dot_fn if dot_fn is not None else (lambda u, v: jnp.sum(u * v))

    dtype = b.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny * 1e3, dtype)
    r0 = b - apply_A(x0)
    rhat = r0  # fixed shadow residual
    bnorm = jnp.sqrt(dot(b, b)) + jnp.asarray(1e-30, dtype)

    one = jnp.asarray(1.0, dtype)
    state0 = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
              one, one, one, jnp.asarray(0, jnp.int32),
              jnp.asarray(False))

    def cond(state):
        x, r, p, v, rho, alpha, omega, k, broke = state
        return (jnp.sqrt(dot(r, r)) > tol * bnorm) & (k < maxiter) & ~broke

    def body(state):
        x, r, p, v, rho, alpha, omega, k, broke = state
        rho_new = dot(rhat, r)
        breakdown = (jnp.abs(rho_new) < tiny) | (jnp.abs(omega) < tiny)
        beta = jnp.where(breakdown, 0.0, (rho_new / rho) * (alpha / omega))
        p = r + beta * (p - omega * v)
        phat = precond(p)
        v = apply_A(phat)
        denom = dot(rhat, v)
        breakdown |= jnp.abs(denom) < tiny
        alpha = jnp.where(breakdown, 0.0, rho_new / denom)
        s = r - alpha * v
        shat = precond(s)
        t = apply_A(shat)
        tt = dot(t, t)
        omega_new = jnp.where(tt < tiny, 0.0, dot(t, s) / (tt + tiny))
        x = x + alpha * phat + omega_new * shat
        r = s - omega_new * t
        return (x, r, p, v, rho_new, alpha, omega_new, k + 1, breakdown)

    x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
    return CGResult(x=x, iters=k, residual=jnp.sqrt(dot(r, r)))
