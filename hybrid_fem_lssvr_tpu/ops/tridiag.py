"""Tridiagonal solvers: Thomas (scan) and parallel cyclic reduction (PCR).

TPU-native replacement for the reference's sparse direct solve
(``scipy``'s SuperLU reached via ``Hybrid-FEM-LSSVR.py:138``): 1D P1 FEM
systems are tridiagonal, so a banded solve is exact.  Two algorithms:

* ``thomas``: classic O(N) forward/backward elimination expressed as two
  ``lax.scan``s — numerically the reference algorithm, sequential depth N.
  Good for modest N and as the local solver inside the distributed SPIKE
  scheme (``parallel/sharded.py``).
* ``pcr``: parallel cyclic reduction — log2(N) fully-vectorised sweeps, each
  an elementwise update over the whole system (VPU-friendly, no sequential
  dependency), the idiomatic TPU formulation for large N.

Conventions: a system is given by three length-N diagonals
``a`` (sub, a[0] == 0), ``b`` (main), ``c`` (super, c[-1] == 0) and a right
hand side ``rhs`` of shape [N] or [N, R] (R simultaneous right-hand sides).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ensure_2d(rhs):
    if rhs.ndim == 1:
        return rhs[:, None], True
    return rhs, False


def thomas(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, rhs: jnp.ndarray):
    """Thomas algorithm via two scans. rhs: [N] or [N, R] -> same shape."""
    rhs2, squeeze = _ensure_2d(rhs)
    N = b.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        ai, bi, ci, ri = inp
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (ri - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros((), b.dtype), jnp.zeros((rhs2.shape[1],), b.dtype))
    _, (cp, dp) = jax.lax.scan(fwd, init, (a, b, c, rhs2))

    def bwd(x_next, inp):
        cpi, dpi = inp
        x = dpi - cpi[None] * x_next
        return x, x

    _, xs = jax.lax.scan(
        bwd, jnp.zeros((rhs2.shape[1],), b.dtype), (cp, dp), reverse=True
    )
    return xs[:, 0] if squeeze else xs


def pcr(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, rhs: jnp.ndarray):
    """Parallel cyclic reduction: log2(N) vectorised elimination sweeps.

    Out-of-range neighbours are treated as identity rows (b=1, a=c=rhs=0),
    which leaves boundary equations untouched — no power-of-two padding of
    the system itself is needed.
    """
    rhs2, squeeze = _ensure_2d(rhs)
    N = b.shape[0]
    n_steps = max(1, (N - 1).bit_length())

    def shift_down(x, s, fill):  # x[i - s]
        pad = [(s, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)[:N]

    def shift_up(x, s, fill):  # x[i + s]
        pad = [(0, s)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)[s:]

    for step in range(n_steps):
        s = 1 << step
        a_m, b_m, c_m = (
            shift_down(a, s, 0.0),
            shift_down(b, s, 1.0),
            shift_down(c, s, 0.0),
        )
        a_p, b_p, c_p = (
            shift_up(a, s, 0.0),
            shift_up(b, s, 1.0),
            shift_up(c, s, 0.0),
        )
        r_m = shift_down(rhs2, s, 0.0)
        r_p = shift_up(rhs2, s, 0.0)

        alpha = -a / b_m
        beta = -c / b_p
        b = b + alpha * c_m + beta * a_p
        rhs2 = rhs2 + alpha[:, None] * r_m + beta[:, None] * r_p
        a = alpha * a_m
        c = beta * c_p

    x = rhs2 / b[:, None]
    return x[:, 0] if squeeze else x


def solve(a, b, c, rhs, method: str = "thomas"):
    """Dispatch: 'thomas' | 'pcr' | 'dense' (dense is a small-N test oracle)."""
    if method == "thomas":
        return thomas(a, b, c, rhs)
    if method == "pcr":
        return pcr(a, b, c, rhs)
    if method == "dense":
        A = to_dense(a, b, c)
        return jnp.linalg.solve(A, rhs)
    raise ValueError(f"unknown tridiagonal method: {method}")


def to_dense(a, b, c) -> jnp.ndarray:
    """Materialise the tridiagonal system as a dense [N, N] matrix (tests)."""
    N = b.shape[0]
    return (
        jnp.diag(b)
        + jnp.diag(a[1:], -1)
        + jnp.diag(c[:-1], 1)
    )


def matvec(a, b, c, x) -> jnp.ndarray:
    """y = A x for tridiagonal A; x: [N] or [N, R]."""
    x2, squeeze = _ensure_2d(x)
    up = jnp.pad(x2[1:], ((0, 1), (0, 0)))
    dn = jnp.pad(x2[:-1], ((1, 0), (0, 0)))
    y = b[:, None] * x2 + c[:, None] * up + a[:, None] * dn
    return y[:, 0] if squeeze else y
