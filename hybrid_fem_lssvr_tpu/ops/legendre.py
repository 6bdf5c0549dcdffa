"""Legendre basis kernels: batched Vandermonde + derivative matrices.

TPU-native replacement for ``numpy.polynomial.legendre.Legendre`` as used by
the reference (``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:45,59,98``):
the reference constructs a ``Legendre`` object per SLSQP objective call and
evaluates ``u.deriv(2)`` at 12 points, thousands of times per element.  Here
the basis is materialised once as dense Vandermonde matrices ``V, V', V''``
on reference coordinates t in [-1, 1] via the three-term recurrences, so all
downstream work is matmuls (MXU) over static shapes.

Recurrences (k >= 1):
    (k+1) P_{k+1}(t) = (2k+1) t P_k(t) - k P_{k-1}(t)
    P'_{k+1}(t)  = P'_{k-1}(t)  + (2k+1) P_k(t)
    P''_{k+1}(t) = P''_{k-1}(t) + (2k+1) P'_k(t)

Domain mapping: an element [xmin, xmax] with h = xmax - xmin maps x -> t via
t = (2x - xmin - xmax)/h (numpy's ``Legendre(..., domain)`` convention), so
d/dx = (2/h) d/dt and d2/dx2 = (2/h)^2 d2/dt2 — the chain factors are applied
by callers where the element size enters.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def legendre_vandermonde(t: jnp.ndarray, M: int, num_derivs: int = 2):
    """Legendre Vandermonde matrices on reference coordinates.

    Args:
      t: array of evaluation points in [-1, 1], any shape ``S``.
      M: number of basis functions P_0..P_{M-1} (static).
      num_derivs: how many derivative matrices to return (0, 1 or 2).

    Returns:
      Tuple of ``num_derivs + 1`` arrays, each of shape ``S + (M,)``:
      (V, [V1, [V2]]) with V[..., k] = P_k(t), V1 = dP_k/dt, V2 = d2P_k/dt2.
    """
    if M < 1:
        raise ValueError(f"M must be >= 1, got {M}")
    t = jnp.asarray(t)
    one = jnp.ones_like(t)
    zero = jnp.zeros_like(t)

    P = [one]
    dP = [zero]
    d2P = [zero]
    if M > 1:
        P.append(t)
        dP.append(one)
        d2P.append(zero)
    for k in range(1, M - 1):
        P.append(((2 * k + 1) * t * P[k] - k * P[k - 1]) / (k + 1))
        dP.append(dP[k - 1] + (2 * k + 1) * P[k])
        d2P.append(d2P[k - 1] + (2 * k + 1) * dP[k])

    out = [jnp.stack(P, axis=-1)]
    if num_derivs >= 1:
        out.append(jnp.stack(dP, axis=-1))
    if num_derivs >= 2:
        out.append(jnp.stack(d2P, axis=-1))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _colloc_t(n_colloc: int) -> tuple:
    """Equispaced collocation points incl. endpoints on [-1, 1] (host-side).

    Mirrors the reference's per-element ``np.linspace(xmin, xmax, 12)``
    (``Hybrid-FEM-LSSVR.py:40``) mapped to reference coordinates — identical
    for every element, so it is computed once, statically.
    """
    import numpy as np

    return tuple(np.linspace(-1.0, 1.0, n_colloc).tolist())


def collocation_points(n_colloc: int, dtype=jnp.float32) -> jnp.ndarray:
    """Reference-coordinate collocation points, shape [n_colloc]."""
    return jnp.array(_colloc_t(n_colloc), dtype=dtype)


def collocation_vandermonde(M: int, n_colloc: int, dtype=jnp.float32):
    """(V, V1, V2) at the standard equispaced collocation points.

    Shapes [n_colloc, M]; shared by every element on any mesh (chain-rule
    factors (2/h)^d are applied by the operator assembly).
    """
    t = collocation_points(n_colloc, dtype=dtype)
    return legendre_vandermonde(t, M, num_derivs=2)


def vandermonde_host(t, M: int):
    """numpy float64 (V0, V1, V2) at arbitrary points t — the setup-time
    oracle used to precompute shared operators off-chip."""
    import numpy as np
    import numpy.polynomial.legendre as L

    t = np.asarray(t, np.float64)
    V = np.zeros((3, t.shape[0], M))
    for k in range(M):
        c = np.zeros(k + 1)
        c[k] = 1.0
        V[0, :, k] = L.legval(t, c)
        V[1, :, k] = L.legval(t, L.legder(c, 1)) if k >= 1 else 0.0
        V[2, :, k] = L.legval(t, L.legder(c, 2)) if k >= 2 else 0.0
    return V[0], V[1], V[2]


def collocation_vandermonde_host(M: int, n_colloc: int):
    """numpy float64 (V0, V1, V2) at the standard collocation points."""
    import numpy as np

    return vandermonde_host(np.linspace(-1.0, 1.0, n_colloc), M)


def evaluate_series(coeffs: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate u(t) = sum_k coeffs[..., k] P_k(t) at per-point coefficients.

    ``coeffs``: [..., M]; ``t``: [...] broadcast-compatible with coeffs' batch
    shape. Returns [...]. This is the batched replacement for the reference's
    ``Legendre.__call__`` (``Hybrid-FEM-LSSVR.py:193``).
    """
    M = coeffs.shape[-1]
    (V,) = legendre_vandermonde(t, M, num_derivs=0)
    return jnp.sum(V * coeffs, axis=-1)
