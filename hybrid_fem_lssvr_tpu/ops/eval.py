"""Batched global evaluation of the per-element Legendre solution.

Replaces the reference's O(P*E) Python double loop with for-else clamping
(``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:184-211``): a single
``searchsorted`` locates every query point's element, coefficients are
gathered, and one fused Vandermonde-weighted reduction evaluates all points.
Points left of the first node use element 0 and points right of the last
node use the last element — exactly the reference's clamp semantics
(``:198-209``).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import legendre


def locate_elements(nodes: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Element index per query point, clamped to [0, E-1]. nodes: [N], x: [P]."""
    idx = jnp.searchsorted(nodes, x, side="right") - 1
    return jnp.clip(idx, 0, nodes.shape[0] - 2)


def evaluate(nodes: jnp.ndarray, coeffs: jnp.ndarray, x: jnp.ndarray):
    """u(x) for the piecewise-Legendre solution.

    nodes: [N] mesh nodes; coeffs: [N-1, M] per-element Legendre coefficients
    in numpy's domain-mapped convention; x: [P] query points. Returns [P].
    """
    e = locate_elements(nodes, x)
    xl = nodes[e]
    xr = nodes[e + 1]
    t = (2.0 * x - xl - xr) / (xr - xl)
    ce = coeffs[e]  # [P, M] gather fused with the reduction below by XLA
    return legendre.evaluate_series(ce, t)


def evaluate_uniform(x0, h, coeffs: jnp.ndarray, x: jnp.ndarray):
    """Uniform-mesh fast path: element lookup by index arithmetic instead of
    searchsorted (binary search is hostile to the TPU — measured 34x slower
    at 8.4M points over 1M elements: 1.45 s vs 43 ms)."""
    E = coeffs.shape[0]
    e = jnp.clip(((x - x0) / h).astype(jnp.int32), 0, E - 1)
    xl = x0 + e.astype(x.dtype) * h
    t = (2.0 * (x - xl)) / h - 1.0
    return legendre.evaluate_series(coeffs[e], t)


def evaluate_derivative(nodes, coeffs, x, order: int = 1):
    """d^order u/dx^order at x (order in {1, 2}); same conventions as above."""
    e = locate_elements(nodes, x)
    xl = nodes[e]
    xr = nodes[e + 1]
    h = xr - xl
    t = (2.0 * x - xl - xr) / h
    M = coeffs.shape[-1]
    mats = legendre.legendre_vandermonde(t, M, num_derivs=order)
    V = mats[order]
    scale = (2.0 / h) ** order
    return scale * jnp.sum(V * coeffs[e], axis=-1)
