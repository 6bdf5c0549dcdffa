"""jit-compiled 1D P1 FEM assembly into tridiagonal storage.

TPU-native replacement for the reference's scikit-fem pipeline
(``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:117-145``): ``MeshLine`` +
``ElementLineP1`` + form assembly + ``enforce`` + sparse solve.  All element
contributions are computed in one vectorised sweep (shapes [E, Q]) and
scattered into three diagonals with static slice-adds — no sparse formats,
no Python loops, everything fuses under jit.

Weak form assembled (trial u, test v):

    int a(x) u' v' + b(x) u' v + c(x) u v dx = int f(x) v dx

The reference assembles the *negated* Poisson form on both sides
(``:125-132``), which cancels; we assemble the standard positive form and
treat Dirichlet data as data (SURVEY.md section 3.2).  ``enforce``'s
semantics (``:137`` — overwrite boundary rows/cols with identity, zero rhs)
are the g_left = g_right = 0 case of ``apply_dirichlet``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def gauss_rule(order: int):
    """Gauss–Legendre nodes/weights on [-1, 1] (host-side static tables)."""
    t, w = np.polynomial.legendre.leggauss(order)
    return tuple(t.tolist()), tuple(w.tolist())


def assemble_p1(nodes, a_fn, b_fn, c_fn, f_fn, quad_order: int = 3):
    """Assemble the P1 stiffness + load on an arbitrary 1D mesh.

    Args:
      nodes: [N] strictly increasing mesh nodes.
      a_fn, b_fn, c_fn, f_fn: scalar coefficient/rhs callables of x (vmapped
        over quadrature points); pass ``None`` for identically-zero b/c.
      quad_order: Gauss points per element (3 is exact for the P1 mass term
        with smooth coefficients to high order).

    Returns:
      (sub, main, sup, rhs): tridiagonal diagonals in the ``ops.tridiag``
      convention (sub[0] == sup[-1] == 0) and the load vector, all [N].
    """
    dtype = nodes.dtype
    tq, wq = gauss_rule(quad_order)
    tq = jnp.array(tq, dtype)  # [Q]
    wq = jnp.array(wq, dtype)

    xl = nodes[:-1]  # [E]
    xr = nodes[1:]
    h = xr - xl
    # Quadrature points / weights per element: [E, Q]
    xq = 0.5 * (xl + xr)[:, None] + 0.5 * h[:, None] * tq[None, :]
    Wq = 0.5 * h[:, None] * wq[None, :]

    aq = a_fn(xq) * jnp.ones_like(xq) if a_fn is not None else jnp.zeros_like(xq)
    bq = b_fn(xq) * jnp.ones_like(xq) if b_fn is not None else None
    cq = c_fn(xq) * jnp.ones_like(xq) if c_fn is not None else None
    fq = f_fn(xq) * jnp.ones_like(xq)

    # P1 shape functions on the reference element: phi0 = (1-t)/2, phi1 = (1+t)/2
    phi0 = 0.5 * (1.0 - tq)[None, :]  # [1, Q]
    phi1 = 0.5 * (1.0 + tq)[None, :]
    dphi0 = -1.0 / h[:, None]  # [E, 1] broadcast over Q
    dphi1 = 1.0 / h[:, None]

    def K(phi_i, dphi_i, phi_j, dphi_j):
        term = aq * dphi_j * dphi_i
        if bq is not None:
            term = term + bq * dphi_j * phi_i
        if cq is not None:
            term = term + cq * phi_j * phi_i
        return jnp.sum(Wq * term, axis=1)  # [E]

    K00 = K(phi0, dphi0, phi0, dphi0)
    K01 = K(phi0, dphi0, phi1, dphi1)
    K10 = K(phi1, dphi1, phi0, dphi0)
    K11 = K(phi1, dphi1, phi1, dphi1)
    b0 = jnp.sum(Wq * fq * phi0, axis=1)
    b1 = jnp.sum(Wq * fq * phi1, axis=1)

    N = nodes.shape[0]
    main = jnp.zeros(N, dtype).at[:-1].add(K00).at[1:].add(K11)
    sup = jnp.zeros(N, dtype).at[:-1].add(K01)  # A[i, i+1]
    sub = jnp.zeros(N, dtype).at[1:].add(K10)  # A[i, i-1]
    rhs = jnp.zeros(N, dtype).at[:-1].add(b0).at[1:].add(b1)
    return sub, main, sup, rhs


def apply_dirichlet(sub, main, sup, rhs, g_left, g_right):
    """Impose u[0] = g_left, u[-1] = g_right by row/column elimination.

    Superset of the reference's homogeneous ``enforce`` (``:137``): boundary
    rows become identity, boundary columns are moved to the rhs, preserving
    symmetry of symmetric systems.
    """
    g_left = jnp.asarray(g_left, main.dtype)
    g_right = jnp.asarray(g_right, main.dtype)
    # Eliminate columns: interior neighbours of the boundary nodes.
    rhs = rhs.at[1].add(-sub[1] * g_left)
    rhs = rhs.at[-2].add(-sup[-2] * g_right)
    sub = sub.at[1].set(0.0)
    sup = sup.at[-2].set(0.0)
    # Identity rows at the boundary.
    main = main.at[0].set(1.0).at[-1].set(1.0)
    sup = sup.at[0].set(0.0)
    sub = sub.at[-1].set(0.0)
    rhs = rhs.at[0].set(g_left).at[-1].set(g_right)
    return sub, main, sup, rhs


def apply_bcs(sub, main, sup, rhs, problem):
    """Per-end boundary conditions (generalises ``apply_dirichlet``).

    Dirichlet ends use the same row/column elimination as
    ``apply_dirichlet``.  Neumann/Robin ends are *natural*: the assembled
    boundary row stays (it is the weak form tested against the half hat
    function), and the boundary term of -(a u')' integrated by parts,
    [a u'·n] v(end) with n the outward normal, substitutes the data
    a u'·n = g - alpha·u — so rhs[end] += g and the Robin alpha joins the
    boundary diagonal.  The advection term b u' is not integrated by
    parts (``assemble_p1``), so it contributes no boundary term.
    """
    dt = main.dtype
    if problem.bc_left == "dirichlet":
        g = jnp.asarray(problem.g_left, dt)
        rhs = rhs.at[1].add(-sub[1] * g)
        sub = sub.at[1].set(0.0)
        main = main.at[0].set(1.0)
        sup = sup.at[0].set(0.0)
        rhs = rhs.at[0].set(g)
    else:
        main = main.at[0].add(jnp.asarray(problem.robin_alpha_left, dt))
        rhs = rhs.at[0].add(jnp.asarray(problem.g_left, dt))
    if problem.bc_right == "dirichlet":
        g = jnp.asarray(problem.g_right, dt)
        rhs = rhs.at[-2].add(-sup[-2] * g)
        sup = sup.at[-2].set(0.0)
        main = main.at[-1].set(1.0)
        sub = sub.at[-1].set(0.0)
        rhs = rhs.at[-1].set(g)
    else:
        main = main.at[-1].add(jnp.asarray(problem.robin_alpha_right, dt))
        rhs = rhs.at[-1].add(jnp.asarray(problem.g_right, dt))
    return sub, main, sup, rhs


def element_contributions(nodes, a_fn, b_fn, c_fn, f_fn, quad_order: int = 3):
    """Per-element 2x2 stiffness blocks + 2-vector loads, unscattered.

    Returns (K [E,2,2], b [E,2]) — used by the distributed assembly path
    (``parallel/sharded.py``) where interface contributions are summed across
    devices via halo exchange before the scatter.
    """
    dtype = nodes.dtype
    tq, wq = gauss_rule(quad_order)
    tq = jnp.array(tq, dtype)
    wq = jnp.array(wq, dtype)
    xl, xr = nodes[:-1], nodes[1:]
    h = xr - xl
    xq = 0.5 * (xl + xr)[:, None] + 0.5 * h[:, None] * tq[None, :]
    Wq = 0.5 * h[:, None] * wq[None, :]
    aq = a_fn(xq) * jnp.ones_like(xq) if a_fn is not None else jnp.zeros_like(xq)
    bq = b_fn(xq) * jnp.ones_like(xq) if b_fn is not None else None
    cq = c_fn(xq) * jnp.ones_like(xq) if c_fn is not None else None
    fq = f_fn(xq) * jnp.ones_like(xq)
    phi = jnp.stack([0.5 * (1.0 - tq), 0.5 * (1.0 + tq)])  # [2, Q]
    dphi = jnp.stack([-1.0 / h, 1.0 / h], axis=1)[:, :, None]  # [E, 2, 1]
    phiE = jnp.broadcast_to(phi[None], (h.shape[0], 2, tq.shape[0]))
    term = aq[:, None, None, :] * dphi[:, None, :, :] * dphi[:, :, None, :]
    if bq is not None:
        term = term + bq[:, None, None, :] * dphi[:, None, :, :] * phiE[:, :, None, :]
    if cq is not None:
        term = term + cq[:, None, None, :] * phiE[:, None, :, :] * phiE[:, :, None, :]
    K = jnp.sum(Wq[:, None, None, :] * term, axis=-1)  # [E, 2, 2] (i test, j trial)
    bvec = jnp.sum(Wq[:, None, :] * fq[:, None, :] * phiE, axis=-1)  # [E, 2]
    return K, bvec
