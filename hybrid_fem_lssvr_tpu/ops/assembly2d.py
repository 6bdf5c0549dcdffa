"""Matrix-free Q1 FEM on structured quad meshes (BASELINE.json config 5).

No sparse matrix is ever formed: the stiffness operator is applied
gather -> per-element 4x4 -> scatter-add over the node grid, which XLA fuses
into a stencil-like kernel — the idiomatic TPU formulation (contrast the
reference's scipy sparse assembly, ``Hybrid-FEM-LSSVR.py:135-138``).

Element/node layout: nodes u[ny+1, nx+1] on a uniform grid; element (j, i)
spans x in [x_i, x_{i+1}], y in [y_j, y_{j+1}].  Corner order within an
element: 00=(y_j,x_i), 10=(y_j,x_{i+1}), 01=(y_{j+1},x_i), 11=(y_{j+1},x_{i+1}).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .assembly import gauss_rule


@functools.lru_cache(maxsize=None)
def q1_local_stiffness(hx: float, hy: float, quad_order: int = 2):
    """4x4 local Poisson stiffness for a rectangular Q1 element (host-side
    numpy float64, cached per element size)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    K = np.zeros((4, 4))
    for a, (xi, wx) in enumerate(zip(t, w)):
        for b, (eta, wy) in enumerate(zip(t, w)):
            # shape funcs: N = [ (1-xi)(1-eta), (1+xi)(1-eta),
            #                    (1-xi)(1+eta), (1+xi)(1+eta) ] / 4
            dN_dxi = 0.25 * np.array([-(1 - eta), (1 - eta),
                                      -(1 + eta), (1 + eta)])
            dN_deta = 0.25 * np.array([-(1 - xi), -(1 + xi),
                                       (1 - xi), (1 + xi)])
            dN_dx = dN_dxi * (2.0 / hx)
            dN_dy = dN_deta * (2.0 / hy)
            jac = (hx / 2) * (hy / 2)
            K += wx * wy * jac * (np.outer(dN_dx, dN_dx)
                                  + np.outer(dN_dy, dN_dy))
    return K


def _q1_shape(xi, eta):
    """Q1 shape functions and reference-space gradients at one point."""
    N = 0.25 * np.array([(1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
                         (1 - xi) * (1 + eta), (1 + xi) * (1 + eta)])
    dN_dxi = 0.25 * np.array([-(1 - eta), (1 - eta), -(1 + eta), (1 + eta)])
    dN_deta = 0.25 * np.array([-(1 - xi), -(1 + xi), (1 - xi), (1 + xi)])
    return N, dN_dxi, dN_deta


@functools.lru_cache(maxsize=None)
def q1_local_mass(hx: float, hy: float, quad_order: int = 2):
    """4x4 local mass matrix int N_a N_b for a rectangular Q1 element
    (host-side numpy float64; 2x2 Gauss is exact for the bilinear product)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    Mm = np.zeros((4, 4))
    jac = (hx / 2) * (hy / 2)
    for xi, wx in zip(t, w):
        for eta, wy in zip(t, w):
            N, _, _ = _q1_shape(xi, eta)
            Mm += wx * wy * jac * np.outer(N, N)
    return Mm


@functools.lru_cache(maxsize=None)
def q1_local_convection(hx: float, hy: float, bx: float, by: float,
                        quad_order: int = 2):
    """4x4 local convection matrix int N_a (b . grad N_b) for constant
    advection velocity b = (bx, by) (nonsymmetric; host-side numpy f64)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    Cm = np.zeros((4, 4))
    jac = (hx / 2) * (hy / 2)
    for xi, wx in zip(t, w):
        for eta, wy in zip(t, w):
            N, dN_dxi, dN_deta = _q1_shape(xi, eta)
            conv = bx * dN_dxi * (2.0 / hx) + by * dN_deta * (2.0 / hy)
            Cm += wx * wy * jac * np.outer(N, conv)
    return Cm


def q1_local_operator(hx: float, hy: float, a0: float = 1.0, c: float = 0.0,
                      bx: float = 0.0, by: float = 0.0,
                      quad_order: int = 2):
    """Combined 4x4 local matrix for L u = -a0 Lap u + b . grad u + c u.

    Defaults reproduce the pure Poisson stiffness.  Shared by every element
    of a uniform mesh, so the matrix-free ``apply_stiffness`` (which is
    operator-agnostic: any 4x4 local matrix) applies the full operator."""
    A = a0 * q1_local_stiffness(hx, hy, quad_order)
    if c != 0.0:
        A = A + c * q1_local_mass(hx, hy, quad_order)
    if bx != 0.0 or by != 0.0:
        A = A + q1_local_convection(hx, hy, bx, by, quad_order)
    return A


def q1_numerov_locals(hx: float, hy: float, a0: float = 1.0, c: float = 0.0):
    """Tensor-Numerov local 4x4s (K_A, K_M) for -a0 Lap u + c u on a uniform
    grid: the Q1 local operator is kron(y-part, x-part), so the 1D Numerov
    mass (h/12)·[[5,1],[1,5]] tensorises directly.  The assembled pair gives
    the compact O(h^4) scheme A u = M f_nodal (per-axis symbol
    kx^2/mu(kx) + ky^2/mu(ky) = kx^2 + ky^2 + O(h^4)); shared by the
    transient marches (``models/transient.py``) and the steady
    ``coarse='compact'`` option (``models/hybrid2d.py``)."""
    K1 = lambda h: (1.0 / h) * np.array([[1.0, -1.0], [-1.0, 1.0]])  # noqa: E731,E501
    M1n = lambda h: (h / 12.0) * np.array([[5.0, 1.0], [1.0, 5.0]])  # noqa: E731,E501
    K_M = np.kron(M1n(hy), M1n(hx))
    K_A = (a0 * (np.kron(M1n(hy), K1(hx)) + np.kron(K1(hy), M1n(hx)))
           + c * K_M)
    return K_A, K_M


@functools.lru_cache(maxsize=None)
def q1_varcoeff_parts(hx: float, hy: float, quad_order: int = 2):
    """Per-quadrature-point gradient-product matrices for variable-
    coefficient stiffness: S[q, a, b] = w_q jac (grad N_a . grad N_b)(xi_q),
    so the element matrix for -div(a grad u) is K_e = sum_q a(x_q^e) S[q].
    Also returns the reference offsets (dxq, dyq) [Q] of the quadrature
    points from the element's lower-left corner (host numpy f64)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    jac = (hx / 2) * (hy / 2)
    S, dxq, dyq = [], [], []
    for xi, wx in zip(t, w):
        for eta, wy in zip(t, w):
            _, dN_dxi, dN_deta = _q1_shape(xi, eta)
            dN_dx = dN_dxi * (2.0 / hx)
            dN_dy = dN_deta * (2.0 / hy)
            S.append(wx * wy * jac * (np.outer(dN_dx, dN_dx)
                                      + np.outer(dN_dy, dN_dy)))
            dxq.append((xi + 1.0) * 0.5 * hx)
            dyq.append((eta + 1.0) * 0.5 * hy)
    return np.stack(S), np.array(dxq), np.array(dyq)


@functools.lru_cache(maxsize=None)
def q1_reference_parts(quad_order: int = 2):
    """Reference-element 4x4 operator parts over [-1, 1]^2 (host f64):
    ``Cxx`` = int dN/dxi dN/dxi, ``Cyy`` = int dN/deta dN/deta,
    ``Mhat`` = int N N, ``Chatx`` = int N dN/dxi, ``Chaty`` = int N dN/deta.
    The physical local operator on an hx x hy rectangle is the exact
    tensor-product scaling

        K_e = a0 (hy/hx) Cxx + a0 (hx/hy) Cyy + c (hx hy / 4) Mhat
              + bx (hy/2) Chatx + by (hx/2) Chaty

    (identity asserted against ``q1_local_operator`` in
    tests/test_graded2d.py) — per-element scalars, so GRADED tensor-product
    meshes assemble matrix-free through ``apply_stiffness_var`` with these
    as the S_q stack."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    Cxx = np.zeros((4, 4))
    Cyy = np.zeros((4, 4))
    Mh = np.zeros((4, 4))
    Cx = np.zeros((4, 4))
    Cy = np.zeros((4, 4))
    for xi, wx in zip(t, w):
        for eta, wy in zip(t, w):
            N, dN_dxi, dN_deta = _q1_shape(xi, eta)
            Cxx += wx * wy * np.outer(dN_dxi, dN_dxi)
            Cyy += wx * wy * np.outer(dN_deta, dN_deta)
            Mh += wx * wy * np.outer(N, N)
            Cx += wx * wy * np.outer(N, dN_dxi)
            Cy += wx * wy * np.outer(N, dN_deta)
    return Cxx, Cyy, Mh, Cx, Cy


@functools.lru_cache(maxsize=None)
def q1_reference_quad_parts(quad_order: int = 2):
    """Per-quadrature-point reference gradient products for graded
    variable-coefficient stiffness: ``Sxx[q] = w_q dN/dxi dN/dxi(xi_q)``
    and ``Syy[q]`` likewise, plus the reference coordinates ``tq [Q, 2]``
    ((xi, eta)) of the points.  The physical per-element matrix for
    -div(a grad u) on an hx x hy rectangle is
    ``K_e = sum_q a(x_q^e) [ (hy/hx) Sxx[q] + (hx/hy) Syy[q] ]``."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    Sxx, Syy, tq = [], [], []
    for xi, wx in zip(t, w):
        for eta, wy in zip(t, w):
            _, dN_dxi, dN_deta = _q1_shape(xi, eta)
            Sxx.append(wx * wy * np.outer(dN_dxi, dN_dxi))
            Syy.append(wx * wy * np.outer(dN_deta, dN_deta))
            tq.append((xi, eta))
    return np.stack(Sxx), np.stack(Syy), np.array(tq)


def coeff_maps(xs: jnp.ndarray, ys: jnp.ndarray, a_fn, dxq, dyq):
    """Sample a(x, y) at each element's quadrature points: [Q, ny, nx]."""
    dtype = xs.dtype
    xq = xs[:-1][None, None, :] + jnp.asarray(dxq, dtype)[:, None, None]
    yq = ys[:-1][None, :, None] + jnp.asarray(dyq, dtype)[:, None, None]
    ny, nx = ys.shape[0] - 1, xs.shape[0] - 1
    return a_fn(xq, yq) * jnp.ones((dxq.shape[0], ny, nx), dtype)


def apply_stiffness_var(u: jnp.ndarray, Sq: jnp.ndarray,
                        a_maps: jnp.ndarray) -> jnp.ndarray:
    """y = A u for -div(a grad u): per-element K_e = sum_q a_q S_q with
    a_maps [Q, ny, nx] the coefficient sampled per element per quadrature
    point (``coeff_maps``).  Same gather -> 4x4 -> scatter structure as
    ``apply_stiffness``, with the coefficient map as a per-element weight."""
    c = _corners(u)  # 4 x [ny, nx]
    Q = Sq.shape[0]
    r = []
    for a in range(4):
        acc = 0.0
        for q in range(Q):
            sq = sum(Sq[q, a, b] * c[b] for b in range(4))
            acc = acc + a_maps[q] * sq
        r.append(acc)
    y = jnp.zeros_like(u)
    y = y.at[:-1, :-1].add(r[0])
    y = y.at[:-1, 1:].add(r[1])
    y = y.at[1:, :-1].add(r[2])
    y = y.at[1:, 1:].add(r[3])
    return y


def stiffness_var_diag(shape, Sq: jnp.ndarray, a_maps: jnp.ndarray,
                       dtype) -> jnp.ndarray:
    """diag(A) for the variable-coefficient stiffness (Jacobi)."""
    ny1, nx1 = shape
    d = jnp.zeros((ny1, nx1), dtype)
    Ke_diag = [
        sum(a_maps[q] * Sq[q, a, a] for q in range(Sq.shape[0]))
        for a in range(4)
    ]
    d = d.at[:-1, :-1].add(Ke_diag[0])
    d = d.at[:-1, 1:].add(Ke_diag[1])
    d = d.at[1:, :-1].add(Ke_diag[2])
    d = d.at[1:, 1:].add(Ke_diag[3])
    return d


def _corners(u):
    """Gather element corner values from the node grid: 4 x [ny, nx]."""
    return (u[:-1, :-1], u[:-1, 1:], u[1:, :-1], u[1:, 1:])


def apply_stiffness(u: jnp.ndarray, K_loc: jnp.ndarray) -> jnp.ndarray:
    """y = A u with the shared 4x4 local stiffness (uniform mesh, constant
    coefficients).  u: [ny+1, nx+1] node grid."""
    c = _corners(u)  # each [ny, nx]
    r = [sum(K_loc[a, b] * c[b] for b in range(4)) for a in range(4)]
    y = jnp.zeros_like(u)
    y = y.at[:-1, :-1].add(r[0])
    y = y.at[:-1, 1:].add(r[1])
    y = y.at[1:, :-1].add(r[2])
    y = y.at[1:, 1:].add(r[3])
    return y


def stiffness_diag(shape, K_loc: jnp.ndarray, dtype) -> jnp.ndarray:
    """diag(A) on the node grid (Jacobi preconditioner)."""
    ny1, nx1 = shape
    d = jnp.zeros((ny1, nx1), dtype)
    ones = jnp.ones((ny1 - 1, nx1 - 1), dtype)
    d = d.at[:-1, :-1].add(K_loc[0, 0] * ones)
    d = d.at[:-1, 1:].add(K_loc[1, 1] * ones)
    d = d.at[1:, :-1].add(K_loc[2, 2] * ones)
    d = d.at[1:, 1:].add(K_loc[3, 3] * ones)
    return d


def assemble_load(xs: jnp.ndarray, ys: jnp.ndarray, f_fn,
                  quad_order: int = 2) -> jnp.ndarray:
    """Load vector on the node grid: b_i = int f N_i, 2x2 Gauss per element.

    xs: [nx+1], ys: [ny+1] node coordinates (uniform spacing assumed for the
    jacobian but computed per element for generality)."""
    dtype = xs.dtype
    t, w = gauss_rule(quad_order)
    t = jnp.array(t, dtype)
    w = jnp.array(w, dtype)
    hx = xs[1:] - xs[:-1]  # [nx]
    hy = ys[1:] - ys[:-1]  # [ny]
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    # quadrature coordinates: xq [nx, Qx], yq [ny, Qy]
    xq = xm[:, None] + 0.5 * hx[:, None] * t[None, :]
    yq = ym[:, None] + 0.5 * hy[:, None] * t[None, :]
    # f on the tensor grid: [ny, Qy, nx, Qx]
    F = f_fn(xq[None, None, :, :], yq[:, :, None, None])
    F = F * jnp.ones((yq.shape[0], yq.shape[1], xq.shape[0], xq.shape[1]),
                     dtype)
    jac = (hy[:, None, None, None] / 2) * (hx[None, None, :, None] / 2)
    W = w[None, :, None, None] * w[None, None, None, :] * jac
    # 1D hat factors at quadrature points
    lo = 0.5 * (1.0 - t)  # weight toward the lower corner
    hi = 0.5 * (1.0 + t)
    b = jnp.zeros((ys.shape[0], xs.shape[0]), dtype)
    FW = F * W
    ny, nx = hy.shape[0], hx.shape[0]
    for (cy, gy) in ((0, lo), (1, hi)):
        for (cx, gx) in ((0, lo), (1, hi)):
            contrib = jnp.einsum("yqxp,q,p->yx", FW, gy, gx)
            b = b.at[cy:cy + ny, cx:cx + nx].add(contrib)
    return b
