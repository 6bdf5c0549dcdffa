"""Matrix-free Q1 FEM on structured hex meshes (3D tensor extension).

The 3D analog of ``assembly2d``: no sparse matrix is ever formed — the
stiffness operator is applied gather -> shared 8x8 local matrix ->
scatter-add over the node grid, which XLA fuses into a stencil kernel
(contrast the reference's scipy sparse assembly,
``Hybrid-FEM-LSSVR.py:135-138``; the reference itself is 1D-only — 3D is
a beyond-reference capability on the same architecture).

Element/node layout: nodes u[nz+1, ny+1, nx+1]; element (k, j, i) spans
x in [x_i, x_{i+1}], y in [y_j, y_{j+1}], z in [z_k, z_{k+1}].  Corner
order within an element: a = 4*cz + 2*cy + cx (x fastest), matching the
tensor (kron) construction of the local operators.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .assembly import gauss_rule


def _k1(h):
    """1D P1 stiffness int N' N' on [0, h]."""
    return (1.0 / h) * np.array([[1.0, -1.0], [-1.0, 1.0]])


def _m1(h):
    """1D P1 mass int N N on [0, h]."""
    return (h / 6.0) * np.array([[2.0, 1.0], [1.0, 2.0]])


def _c1():
    """1D P1 convection int N N' on [0, h] (h-independent)."""
    return 0.5 * np.array([[-1.0, 1.0], [-1.0, 1.0]])


@functools.lru_cache(maxsize=None)
def q1_local_operator_3d(hx: float, hy: float, hz: float, a0: float = 1.0,
                         c: float = 0.0, bx: float = 0.0, by: float = 0.0,
                         bz: float = 0.0):
    """Shared 8x8 local matrix for L u = -a0 Lap u + b . grad u + c u on a
    hex element — EXACT tensor products of the 1D P1 matrices (trilinear
    shape functions separate, so no quadrature loop is needed; identity
    against a quadrature oracle asserted in tests/test_poisson3d.py).
    Host numpy f64, cached per element size."""
    kx, mx = _k1(hx), _m1(hx)
    ky, my = _k1(hy), _m1(hy)
    kz, mz = _k1(hz), _m1(hz)

    def t3(Az, Ay, Ax):
        return np.kron(Az, np.kron(Ay, Ax))

    K = a0 * (t3(mz, my, kx) + t3(mz, ky, mx) + t3(kz, my, mx))
    if c != 0.0:
        K = K + c * t3(mz, my, mx)
    cv = _c1()
    if bx != 0.0:
        K = K + bx * t3(mz, my, cv)
    if by != 0.0:
        K = K + by * t3(mz, cv, mx)
    if bz != 0.0:
        K = K + bz * t3(cv, my, mx)
    return K


def q1_numerov_locals_3d(hx: float, hy: float, hz: float, a0: float = 1.0,
                         c: float = 0.0):
    """Tensor-Numerov local 8x8s (K_A, K_M) for -a0 Lap u + c u on a hex:
    the 1D Numerov mass (h/12)·[[5,1],[1,5]] tensorises exactly like the
    2D pair (``assembly2d.q1_numerov_locals``).  The assembled scheme
    A u = M f_nodal is O(h^4) at the nodes; shared by the 3D transient
    marches (``models/transient.py::_locals_3d``) and the steady
    ``Solver3DConfig(coarse='compact')`` option."""
    m1n = lambda h: (h / 12.0) * np.array([[5.0, 1.0], [1.0, 5.0]])  # noqa: E731,E501

    def t3(Az, Ay, Ax):
        return np.kron(Az, np.kron(Ay, Ax))

    mz, my, mx = m1n(hz), m1n(hy), m1n(hx)
    K_M = t3(mz, my, mx)
    K_A = (a0 * (t3(mz, my, _k1(hx)) + t3(mz, _k1(hy), mx)
                 + t3(_k1(hz), my, mx)) + c * K_M)
    return K_A, K_M


def _q1_shape_3d(xi, eta, zeta):
    """Q1 hex shape functions and reference-space gradients at one point,
    corner order a = 4cz + 2cy + cx (x fastest)."""
    N, dxi, deta, dzeta = [], [], [], []
    for cz in (-1.0, 1.0):
        for cy in (-1.0, 1.0):
            for cx in (-1.0, 1.0):
                N.append(0.125 * (1 + cx * xi) * (1 + cy * eta)
                         * (1 + cz * zeta))
                dxi.append(0.125 * cx * (1 + cy * eta) * (1 + cz * zeta))
                deta.append(0.125 * (1 + cx * xi) * cy * (1 + cz * zeta))
                dzeta.append(0.125 * (1 + cx * xi) * (1 + cy * eta) * cz)
    return (np.array(N), np.array(dxi), np.array(deta), np.array(dzeta))


@functools.lru_cache(maxsize=None)
def q1_varcoeff_parts_3d(hx: float, hy: float, hz: float,
                         quad_order: int = 2):
    """Per-quadrature-point gradient-product matrices for variable-
    coefficient stiffness on hexes: S[q, a, b] = w_q jac
    (grad N_a . grad N_b)(xi_q), so the element matrix for
    -div(a grad u) is K_e = sum_q a(x_q^e) S[q] (3D lift of
    ``assembly2d.q1_varcoeff_parts``).  Also returns the reference
    offsets (dxq, dyq, dzq) [Q] of the quadrature points from the
    element's lower corner (host numpy f64)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    jac = (hx / 2) * (hy / 2) * (hz / 2)
    S, dxq, dyq, dzq = [], [], [], []
    for zeta, wz in zip(t, w):
        for eta, wy in zip(t, w):
            for xi, wx in zip(t, w):
                _, dN_dxi, dN_deta, dN_dzeta = _q1_shape_3d(xi, eta, zeta)
                dN_dx = dN_dxi * (2.0 / hx)
                dN_dy = dN_deta * (2.0 / hy)
                dN_dz = dN_dzeta * (2.0 / hz)
                S.append(wx * wy * wz * jac * (np.outer(dN_dx, dN_dx)
                                               + np.outer(dN_dy, dN_dy)
                                               + np.outer(dN_dz, dN_dz)))
                dxq.append((xi + 1.0) * 0.5 * hx)
                dyq.append((eta + 1.0) * 0.5 * hy)
                dzq.append((zeta + 1.0) * 0.5 * hz)
    return np.stack(S), np.array(dxq), np.array(dyq), np.array(dzq)


@functools.lru_cache(maxsize=None)
def q1_reference_parts_3d(quad_order: int = 2):
    """Reference-element 8x8 operator parts over [-1, 1]^3 (host f64):
    ``Cxx`` = int dN/dxi dN/dxi (and Cyy/Czz per axis), ``Mh`` = int N N,
    ``Chx/Chy/Chz`` = int N dN/daxis.  The physical local operator on an
    hx x hy x hz hex is the exact per-element-scalar combination

        K_e = a0 [ (hy hz / 2hx) Cxx + (hx hz / 2hy) Cyy
                   + (hx hy / 2hz) Czz ] + c (hx hy hz / 8) Mh
              + bx (hy hz / 4) Chx + by (hx hz / 4) Chy
              + bz (hx hy / 4) Chz

    (identity against ``q1_local_operator_3d`` asserted in
    tests/test_graded3d.py) — so GRADED tensor-product hex meshes assemble
    matrix-free through ``apply_stiffness_var_3d`` with these as the S_q
    stack and the geometric scalars as the coefficient maps (the 3D lift
    of ``assembly2d.q1_reference_parts``)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    Cxx = np.zeros((8, 8))
    Cyy = np.zeros((8, 8))
    Czz = np.zeros((8, 8))
    Mh = np.zeros((8, 8))
    Chx = np.zeros((8, 8))
    Chy = np.zeros((8, 8))
    Chz = np.zeros((8, 8))
    for zeta, wz in zip(t, w):
        for eta, wy in zip(t, w):
            for xi, wx in zip(t, w):
                N, dxi, deta, dzeta = _q1_shape_3d(xi, eta, zeta)
                w3 = wx * wy * wz
                Cxx += w3 * np.outer(dxi, dxi)
                Cyy += w3 * np.outer(deta, deta)
                Czz += w3 * np.outer(dzeta, dzeta)
                Mh += w3 * np.outer(N, N)
                Chx += w3 * np.outer(N, dxi)
                Chy += w3 * np.outer(N, deta)
                Chz += w3 * np.outer(N, dzeta)
    return Cxx, Cyy, Czz, Mh, Chx, Chy, Chz


@functools.lru_cache(maxsize=None)
def q1_reference_quad_parts_3d(quad_order: int = 2):
    """Per-quadrature-point reference gradient products for graded
    variable-coefficient hex stiffness: ``Sxx[q] = w_q dN/dxi dN/dxi``
    (and Syy/Szz per axis) plus the reference coordinates ``tq [Q, 3]``
    ((xi, eta, zeta)).  The physical per-element matrix for
    -div(a grad u) on an hx x hy x hz hex is
    ``K_e = sum_q a(x_q^e) [ (hy hz / 2hx) Sxx[q] + (hx hz / 2hy) Syy[q]
    + (hx hy / 2hz) Szz[q] ]`` (3D lift of
    ``assembly2d.q1_reference_quad_parts``)."""
    t, w = gauss_rule(quad_order)
    t, w = np.array(t), np.array(w)
    Sxx, Syy, Szz, tq = [], [], [], []
    for zeta, wz in zip(t, w):
        for eta, wy in zip(t, w):
            for xi, wx in zip(t, w):
                _, dxi, deta, dzeta = _q1_shape_3d(xi, eta, zeta)
                w3 = wx * wy * wz
                Sxx.append(w3 * np.outer(dxi, dxi))
                Syy.append(w3 * np.outer(deta, deta))
                Szz.append(w3 * np.outer(dzeta, dzeta))
                tq.append((xi, eta, zeta))
    return np.stack(Sxx), np.stack(Syy), np.stack(Szz), np.array(tq)


def coeff_maps_3d(xs, ys, zs, a_fn, dxq, dyq, dzq):
    """Sample a(x, y, z) at each element's quadrature points:
    [Q, nz, ny, nx]."""
    dtype = xs.dtype
    xq = xs[:-1][None, None, None, :] + jnp.asarray(dxq, dtype)[:, None,
                                                                None, None]
    yq = ys[:-1][None, None, :, None] + jnp.asarray(dyq, dtype)[:, None,
                                                                None, None]
    zq = zs[:-1][None, :, None, None] + jnp.asarray(dzq, dtype)[:, None,
                                                                None, None]
    nz, ny, nx = zs.shape[0] - 1, ys.shape[0] - 1, xs.shape[0] - 1
    return a_fn(xq, yq, zq) * jnp.ones((dxq.shape[0], nz, ny, nx), dtype)


def apply_stiffness_var_3d(u: jnp.ndarray, Sq: jnp.ndarray,
                           a_maps: jnp.ndarray) -> jnp.ndarray:
    """y = A u for -div(a grad u): per-element K_e = sum_q a_q S_q with
    a_maps [Q, nz, ny, nx] from ``coeff_maps_3d``.  Same gather -> 8x8 ->
    scatter structure as ``apply_stiffness_3d`` with the coefficient map
    as a per-element weight."""
    cs = _corners_3d(u)
    Q = Sq.shape[0]
    r = []
    for a in range(8):
        acc = 0.0
        for q in range(Q):
            sq = sum(Sq[q, a, b] * cs[b] for b in range(8))
            acc = acc + a_maps[q] * sq
        r.append(acc)
    y = jnp.zeros_like(u)
    sl = (slice(None, -1), slice(1, None))
    a = 0
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                y = y.at[sl[cz], sl[cy], sl[cx]].add(r[a])
                a += 1
    return y


def stiffness_var_diag_3d(shape, Sq: jnp.ndarray, a_maps: jnp.ndarray,
                          dtype) -> jnp.ndarray:
    """diag(A) for the variable-coefficient hex stiffness (Jacobi)."""
    nz1, ny1, nx1 = shape
    d = jnp.zeros((nz1, ny1, nx1), dtype)
    Ke_diag = [
        sum(a_maps[q] * Sq[q, a, a] for q in range(Sq.shape[0]))
        for a in range(8)
    ]
    sl = (slice(None, -1), slice(1, None))
    a = 0
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                d = d.at[sl[cz], sl[cy], sl[cx]].add(Ke_diag[a])
                a += 1
    return d


def _corners_3d(u):
    """Gather element corner values: 8 x [nz, ny, nx], a = 4cz + 2cy + cx."""
    sl = (slice(None, -1), slice(1, None))
    return tuple(
        u[sl[cz]][:, sl[cy]][:, :, sl[cx]]
        for cz in range(2) for cy in range(2) for cx in range(2)
    )


def apply_stiffness_3d(u: jnp.ndarray, K_loc: jnp.ndarray) -> jnp.ndarray:
    """y = A u with the shared 8x8 local operator (uniform mesh, constant
    coefficients).  u: [nz+1, ny+1, nx+1] node grid."""
    cs = _corners_3d(u)
    r = [sum(K_loc[a, b] * cs[b] for b in range(8)) for a in range(8)]
    y = jnp.zeros_like(u)
    sl = (slice(None, -1), slice(1, None))
    a = 0
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                y = y.at[sl[cz], sl[cy], sl[cx]].add(r[a])
                a += 1
    return y


def stiffness_diag_3d(shape, K_loc: jnp.ndarray, dtype) -> jnp.ndarray:
    """diag(A) on the node grid (Jacobi preconditioner)."""
    nz1, ny1, nx1 = shape
    d = jnp.zeros((nz1, ny1, nx1), dtype)
    ones = jnp.ones((nz1 - 1, ny1 - 1, nx1 - 1), dtype)
    sl = (slice(None, -1), slice(1, None))
    a = 0
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                d = d.at[sl[cz], sl[cy], sl[cx]].add(K_loc[a, a] * ones)
                a += 1
    return d


def assemble_load_3d(xs: jnp.ndarray, ys: jnp.ndarray, zs: jnp.ndarray,
                     f_fn, quad_order: int = 2) -> jnp.ndarray:
    """Load vector on the node grid: b_i = int f N_i, 2^3 Gauss per hex."""
    dtype = xs.dtype
    t, w = gauss_rule(quad_order)
    t = jnp.array(t, dtype)
    w = jnp.array(w, dtype)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    xq = 0.5 * (xs[1:] + xs[:-1])[:, None] + 0.5 * hx[:, None] * t[None, :]
    yq = 0.5 * (ys[1:] + ys[:-1])[:, None] + 0.5 * hy[:, None] * t[None, :]
    zq = 0.5 * (zs[1:] + zs[:-1])[:, None] + 0.5 * hz[:, None] * t[None, :]
    nz, ny, nx = hz.shape[0], hy.shape[0], hx.shape[0]
    Q = t.shape[0]
    # f on [nz, Qz, ny, Qy, nx, Qx]
    F = f_fn(
        xq[None, None, None, None, :, :],
        yq[None, None, :, :, None, None],
        zq[:, :, None, None, None, None],
    )
    F = F * jnp.ones((nz, Q, ny, Q, nx, Q), dtype)
    jac = (hz[:, None, None, None, None, None] / 2
           * hy[None, None, :, None, None, None] / 2
           * hx[None, None, None, None, :, None] / 2)
    W = (w[None, :, None, None, None, None]
         * w[None, None, None, :, None, None]
         * w[None, None, None, None, None, :]) * jac
    lo = 0.5 * (1.0 - t)
    hi = 0.5 * (1.0 + t)
    FW = F * W
    b = jnp.zeros((zs.shape[0], ys.shape[0], xs.shape[0]), dtype)
    for cz, gz in ((0, lo), (1, hi)):
        for cy, gy in ((0, lo), (1, hi)):
            for cx, gx in ((0, lo), (1, hi)):
                contrib = jnp.einsum("zryqxp,r,q,p->zyx", FW, gz, gy, gx)
                b = b.at[cz:cz + nz, cy:cy + ny, cx:cx + nx].add(contrib)
    return b
