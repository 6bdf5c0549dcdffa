"""Graded (non-uniform tensor-product) 3D hex meshes + slack-driven
adaptivity.

3D lift of ``hybrid2d_graded`` — a capability beyond the reference
(uniform 1D meshes only, ``Hybrid-FEM-LSSVR.py:120``).  The mesh stays a
tensor product ``xs [nx+1] x ys [ny+1] x zs [nz+1]`` with arbitrary
monotone spacings, so every per-element operator is a PER-ELEMENT-SCALAR
combination of shared reference matrices:

- coarse Q1 hex: ``K_e = a0 [(hy hz/2hx) Cxx + (hx hz/2hy) Cyy
  + (hx hy/2hz) Czz] + c (hx hy hz/8) Mh + bx (hy hz/4) Chx + ...``
  (``assembly3d.q1_reference_parts_3d``), applied matrix-free through the
  variable-coefficient gather-scatter (``apply_stiffness_var_3d``) with
  the reference parts as the S_q stack and the geometric scalars as the
  coefficient maps — variable diffusion composes by sampling a(x, y, z)
  at each element's own quadrature points
  (``q1_reference_quad_parts_3d``);
- enhancement: ``D_e = -a_e (sx_e^2 W200 + sy_e^2 W020 + sz_e^2 W002)
  + (b - grad a)_e . (sx_e W100, sy_e W010, sz_e W001) + c W000`` with
  ``sx_e = 2/hx_e`` chain factors against shared reference tensor-
  Legendre collocation matrices; solved by the batched null-space QR
  (``kkt.solve_batched``), trace matrix B unchanged (reference coords).

Adaptivity refines the worst x-, y- and z-intervals independently
(per-axis max of the scale-normalised per-element slack), preserving the
tensor-product structure; each round is a fresh jit specialisation
(host-side control flow by design, like 1D/2D).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly3d, cg, kkt, legendre
from .hybrid2d_graded import refine_axis
from .hybrid3d import (
    Problem3D, Solution3D, Solver3DConfig, _element_data_3d,
    _surface_coords, _trilinear_fallback_coeffs,
)


class Graded3DOperators(NamedTuple):
    """Shared host-f64 reference collocation operators (unit chain
    factors; per-element scaling applied at solve time).  Naming W{abc}:
    derivative order (a, b, c) along (x, y, z)."""

    W200: jnp.ndarray  # [C^3, M^3]  V0z (x) V0y (x) V2x
    W020: jnp.ndarray  # [C^3, M^3]  V0z (x) V2y (x) V0x
    W002: jnp.ndarray  # [C^3, M^3]  V2z (x) V0y (x) V0x
    W100: jnp.ndarray  # [C^3, M^3]  V0z (x) V0y (x) V1x
    W010: jnp.ndarray  # [C^3, M^3]  V0z (x) V1y (x) V0x
    W001: jnp.ndarray  # [C^3, M^3]  V1z (x) V0y (x) V0x
    W000: jnp.ndarray  # [C^3, M^3]  V0z (x) V0y (x) V0x
    B: jnp.ndarray  # [S, M^3] shared trace rows (surface points)
    Z: jnp.ndarray  # [M^3, (M-2)^3] null basis of B
    Pbc: jnp.ndarray  # [M^3, S] min-norm particular map


def prepare_shared_3d_graded(problem: Problem3D, cfg: Solver3DConfig):
    """Host f64 precompute of the reference-coordinate operator parts
    (graded analog of ``prepare_shared_3d``; interior collocation points
    for the same face/edge/corner-row reason)."""
    if any(t != "dirichlet" for t in problem.bc_faces):
        raise NotImplementedError(
            "this path eliminates all boundary faces structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver3D)"
        )
    M, C = cfg.M, cfg.n_colloc
    dtype = cfg.jnp_dtype()
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = legendre.vandermonde_host(t_int, M)

    def t3(Az, Ay, Ax):
        # rows (iz, iy, ix) x cols (kz, ky, kx), both row-major — same
        # convention as prepare_shared_3d.
        return np.einsum("zk,yl,xm->zyxklm", Az, Ay, Ax).reshape(
            C * C * C, M * M * M
        )

    spts = _surface_coords(M)
    Vz_b = legendre.vandermonde_host(spts[:, 0], M)[0]
    Vy_b = legendre.vandermonde_host(spts[:, 1], M)[0]
    Vx_b = legendre.vandermonde_host(spts[:, 2], M)[0]
    B = np.einsum("pk,pl,pm->pklm", Vz_b, Vy_b, Vx_b).reshape(
        -1, M * M * M
    )
    Z, Pbc = kkt.nullspace_host(B)
    gops = Graded3DOperators(
        W200=jnp.asarray(t3(V0, V0, V2), dtype),
        W020=jnp.asarray(t3(V0, V2, V0), dtype),
        W002=jnp.asarray(t3(V2, V0, V0), dtype),
        W100=jnp.asarray(t3(V0, V0, V1), dtype),
        W010=jnp.asarray(t3(V0, V1, V0), dtype),
        W001=jnp.asarray(t3(V1, V0, V0), dtype),
        W000=jnp.asarray(t3(V0, V0, V0), dtype),
        B=jnp.asarray(B, dtype),
        Z=jnp.asarray(Z, dtype), Pbc=jnp.asarray(Pbc, dtype),
    )
    return gops, (jnp.asarray(t_int), jnp.asarray(spts))


def _geom_grids(xs, ys, zs):
    """Per-element spacings broadcast to the element grid
    [nz, ny, nx]."""
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    shape = (hz.shape[0], hy.shape[0], hx.shape[0])
    HX = jnp.broadcast_to(hx[None, None, :], shape)
    HY = jnp.broadcast_to(hy[None, :, None], shape)
    HZ = jnp.broadcast_to(hz[:, None, None], shape)
    return HX, HY, HZ


def graded_fem_parts_3d(problem: Problem3D, xs, ys, zs):
    """Matrix-free per-element operator parts on a graded hex mesh:
    stacked reference 8x8 blocks Sq and their per-element scalar maps
    [nz, ny, nx] (3D analog of ``hybrid2d_graded.graded_fem_parts``)."""
    dtype = xs.dtype
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    HX, HY, HZ = _geom_grids(xs, ys, zs)
    bx, by, bz = problem.b
    Sq_list, map_list = [], []
    Cxx, Cyy, Czz, Mh, Chx, Chy, Chz = assembly3d.q1_reference_parts_3d()
    if problem.a_var is not None:
        Sxx, Syy, Szz, tq = assembly3d.q1_reference_quad_parts_3d()
        Q = tq.shape[0]
        xq = (0.5 * (xs[1:] + xs[:-1])[None, :]
              + 0.5 * hx[None, :] * jnp.asarray(tq[:, 0], dtype)[:, None])
        yq = (0.5 * (ys[1:] + ys[:-1])[None, :]
              + 0.5 * hy[None, :] * jnp.asarray(tq[:, 1], dtype)[:, None])
        zq = (0.5 * (zs[1:] + zs[:-1])[None, :]
              + 0.5 * hz[None, :] * jnp.asarray(tq[:, 2], dtype)[:, None])
        # a on [Q, nz, ny, nx]
        A = problem.a_var(xq[:, None, None, :], yq[:, None, :, None],
                          zq[:, :, None, None])
        A = A * jnp.ones((Q,) + HX.shape, dtype)
        Sq_list += [Sxx[q] for q in range(Q)]
        map_list += [A[q] * HY * HZ / (2.0 * HX) for q in range(Q)]
        Sq_list += [Syy[q] for q in range(Q)]
        map_list += [A[q] * HX * HZ / (2.0 * HY) for q in range(Q)]
        Sq_list += [Szz[q] for q in range(Q)]
        map_list += [A[q] * HX * HY / (2.0 * HZ) for q in range(Q)]
    else:
        Sq_list += [Cxx, Cyy, Czz]
        map_list += [
            problem.a0 * HY * HZ / (2.0 * HX),
            problem.a0 * HX * HZ / (2.0 * HY),
            problem.a0 * HX * HY / (2.0 * HZ),
        ]
    if problem.c != 0.0:
        Sq_list.append(Mh)
        map_list.append(problem.c * HX * HY * HZ / 8.0)
    if bx != 0.0:
        Sq_list.append(Chx)
        map_list.append(bx * HY * HZ / 4.0)
    if by != 0.0:
        Sq_list.append(Chy)
        map_list.append(by * HX * HZ / 4.0)
    if bz != 0.0:
        Sq_list.append(Chz)
        map_list.append(bz * HX * HY / 4.0)
    Sq = jnp.asarray(np.stack(Sq_list), dtype)
    return Sq, jnp.stack(map_list)


def fem_solve_3d_graded(problem: Problem3D, cfg: Solver3DConfig,
                        xs, ys, zs):
    """Coarse Q1 solve on the graded hex mesh: matrix-free per-element
    operators via reference-part scalar maps; Jacobi-CG (SPD) or
    Jacobi-BiCGStab (nonsymmetric/indefinite).  Multigrid needs nested
    uniform coarsenings, so graded meshes use the Jacobi path (the 2D
    graded rule)."""
    dtype = xs.dtype
    bx, by, bz = problem.b
    Sq, a_maps = graded_fem_parts_3d(problem, xs, ys, zs)

    nz1, ny1, nx1 = zs.shape[0], ys.shape[0], xs.shape[0]
    interior = jnp.zeros((nz1, ny1, nx1), bool).at[1:-1, 1:-1, 1:-1].set(
        True
    )
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    g_grid = problem.g(X, Y, Z) * jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, g_grid)
    b = assembly3d.assemble_load_3d(xs, ys, zs, problem.f)

    def apply_op(v):
        return assembly3d.apply_stiffness_var_3d(v, Sq, a_maps)

    def apply_free(v):
        return jnp.where(interior, apply_op(v * interior), 0.0)

    rhs = jnp.where(interior, b - apply_op(u_bc), 0.0)
    diag = assembly3d.stiffness_var_diag_3d((nz1, ny1, nx1), Sq, a_maps,
                                            dtype)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    spd = bx == 0.0 and by == 0.0 and bz == 0.0 and problem.c >= 0.0
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter)
    return u_bc + jnp.where(interior, res.x, 0.0), res


def _graded_element_operators_3d(problem: Problem3D, cfg: Solver3DConfig,
                                 xs, ys, zs, gops: Graded3DOperators,
                                 t_int):
    """Batched per-element collocation operators D [E, C^3, M^3] on the
    graded hex mesh: per-element chain factors (and sampled coefficient
    fields for variable diffusion) against the shared reference parts."""
    dtype = xs.dtype
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    nz = zs.shape[0] - 1
    E = nx * ny * nz
    C = cfg.n_colloc
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    shape = (nz, ny, nx)
    SX = jnp.broadcast_to((2.0 / hx)[None, None, :], shape).reshape(
        E, 1, 1)
    SY = jnp.broadcast_to((2.0 / hy)[None, :, None], shape).reshape(
        E, 1, 1)
    SZ = jnp.broadcast_to((2.0 / hz)[:, None, None], shape).reshape(
        E, 1, 1)
    bx, by, bz = problem.b
    if problem.a_var is not None:
        t = jnp.asarray(t_int, dtype)
        xq = xs[:-1][:, None] + 0.5 * hx[:, None] * (t[None, :] + 1.0)
        yq = ys[:-1][:, None] + 0.5 * hy[:, None] * (t[None, :] + 1.0)
        zq = zs[:-1][:, None] + 0.5 * hz[:, None] * (t[None, :] + 1.0)

        def samp(fn):
            # [nz, ny, nx, Cz, Cy, Cx] row-major rows/cols, matching
            # prepare_shared_3d_graded's t3 order.
            v = fn(
                xq[None, None, :, None, None, :],
                yq[None, :, None, None, :, None],
                zq[:, None, None, :, None, None],
            )
            v = v * jnp.ones((nz, ny, nx, C, C, C), dtype)
            return v.reshape(E, C * C * C, 1)

        if problem.grad_a is not None:
            ax_fn, ay_fn, az_fn = problem.grad_a
        else:
            ax_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=0))
            ay_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=1))
            az_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=2))
        a_e = samp(problem.a_var)
        ax_e = samp(ax_fn)
        ay_e = samp(ay_fn)
        az_e = samp(az_fn)
    else:
        a_e = problem.a0
        ax_e = 0.0
        ay_e = 0.0
        az_e = 0.0
    D = -a_e * (SX * SX * gops.W200 + SY * SY * gops.W020
                + SZ * SZ * gops.W002)
    cx = bx - ax_e  # (b - grad a) . grad u chain rows
    cy = by - ay_e
    cz = bz - az_e
    if problem.a_var is not None or bx != 0.0:
        D = D + cx * SX * gops.W100
    if problem.a_var is not None or by != 0.0:
        D = D + cy * SY * gops.W010
    if problem.a_var is not None or bz != 0.0:
        D = D + cz * SZ * gops.W001
    if problem.c != 0.0:
        D = D + problem.c * gops.W000
    return D


@functools.partial(jax.jit, static_argnums=(0, 1))
def hybrid_solve_3d_graded(problem: Problem3D, cfg: Solver3DConfig,
                           shared_bundle, xs, ys, zs) -> Solution3D:
    """Full graded-mesh 3D hybrid solve: graded coarse Q1 hex +
    per-element batched null-space enhancement.  jit-specialised per mesh
    SHAPE; node positions are traced, so adaptive rounds that move (not
    add) nodes reuse the compilation."""
    gops, (t_int, spts) = shared_bundle
    dtype = cfg.jnp_dtype()
    xs = jnp.asarray(xs, dtype)
    ys = jnp.asarray(ys, dtype)
    zs = jnp.asarray(zs, dtype)
    # Rebind the config's element counts to the true extents so
    # _element_data_3d's domain-boundary face masks see the grown mesh
    # (adaptive rounds add nodes past the starting nx/ny/nz).
    cfg = dataclasses.replace(cfg, nx=xs.shape[0] - 1, ny=ys.shape[0] - 1,
                              nz=zs.shape[0] - 1)
    if cfg.fem_dtype is not None:
        fd = jnp.dtype(cfg.fem_dtype)
        fem_values, cg_res = fem_solve_3d_graded(
            problem, cfg, xs.astype(fd), ys.astype(fd), zs.astype(fd))
        fem_values = fem_values.astype(dtype)
    else:
        fem_values, cg_res = fem_solve_3d_graded(problem, cfg, xs, ys, zs)
    M = cfg.M
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    nz = zs.shape[0] - 1
    f_rows, bc_rows, cs = _element_data_3d(
        problem, cfg, xs, ys, zs, fem_values, t_int, spts
    )
    D = _graded_element_operators_3d(problem, cfg, xs, ys, zs, gops,
                                     t_int)
    w, diags = kkt.solve_batched(
        D, gops.B, f_rows, bc_rows, cfg.gamma,
        formulation=cfg.formulation, ZP=(gops.Z, gops.Pbc),
    )
    shp = (nz, ny, nx)
    coeffs = w.reshape(*shp, M, M, M)
    fb = _trilinear_fallback_coeffs(cs, M)
    ok = diags.solve_ok.reshape(shp)
    coeffs = jnp.where(
        ok[..., None, None, None],
        jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
    )
    return Solution3D(
        xs=xs, ys=ys, zs=zs, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(shp),
        bc_violation=diags.bc_violation.reshape(shp),
        solve_ok=ok, cond_estimate=diags.cond_estimate,
    )


def evaluate_3d_graded(sol: Solution3D, x, y, z):
    """u(x, y, z) on the graded hex mesh: searchsorted element lookup per
    axis (the uniform path's index arithmetic does not apply), then the
    same batched tensor-Legendre contraction; clamps outside the domain
    like the uniform path / the reference ``:198-209``."""
    xs, ys, zs = sol.xs, sol.ys, sol.zs
    nx, ny, nz = xs.shape[0] - 1, ys.shape[0] - 1, zs.shape[0] - 1
    ix = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(ys, y, side="right") - 1, 0, ny - 1)
    iz = jnp.clip(jnp.searchsorted(zs, z, side="right") - 1, 0, nz - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / (xs[ix + 1] - xs[ix])
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / (ys[iy + 1] - ys[iy])
    tz = (2.0 * z - zs[iz] - zs[iz + 1]) / (zs[iz + 1] - zs[iz])
    M = sol.coeffs.shape[-1]
    (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
    (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
    (Vz,) = legendre.legendre_vandermonde(tz, M, num_derivs=0)
    W = sol.coeffs[iz, iy, ix]  # [P, M, M, M]
    return jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx,
                      precision=jax.lax.Precision.HIGHEST)


def evaluate_3d_graded_gradient(sol: Solution3D, x, y, z):
    """(du/dx, du/dy, du/dz) on the graded hex mesh — per-element chain
    factors 2/h_e per axis."""
    xs, ys, zs = sol.xs, sol.ys, sol.zs
    nx, ny, nz = xs.shape[0] - 1, ys.shape[0] - 1, zs.shape[0] - 1
    ix = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(ys, y, side="right") - 1, 0, ny - 1)
    iz = jnp.clip(jnp.searchsorted(zs, z, side="right") - 1, 0, nz - 1)
    hx_e = xs[ix + 1] - xs[ix]
    hy_e = ys[iy + 1] - ys[iy]
    hz_e = zs[iz + 1] - zs[iz]
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx_e
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy_e
    tz = (2.0 * z - zs[iz] - zs[iz + 1]) / hz_e
    M = sol.coeffs.shape[-1]
    Vx, Vx1 = legendre.legendre_vandermonde(tx, M, num_derivs=1)
    Vy, Vy1 = legendre.legendre_vandermonde(ty, M, num_derivs=1)
    Vz, Vz1 = legendre.legendre_vandermonde(tz, M, num_derivs=1)
    W = sol.coeffs[iz, iy, ix]
    hi = jax.lax.Precision.HIGHEST
    ux = (2.0 / hx_e) * jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx1,
                                   precision=hi)
    uy = (2.0 / hy_e) * jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy1, Vx,
                                   precision=hi)
    uz = (2.0 / hz_e) * jnp.einsum("pk,pklm,pl,pm->p", Vz1, W, Vy, Vx,
                                   precision=hi)
    return ux, uy, uz


class HybridSolver3DGraded:
    """Facade for graded tensor-product hex meshes (mirrors
    HybridSolver3D; nx/ny/nz in the config are ignored — the mesh is the
    node arrays)."""

    def __init__(self, problem: Problem3D, config: Solver3DConfig,
                 xs, ys, zs):
        self.problem = problem
        self.config = config
        self.xs = np.asarray(xs)
        self.ys = np.asarray(ys)
        self.zs = np.asarray(zs)
        self._shared = prepare_shared_3d_graded(problem, config)
        self.solution: Optional[Solution3D] = None

    def solve(self) -> Solution3D:
        self.solution = hybrid_solve_3d_graded(
            self.problem, self.config, self._shared, self.xs, self.ys,
            self.zs,
        )
        return self.solution

    def evaluate_solution(self, x, y, z):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_3d_graded(
            self.solution, jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype))

    def evaluate_gradient(self, x, y, z):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_3d_graded_gradient(
            self.solution, jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype))

    def errors(self, x, y, z):
        from ..utils import metrics

        u = self.evaluate_solution(x, y, z)
        dtype = u.dtype
        ue = self.problem.exact(
            jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype))
        return metrics.linf_error(u, ue), metrics.l2_error(u, ue)


class AdaptiveResult3D(NamedTuple):
    solution: Solution3D
    xs: np.ndarray
    ys: np.ndarray
    zs: np.ndarray
    history: List[dict]


def adaptive_solve_3d(problem: Problem3D, cfg: Solver3DConfig,
                      rounds: int = 2, refine_frac: float = 0.3,
                      eval_points=None) -> AdaptiveResult3D:
    """Slack-driven tensor-product adaptivity (3D analog of
    ``adaptive_solve_2d``): each round refines the worst intervals along
    each axis by the over-the-other-axes max of the scale-normalised
    slack — the tensor-product constraint means an interval refines
    across the whole slab.  Starts from the uniform cfg mesh."""
    x0, x1, y0, y1, z0, z1 = problem.domain
    xs = np.linspace(x0, x1, cfg.nx + 1)
    ys = np.linspace(y0, y1, cfg.ny + 1)
    zs = np.linspace(z0, z1, cfg.nz + 1)
    history: List[dict] = []
    solver = None
    for r in range(rounds + 1):
        solver = HybridSolver3DGraded(problem, cfg, xs, ys, zs)
        sol = solver.solve()
        slack = np.asarray(sol.max_slack)  # [nz, ny, nx]
        # Scale-normalised indicator: raw slack is the PDE residual
        # against operator rows of size ~ sx^2 + sy^2 + sz^2, growing
        # ~ 1/h^2 on refined elements; dividing by the row scale keeps
        # the indicator comparable across element sizes (the 2D lesson —
        # else refinement positively feeds back onto the smallest
        # elements).
        hx = np.diff(xs)
        hy = np.diff(ys)
        hz = np.diff(zs)
        row_scale = (((2.0 / hx) ** 2)[None, None, :]
                     + ((2.0 / hy) ** 2)[None, :, None]
                     + ((2.0 / hz) ** 2)[:, None, None])
        slack = slack / row_scale
        rec = {
            "round": r,
            "elements": int(slack.size),
            "max_slack": float(slack.max()),
        }
        if eval_points is not None:
            xq, yq, zq = eval_points
            linf, _ = solver.errors(xq, yq, zq)
            rec["linf"] = float(linf)
        history.append(rec)
        if r == rounds:
            break
        xs = refine_axis(xs, slack.max(axis=(0, 1)), refine_frac)
        ys = refine_axis(ys, slack.max(axis=(0, 2)), refine_frac)
        zs = refine_axis(zs, slack.max(axis=(1, 2)), refine_frac)
    return AdaptiveResult3D(solution=solver.solution, xs=xs, ys=ys,
                            zs=zs, history=history)
