"""3D linear elasticity on structured hexes: the vector family's tensor
lift (2D version: ``models/elastic.py``; reference scope is scalar 1D,
``Hybrid-FEM-LSSVR.py:8-18``).

    -div sigma(u) = f,  sigma = 2 mu eps(u) + lam tr(eps(u)) I,
    u = (u1, u2, u3) on a box, Dirichlet data on all faces.

Block structure (d, e in {x, y, z}):

* Coarse stage — Q1 vector hexes, matrix-free: local 8x8 gradient Gram
  matrices K_de[a, b] = int dN_a/dd dN_b/de are separable tensor
  products of the 1D P1 factors (stiffness k1 ~ 1/h, mass m1 ~ h,
  convection c1 h-free), so every weak-form block
  A^(dd) = (lam+2mu) K_dd + mu (K_ee + K_ff),
  A^(de) = lam K_de + mu K_de^T (d != e)
  applies through ``assembly3d.apply_stiffness_3d`` — nine calls per
  block-operator application on the stacked [3, nz+1, ny+1, nx+1] grid.
  Pure-stiffness hex locals scale EXACTLY as K(2^l h) = 2^l K(h) (see
  ``multigrid.make_vcycle_3d``), so the block-diagonal component-wise
  V-cycle preconditioner rediscretises by scaling.
* Enhancement stage — per element, a coupled fit of three tensor-
  Legendre expansions through ONE shared block null-space LSE:
  D^(dd) = -[mu Lap + (lam+mu) D_dd], D^(de) = -(lam+mu) D_de
  ([3 C^3, 3 M^3]; D_de the mixed-second-derivative collocation
  operators), B = diag(Bs, Bs, Bs) pinning each component's trace at
  the M^3 - (M-2)^3 surface points — then ``kkt.solve_primal_shared``
  solves every element in two MXU matmuls.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly3d, cg, kkt, legendre
from .hybrid3d import (Problem3D, _element_data_3d, _surface_coords,
                       _trilinear_fallback_coeffs)


@dataclasses.dataclass(frozen=True)
class ElasticProblem3D:
    """-div sigma(u) = f on a box, u = g on the boundary."""

    name: str
    f: Tuple[Callable, Callable, Callable]  # body force components
    g: Tuple[Callable, Callable, Callable]  # Dirichlet data per component
    lam: float = 1.0
    mu: float = 1.0
    domain: Tuple[float, ...] = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
    exact: Optional[Tuple[Callable, Callable, Callable]] = None


def sin_elastic_3d(lam: float = 1.0, mu: float = 1.0) -> ElasticProblem3D:
    """Manufactured coupled solution (all components vanish on the
    boundary of [-1, 1]^3):

        u1 = sin(pi x) sin(pi y) sin(pi z)
        u2 = sin(2 pi x) sin(pi y) sin(pi z)
        u3 = sin(pi x) sin(2 pi y) sin(pi z)

    with f_d = -[mu Lap u_d + (lam+mu) d/dd (div u)] expanded
    analytically (cross-checked against jax.jacfwd of -div sigma in
    tests/test_elastic.py::test_elastic3d_forcing_matches_autodiff).
    """
    pi = jnp.pi

    def u1(x, y, z):
        return jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)

    def u2(x, y, z):
        return jnp.sin(2 * pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)

    def u3(x, y, z):
        return jnp.sin(pi * x) * jnp.sin(2 * pi * y) * jnp.sin(pi * z)

    lm = lam + mu

    def f1(x, y, z):
        s1x, c1x = jnp.sin(pi * x), jnp.cos(pi * x)
        s1y, c1y = jnp.sin(pi * y), jnp.cos(pi * y)
        s1z, c1z = jnp.sin(pi * z), jnp.cos(pi * z)
        c2x = jnp.cos(2 * pi * x)
        s2y = jnp.sin(2 * pi * y)
        ddx_div = (-s1x * s1y * s1z + 2 * c2x * c1y * s1z
                   + c1x * s2y * c1z)
        return pi ** 2 * (3 * mu * s1x * s1y * s1z - lm * ddx_div)

    def f2(x, y, z):
        s1x, c1x = jnp.sin(pi * x), jnp.cos(pi * x)
        s1y, c1y = jnp.sin(pi * y), jnp.cos(pi * y)
        s1z = jnp.sin(pi * z)
        c1z = jnp.cos(pi * z)
        s2x = jnp.sin(2 * pi * x)
        c2y = jnp.cos(2 * pi * y)
        ddy_div = (c1x * c1y * s1z - s2x * s1y * s1z
                   + 2 * s1x * c2y * c1z)
        return pi ** 2 * (6 * mu * s2x * s1y * s1z - lm * ddy_div)

    def f3(x, y, z):
        s1x, c1x = jnp.sin(pi * x), jnp.cos(pi * x)
        s1y, c1y = jnp.sin(pi * y), jnp.cos(pi * y)
        s1z, c1z = jnp.sin(pi * z), jnp.cos(pi * z)
        s2x = jnp.sin(2 * pi * x)
        s2y = jnp.sin(2 * pi * y)
        ddz_div = (c1x * s1y * c1z + s2x * c1y * c1z
                   - s1x * s2y * s1z)
        return pi ** 2 * (6 * mu * s1x * s2y * s1z - lm * ddz_div)

    zero = lambda x, y, z: jnp.zeros_like(x + y + z)  # noqa: E731
    return ElasticProblem3D(
        name="sin_elastic_3d", f=(f1, f2, f3), g=(zero, zero, zero),
        lam=lam, mu=mu, exact=(u1, u2, u3),
    )


def poly_elastic_3d(lam: float = 2.0, mu: float = 0.5) -> ElasticProblem3D:
    """Coupled cubic exact solution with NONZERO boundary data (inside
    the M >= 4 trial space; exercises the per-face g-override path):

        u1 = x^3 + y^2 z,  u2 = y^3 + z^2 x,  u3 = z^3 + x^2 y

    so div u = 3(x^2 + y^2 + z^2) and
    f_d = -[mu Lap u_d + (lam+mu) d_d div u] expands to the closed
    forms below."""

    def u1(x, y, z):
        return x ** 3 + y * y * z

    def u2(x, y, z):
        return y ** 3 + z * z * x

    def u3(x, y, z):
        return z ** 3 + x * x * y

    lm = lam + mu

    def f1(x, y, z):
        return -(mu * (6 * x + 2 * z) + lm * 6 * x)

    def f2(x, y, z):
        return -(mu * (6 * y + 2 * x) + lm * 6 * y)

    def f3(x, y, z):
        return -(mu * (6 * z + 2 * y) + lm * 6 * z)

    return ElasticProblem3D(
        name="poly_elastic_3d", f=(f1, f2, f3), g=(u1, u2, u3),
        lam=lam, mu=mu, exact=(u1, u2, u3),
    )


def get_elastic_problem_3d(name: str, **kw) -> ElasticProblem3D:
    reg = {"sin_elastic_3d": sin_elastic_3d,
           "poly_elastic_3d": poly_elastic_3d}
    if name not in reg:
        raise ValueError(f"unknown 3D elastic problem: {name!r}")
    return reg[name](**kw)


@dataclasses.dataclass(frozen=True)
class ElasticConfig3D:
    nx: int = 8
    ny: int = 8
    nz: int = 8
    M: int = 4
    n_colloc: int = 4
    cg_tol: Optional[float] = None
    cg_maxiter: int = 4000
    precond: str = "auto"  # 'auto' | 'jacobi' | 'mg'
    # Damped-Jacobi weight inside the component V-cycles.  The elasticity
    # diagonal blocks are ANISOTROPIC ((lam+2mu) : mu : mu); at the
    # Laplacian default omega=0.8 the V-cycle loses mesh independence
    # (measured scalar-block CG iterations 14/55 at 8/16^3) while 0.6
    # restores it (10/11).  Applies to precond='mg' only.
    mg_omega: float = 0.6
    diagnostics: bool = True
    dtype: Optional[str] = None
    coarse: str = "q1"  # 'q1' | 'richardson' ((4 u_{h/2} - u_h)/3 nodal
    # extrapolation -> O(h^4); pair with trace_lift >= 4 — see the 2D
    # ``ElasticConfig2D.coarse`` docstring for the rationale)
    trace_lift: int = 0

    def __post_init__(self):
        if self.precond not in ("auto", "jacobi", "mg"):
            raise ValueError(f"unknown precond: {self.precond!r}")
        if self.coarse not in ("q1", "richardson"):
            raise ValueError(f"unknown coarse: {self.coarse!r}")
        if self.trace_lift == 1 or self.trace_lift < 0:
            raise ValueError("trace_lift must be 0 or >= 2")

    def jnp_dtype(self):
        if self.dtype is not None:
            return jnp.dtype(self.dtype)
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class ElasticSolution3D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    zs: jnp.ndarray
    fem_values: jnp.ndarray  # [3, nz+1, ny+1, nx+1]
    coeffs: jnp.ndarray  # [3, nz, ny, nx, M, M, M]
    cg_iters: jnp.ndarray
    cg_residual: jnp.ndarray
    max_slack: jnp.ndarray
    bc_violation: jnp.ndarray
    solve_ok: jnp.ndarray  # [nz, ny, nx]
    cond_estimate: jnp.ndarray = None
    lam: float = 1.0
    mu: float = 1.0


@functools.lru_cache(maxsize=None)
def _hex_grad_mats(hx: float, hy: float, hz: float):
    """Host-f64 local 8x8 gradient Gram matrices K_de on a Q1 hex
    (separable 1D factors; corner order a = 4cz + 2cy + cx)."""
    k1, m1, c1 = assembly3d._k1, assembly3d._m1, assembly3d._c1

    def t8(Fz, Fy, Fx):
        return np.einsum("ij,kl,mn->ikmjln", Fz, Fy, Fx).reshape(8, 8)

    c = c1()  # c[i, j] = int n_i n_j' (h-free); int n_i' n_j = c.T
    K = {}
    K["xx"] = t8(m1(hz), m1(hy), k1(hx))
    K["yy"] = t8(m1(hz), k1(hy), m1(hx))
    K["zz"] = t8(k1(hz), m1(hy), m1(hx))
    K["xy"] = t8(m1(hz), c, c.T)  # int dxN_a dyN_b
    K["xz"] = t8(c, m1(hy), c.T)
    K["yz"] = t8(c, c.T, m1(hx))
    return K


def _block_locals_3d(problem: ElasticProblem3D, hx, hy, hz, dtype):
    K = _hex_grad_mats(hx, hy, hz)
    lam, mu = problem.lam, problem.mu
    diag = {
        "x": (lam + 2 * mu) * K["xx"] + mu * (K["yy"] + K["zz"]),
        "y": (lam + 2 * mu) * K["yy"] + mu * (K["xx"] + K["zz"]),
        "z": (lam + 2 * mu) * K["zz"] + mu * (K["xx"] + K["yy"]),
    }
    off = {
        "xy": lam * K["xy"] + mu * K["xy"].T,
        "xz": lam * K["xz"] + mu * K["xz"].T,
        "yz": lam * K["yz"] + mu * K["yz"].T,
    }
    j = lambda A: jnp.asarray(A, dtype)  # noqa: E731
    return ({k: j(v) for k, v in diag.items()},
            {k: j(v) for k, v in off.items()})


def _block_colloc_host_3d(problem: ElasticProblem3D,
                          cfg: ElasticConfig3D):
    """Host-f64 BLOCK collocation operators on the shared hex element:
    ``(D, B, Mass_s, t_int, spts)`` with D the [3 C^3, 3 M^3]
    momentum-balance operator, B = diag(B_s, B_s, B_s) the face-trace
    matrix, and Mass_s the SCALAR [C^3, M^3] value rows V0 (x) V0 (x) V0
    (needed by the elastodynamics march, ``models/elastic_wave.py``)."""
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    hz = (z1 - z0) / cfg.nz
    M, C = cfg.M, cfg.n_colloc
    lam, mu = problem.lam, problem.mu
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = legendre.vandermonde_host(t_int, M)
    sx, sy, sz = 2.0 / hx, 2.0 / hy, 2.0 / hz

    def t3(Az, Ay, Ax):
        return np.einsum("zk,yl,xm->zyxklm", Az, Ay, Ax).reshape(
            C * C * C, M * M * M)

    Dxx = sx * sx * t3(V0, V0, V2)
    Dyy = sy * sy * t3(V0, V2, V0)
    Dzz = sz * sz * t3(V2, V0, V0)
    Lap = Dxx + Dyy + Dzz
    Dxy = sx * sy * t3(V0, V1, V1)
    Dxz = sx * sz * t3(V1, V0, V1)
    Dyz = sy * sz * t3(V1, V1, V0)
    lm = lam + mu
    Ddiag = {"x": Dxx, "y": Dyy, "z": Dzz}
    axes = ("x", "y", "z")
    blocks = [[None] * 3 for _ in range(3)]
    Doff = {("x", "y"): Dxy, ("x", "z"): Dxz, ("y", "z"): Dyz}
    for i, d in enumerate(axes):
        for j_, e in enumerate(axes):
            if i == j_:
                blocks[i][j_] = -(mu * Lap + lm * Ddiag[d])
            else:
                key = (d, e) if (d, e) in Doff else (e, d)
                blocks[i][j_] = -lm * Doff[key]
    D = np.block(blocks)  # [3 C^3, 3 M^3]
    spts = _surface_coords(M)
    Vz_b = legendre.vandermonde_host(spts[:, 0], M)[0]
    Vy_b = legendre.vandermonde_host(spts[:, 1], M)[0]
    Vx_b = legendre.vandermonde_host(spts[:, 2], M)[0]
    Bs = np.einsum("pk,pl,pm->pklm", Vz_b, Vy_b, Vx_b).reshape(
        -1, M * M * M)
    S = Bs.shape[0]
    B = np.zeros((3 * S, 3 * M * M * M))
    for c_ in range(3):
        B[c_ * S:(c_ + 1) * S,
          c_ * M * M * M:(c_ + 1) * M * M * M] = Bs
    Mass_s = t3(V0, V0, V0)
    return D, B, Mass_s, t_int, spts


def prepare_shared_elastic_3d(problem: ElasticProblem3D,
                              cfg: ElasticConfig3D):
    """Host-f64 block LSE precompute (module docstring)."""
    D, B, _, t_int, spts = _block_colloc_host_3d(problem, cfg)
    shared = kkt.precompute_shared_lse_host(D, B, cfg.jnp_dtype())
    return shared, (jnp.asarray(t_int), jnp.asarray(spts))


def fem_solve_elastic_3d(problem: ElasticProblem3D, cfg: ElasticConfig3D,
                         xs, ys, zs):
    """Vector Q1 hex nodal displacements [3, nz+1, ny+1, nx+1] via block
    matrix-free CG."""
    dtype = xs.dtype
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    hz = float((problem.domain[5] - problem.domain[4]) / cfg.nz)
    diag_loc, off_loc = _block_locals_3d(problem, hx, hy, hz, dtype)
    A = assembly3d.apply_stiffness_3d
    Axy, Axz, Ayz = off_loc["xy"], off_loc["xz"], off_loc["yz"]

    def apply_block(u):
        r1 = A(u[0], diag_loc["x"]) + A(u[1], Axy) + A(u[2], Axz)
        r2 = A(u[0], Axy.T) + A(u[1], diag_loc["y"]) + A(u[2], Ayz)
        r3 = A(u[0], Axz.T) + A(u[1], Ayz.T) + A(u[2], diag_loc["z"])
        return jnp.stack([r1, r2, r3])

    b = jnp.stack([assembly3d.assemble_load_3d(xs, ys, zs, fc)
                   for fc in problem.f])
    nz1, ny1, nx1 = zs.shape[0], ys.shape[0], xs.shape[0]
    interior = jnp.zeros((nz1, ny1, nx1), bool).at[
        1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.stack([jnp.where(interior, 0.0, gc(X, Y, Z) * ones)
                      for gc in problem.g])

    def apply_free(v):
        return jnp.where(interior, apply_block(v * interior), 0.0)

    rhs = jnp.where(interior, b - apply_block(u_bc), 0.0)
    precond = cfg.precond
    mg_ok = (cfg.nx % 2 == 0 and cfg.ny % 2 == 0 and cfg.nz % 2 == 0
             and min(cfg.nx, cfg.ny, cfg.nz) >= 8)
    if precond == "auto":
        precond = "mg" if mg_ok else "jacobi"
    if precond == "mg":
        if not mg_ok:
            raise ValueError("precond='mg' needs an even >= 8 grid; "
                             "use precond='jacobi'")
        from ..ops import multigrid

        # Component-wise V-cycles on the anisotropic diagonal blocks;
        # pure-stiffness hex locals scale as 2^l per level (the
        # make_vcycle_3d scaling rule).
        vcs = [
            multigrid.make_vcycle_3d(
                nz1, ny1, nx1, diag_loc[d], dtype, omega=cfg.mg_omega,
                loc_for_level=lambda lvl, d=d: (2.0 ** lvl) * diag_loc[d],
            )
            for d in ("x", "y", "z")
        ]

        def M_inv(r):
            zs_ = [vc(jnp.where(interior, r[c_], 0.0))
                   for c_, vc in enumerate(vcs)]
            return jnp.where(interior, jnp.stack(zs_), 0.0)
    else:
        diag = jnp.stack([
            assembly3d.stiffness_diag_3d((nz1, ny1, nx1), diag_loc[d],
                                         dtype)
            for d in ("x", "y", "z")
        ])
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                maxiter=cfg.cg_maxiter)
    u = u_bc + jnp.where(interior, res.x, 0.0)
    return u, res


def _component_problem_3d(problem: ElasticProblem3D,
                          comp: int) -> Problem3D:
    return Problem3D(name=f"{problem.name}:u{comp + 1}",
                     f=problem.f[comp], g=problem.g[comp],
                     domain=problem.domain)


def enhance_elastic_3d(problem: ElasticProblem3D, cfg: ElasticConfig3D,
                       xs, ys, zs, fem_values, shared_bundle):
    """Coupled vector fit: stacked collocation + trace rows through the
    block LSE (3D mirror of ``elastic.enhance_elastic``)."""
    shared, (t_int, spts) = shared_bundle
    M = cfg.M
    rows, traces, corners = [], [], []
    for comp in range(3):
        f_rows, bc_rows, cs = _element_data_3d(
            _component_problem_3d(problem, comp), cfg, xs, ys, zs,
            fem_values[comp], t_int, spts, trace_lift=cfg.trace_lift,
        )
        rows.append(f_rows)
        traces.append(bc_rows)
        corners.append(cs)
    f_all = jnp.concatenate(rows, axis=1)
    bc_all = jnp.concatenate(traces, axis=1)
    w, diags = kkt.solve_primal_shared(shared, f_all, bc_all)
    shp = (cfg.nz, cfg.ny, cfg.nx)
    coeffs = w.reshape(-1, 3, M, M, M)
    ok = diags.solve_ok.reshape(shp)
    out = []
    for comp in range(3):
        fb = _trilinear_fallback_coeffs(corners[comp], M)
        c = coeffs[:, comp].reshape(*shp, M, M, M)
        c = jnp.where(ok[..., None, None, None],
                      jnp.where(jnp.isfinite(c), c, 0.0), fb)
        out.append(c)
    return jnp.stack(out), diags, shared.cond


def hybrid_solve_elastic_3d(problem: ElasticProblem3D,
                            cfg: ElasticConfig3D,
                            shared_bundle) -> ElasticSolution3D:
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    if cfg.coarse == "richardson":
        # (4 u_{h/2} - u_h)/3 at the shared coarse nodes -> O(h^4) nodal
        # (2D rationale in ``elastic.hybrid_solve_elastic``).
        cfg_f = dataclasses.replace(cfg, nx=2 * cfg.nx, ny=2 * cfg.ny,
                                    nz=2 * cfg.nz)
        xs_f = jnp.linspace(x0, x1, 2 * cfg.nx + 1, dtype=dtype)
        ys_f = jnp.linspace(y0, y1, 2 * cfg.ny + 1, dtype=dtype)
        zs_f = jnp.linspace(z0, z1, 2 * cfg.nz + 1, dtype=dtype)
        fem_f, cg_res = fem_solve_elastic_3d(problem, cfg_f, xs_f, ys_f,
                                             zs_f)
        fem_h, _ = fem_solve_elastic_3d(problem, cfg, xs, ys, zs)
        fem_values = (4.0 * fem_f[:, ::2, ::2, ::2] - fem_h) / 3.0
    else:
        fem_values, cg_res = fem_solve_elastic_3d(problem, cfg, xs, ys,
                                                  zs)
    coeffs, diags, cond = enhance_elastic_3d(
        problem, cfg, xs, ys, zs, fem_values, shared_bundle)
    shp = (cfg.nz, cfg.ny, cfg.nx)
    return ElasticSolution3D(
        xs=xs, ys=ys, zs=zs, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(shp),
        bc_violation=diags.bc_violation.reshape(shp),
        solve_ok=diags.solve_ok.reshape(shp),
        cond_estimate=cond, lam=problem.lam, mu=problem.mu,
    )


def _locate_3d(sol: ElasticSolution3D, x, y, z):
    xs, ys, zs = sol.xs, sol.ys, sol.zs
    nx, ny, nz = xs.shape[0] - 1, ys.shape[0] - 1, zs.shape[0] - 1
    hx, hy, hz = xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]
    ix = jnp.clip(jnp.floor((x - xs[0]) / hx).astype(jnp.int32), 0,
                  nx - 1)
    iy = jnp.clip(jnp.floor((y - ys[0]) / hy).astype(jnp.int32), 0,
                  ny - 1)
    iz = jnp.clip(jnp.floor((z - zs[0]) / hz).astype(jnp.int32), 0,
                  nz - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy
    tz = (2.0 * z - zs[iz] - zs[iz + 1]) / hz
    return ix, iy, iz, tx, ty, tz, hx, hy, hz


def evaluate_elastic_3d(sol: ElasticSolution3D, x, y, z):
    """(u1, u2, u3) at query points [P]."""
    ix, iy, iz, tx, ty, tz, _, _, _ = _locate_3d(sol, x, y, z)
    M = sol.coeffs.shape[-1]
    (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
    (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
    (Vz,) = legendre.legendre_vandermonde(tz, M, num_derivs=0)
    hi = jax.lax.Precision.HIGHEST
    out = []
    for comp in range(3):
        W = sol.coeffs[comp][iz, iy, ix]  # [P, M, M, M]
        out.append(jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx,
                              precision=hi))
    return tuple(out)


def evaluate_stress_3d(sol: ElasticSolution3D, x, y, z):
    """(s11, s22, s33, s12, s13, s23) at query points [P] from exact
    element-polynomial derivatives: sigma = 2 mu eps + lam tr(eps) I
    (3D mirror of ``elastic.evaluate_stress_2d``)."""
    ix, iy, iz, tx, ty, tz, hx, hy, hz = _locate_3d(sol, x, y, z)
    M = sol.coeffs.shape[-1]
    Vx, Vx1 = legendre.legendre_vandermonde(tx, M, num_derivs=1)
    Vy, Vy1 = legendre.legendre_vandermonde(ty, M, num_derivs=1)
    Vz, Vz1 = legendre.legendre_vandermonde(tz, M, num_derivs=1)
    sx, sy, sz = 2.0 / hx, 2.0 / hy, 2.0 / hz
    hi = jax.lax.Precision.HIGHEST
    grads = []
    for comp in range(3):
        W = sol.coeffs[comp][iz, iy, ix]
        dx = sx * jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx1,
                             precision=hi)
        dy = sy * jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy1, Vx,
                             precision=hi)
        dz = sz * jnp.einsum("pk,pklm,pl,pm->p", Vz1, W, Vy, Vx,
                             precision=hi)
        grads.append((dx, dy, dz))
    (u1x, u1y, u1z), (u2x, u2y, u2z), (u3x, u3y, u3z) = grads
    lam, mu = sol.lam, sol.mu
    div = u1x + u2y + u3z
    s11 = 2 * mu * u1x + lam * div
    s22 = 2 * mu * u2y + lam * div
    s33 = 2 * mu * u3z + lam * div
    s12 = mu * (u1y + u2x)
    s13 = mu * (u1z + u3x)
    s23 = mu * (u2z + u3y)
    return s11, s22, s33, s12, s13, s23


class ElasticSolver3D:
    """Facade mirroring ``ElasticSolver2D`` on structured hexes."""

    def __init__(self, problem: ElasticProblem3D,
                 config: ElasticConfig3D = ElasticConfig3D()):
        self.problem = problem
        self.config = config
        self._shared = prepare_shared_elastic_3d(problem, config)
        self.solution: Optional[ElasticSolution3D] = None

    def solve(self) -> ElasticSolution3D:
        self.solution = hybrid_solve_elastic_3d(
            self.problem, self.config, self._shared)
        return self.solution

    def evaluate_solution(self, x, y, z):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_elastic_3d(
            self.solution, jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype))

    def evaluate_stress(self, x, y, z):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_stress_3d(
            self.solution, jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype))

    def errors(self, x, y, z):
        from ..utils import metrics

        us = self.evaluate_solution(x, y, z)
        dtype = us[0].dtype
        xq, yq, zq = (jnp.asarray(v, dtype) for v in (x, y, z))
        linf = 0.0
        l2 = 0.0
        for comp in range(3):
            e = self.problem.exact[comp](xq, yq, zq)
            linf = jnp.maximum(linf, metrics.linf_error(us[comp], e))
            l2 = jnp.maximum(l2, metrics.l2_error(us[comp], e))
        return linf, l2
