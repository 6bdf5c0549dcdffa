"""Semilinear elliptic problems: -a0 u'' + s(u) = f via Newton at BOTH
levels (beyond-reference capability; the reference is linear 1D Poisson
only, ``Hybrid-FEM-LSSVR.py:8-18``).

Stage 1 — FEM Newton: each iteration assembles the linearised operator
-a0 w'' + s'(u_k) w with the reaction FIELD sampled from the current P1
iterate (``assembly.assemble_p1`` takes coefficient callables; the field
enters as a jnp.interp closure), solves the tridiagonal correction, and
updates.  A fixed small iteration count inside ``lax.scan`` keeps the
whole loop one compiled program (Newton is quadratic: 6 iterations take
a smooth problem to f64 roundoff).

Stage 2 — element-level Newton enhancement: per element the polynomial
coefficients w solve the NONLINEAR collocation system
-a0 u''(x_j) + s(u(x_j)) = f(x_j) with endpoint traces pinned to the
FEM nodal values.  Each Newton step is one batched null-space LSE solve
(``kkt.solve_batched`` with per-element D_k = -a0 (2/h)^2 V2 +
diag(s'(u_j)) V0) — the nonlinearity is evaluated EXACTLY at the
collocation points from the current polynomial, so the interior keeps
spectral accuracy and the hybrid Linf floor stays the FEM nodal error,
exactly as in the linear case.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly, kkt, legendre, tridiag
from .hybrid import SolverConfig

HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class SemilinearProblem1D:
    """-a0 u'' + s(u) = f on (x0, x1), Dirichlet u = g at both ends."""

    name: str
    s: Callable  # nonlinearity s(u)
    ds: Callable  # s'(u)
    f: Callable  # rhs f(x)
    a0: float = 1.0
    domain: Tuple[float, float] = (-1.0, 1.0)
    g_left: float = 0.0
    g_right: float = 0.0
    exact: Optional[Callable] = None


def bratu_1d(lam: float = 1.0) -> SemilinearProblem1D:
    """-u'' + lam e^u = f manufactured so u = sin(pi x) (a stabilised
    Bratu-type nonlinearity: +lam e^u is monotone, so Newton converges
    globally from zero)."""
    pi = jnp.pi
    return SemilinearProblem1D(
        name=f"bratu_1d_lam{lam:g}",
        s=lambda u: lam * jnp.exp(u),
        ds=lambda u: lam * jnp.exp(u),
        f=lambda x: pi**2 * jnp.sin(pi * x)
        + lam * jnp.exp(jnp.sin(pi * x)),
        exact=lambda x: jnp.sin(pi * x),
    )


def cubic_1d() -> SemilinearProblem1D:
    """-u'' + u^3 = f manufactured so u = sin(pi x)."""
    pi = jnp.pi
    return SemilinearProblem1D(
        name="cubic_1d",
        s=lambda u: u**3,
        ds=lambda u: 3.0 * u**2,
        f=lambda x: pi**2 * jnp.sin(pi * x) + jnp.sin(pi * x) ** 3,
        exact=lambda x: jnp.sin(pi * x),
    )


class SemilinearSolution(NamedTuple):
    nodes: jnp.ndarray
    fem_values: jnp.ndarray  # [N] converged Newton iterate
    coeffs: jnp.ndarray  # [E, M]
    newton_residuals: jnp.ndarray  # [n_newton] FEM-level |R|_inf history
    colloc_residual: jnp.ndarray  # scalar: final max |PDE residual|
    solve_ok: jnp.ndarray  # [E]


def fem_newton(problem: SemilinearProblem1D, cfg: SolverConfig,
               n_newton: int = 8, scheme: str = "p1"):
    """Converged Newton iterate (one compiled lax.scan).

    ``scheme="p1"``: consistent P1 FEM rows — O(h^2) nodal (the s(u)
    mass term breaks the linear-Poisson Green-function nodal exactness,
    measured).  ``scheme="numerov"``: the compact rows
    -a0 delta^2 u / h^2 + (1, 10, 1)/12 · (s(u) - f) = 0 — O(h^4) nodal
    (the steady analog of TransientConfig.mass="numerov")."""
    if scheme == "numerov":
        return _numerov_newton(problem, cfg, n_newton)
    dtype = cfg.jnp_dtype()
    x0, x1 = problem.domain
    nodes = jnp.linspace(x0, x1, cfg.num_nodes, dtype=dtype)
    zero_f = lambda x: jnp.zeros_like(x)  # noqa: E731
    sub0, main0, sup0, _ = assembly.assemble_p1(
        nodes, lambda x: problem.a0 * jnp.ones_like(x), None, None,
        zero_f, quad_order=cfg.fem_quad_order)
    _, _, _, b = assembly.assemble_p1(
        nodes, None, None, None, problem.f,
        quad_order=cfg.fem_quad_order)
    g_l = jnp.asarray(problem.g_left, dtype)
    g_r = jnp.asarray(problem.g_right, dtype)
    free = jnp.ones_like(nodes, bool).at[0].set(False).at[-1].set(False)

    def tri_apply(sub, main, sup, u):
        return (main * u
                + sub * jnp.concatenate([u[:1] * 0, u[:-1]])
                + sup * jnp.concatenate([u[1:], u[:1] * 0]))

    def newton_step(u, _):
        # residual R(u) = A0 u + int s(u_h) v - b  (free rows)
        _, _, _, load_s = assembly.assemble_p1(
            nodes, None, None, None,
            lambda x: problem.s(jnp.interp(x, nodes, u)),
            quad_order=cfg.fem_quad_order)
        R = jnp.where(free, tri_apply(sub0, main0, sup0, u) + load_s - b,
                      0.0)
        # Jacobian: A0 + mass-weighted s'(u_h) field
        sub_c, main_c, sup_c, _ = assembly.assemble_p1(
            nodes, None, None,
            lambda x: problem.ds(jnp.interp(x, nodes, u)), zero_f,
            quad_order=cfg.fem_quad_order)
        sub_j = jnp.where(free, sub0 + sub_c, 0.0)
        sup_j = jnp.where(free, sup0 + sup_c, 0.0)
        main_j = jnp.where(free, main0 + main_c, 1.0)
        # boundary columns: delta = 0 there, so just zero the couplings
        sub_j = sub_j.at[-1].set(0.0)
        sup_j = sup_j.at[0].set(0.0)
        delta = tridiag.solve(sub_j, main_j, sup_j, R,
                              method=cfg.tridiag_method)
        return u - jnp.where(free, delta, 0.0), jnp.max(jnp.abs(R))

    u0 = jnp.zeros_like(nodes).at[0].set(g_l).at[-1].set(g_r)
    u, residuals = jax.lax.scan(newton_step, u0, None, length=n_newton)
    return nodes, u, residuals


def _numerov_newton(problem: SemilinearProblem1D, cfg: SolverConfig,
                    n_newton: int = 8):
    """Compact 4th-order Newton: rows
    -a0 (u_{i-1} - 2 u_i + u_{i+1})/h^2
    + (s(u)_{i-1} + 10 s(u)_i + s(u)_{i+1})/12
    = (f_{i-1} + 10 f_i + f_{i+1})/12  at interior nodes."""
    dtype = cfg.jnp_dtype()
    x0, x1 = problem.domain
    N = cfg.num_nodes
    nodes = jnp.linspace(x0, x1, N, dtype=dtype)
    h = nodes[1] - nodes[0]
    f_n = problem.f(nodes) * jnp.ones_like(nodes)
    g_l = jnp.asarray(problem.g_left, dtype)
    g_r = jnp.asarray(problem.g_right, dtype)
    free = jnp.ones_like(nodes, bool).at[0].set(False).at[-1].set(False)

    def w112(v):  # (1, 10, 1)/12 weighting (interior rows only used)
        vm = jnp.concatenate([v[:1] * 0, v[:-1]])
        vp = jnp.concatenate([v[1:], v[:1] * 0])
        return (vm + 10.0 * v + vp) / 12.0

    def d2(v):
        vm = jnp.concatenate([v[:1] * 0, v[:-1]])
        vp = jnp.concatenate([v[1:], v[:1] * 0])
        return (vm - 2.0 * v + vp) / (h * h)

    def newton_step(u, _):
        R = jnp.where(free,
                      -problem.a0 * d2(u) + w112(problem.s(u))
                      - w112(f_n), 0.0)
        c = problem.ds(u)
        cm = jnp.concatenate([c[:1] * 0, c[:-1]])
        cp = jnp.concatenate([c[1:], c[:1] * 0])
        a = problem.a0 / (h * h)
        sub = jnp.where(free, -a + cm / 12.0, 0.0).at[-1].set(0.0)
        sup = jnp.where(free, -a + cp / 12.0, 0.0).at[0].set(0.0)
        main = jnp.where(free, 2.0 * a + 10.0 * c / 12.0, 1.0)
        delta = tridiag.solve(sub, main, sup, R,
                              method=cfg.tridiag_method)
        return u - jnp.where(free, delta, 0.0), jnp.max(jnp.abs(R))

    u0 = jnp.zeros_like(nodes).at[0].set(g_l).at[-1].set(g_r)
    u, residuals = jax.lax.scan(newton_step, u0, None, length=n_newton)
    return nodes, u, residuals


def hybrid_solve_semilinear(problem: SemilinearProblem1D,
                            cfg: SolverConfig, n_newton: int = 8,
                            n_newton_elem: int = 5, scheme: str = "p1"):
    """Full semilinear hybrid solve: FEM Newton + element-level Newton
    enhancement (module docstring)."""
    dtype = cfg.jnp_dtype()
    nodes, fem_values, fem_res = fem_newton(problem, cfg, n_newton,
                                            scheme=scheme)
    E = cfg.num_nodes - 1
    M, C = cfg.M, cfg.n_colloc
    h = nodes[1] - nodes[0]
    # host f64 reference-coordinate operators
    V0h, V1h, V2h = legendre.collocation_vandermonde_host(M, C)
    B = np.stack([V0h[0], V0h[-1]])
    Z, Pbc = kkt.nullspace_host(B)
    V0 = jnp.asarray(V0h, dtype)
    D2 = jnp.asarray(V2h, dtype)
    Bj = jnp.asarray(B, dtype)
    Zj = jnp.asarray(Z, dtype)
    Pj = jnp.asarray(Pbc, dtype)
    scale2 = (2.0 / h) ** 2
    t = legendre.collocation_points(C, dtype=dtype)
    xl = nodes[:-1]
    xc = xl[:, None] + 0.5 * h * (t[None, :] + 1.0)  # [E, C]
    f_c = problem.f(xc) * jnp.ones_like(xc)
    g_l = jnp.asarray(problem.g_left, dtype)
    g_r = jnp.asarray(problem.g_right, dtype)
    u_left = fem_values[:-1].at[0].set(g_l)
    u_right = fem_values[1:].at[-1].set(g_r)
    bc = jnp.stack([u_left, u_right], axis=-1)

    # start from the P1 interpolant's Legendre coefficients
    w = kkt.linear_fallback_coeffs(u_left, u_right, M)

    def elem_newton(w, _):
        u_c = jnp.einsum("ck,ek->ec", V0, w, precision=HI)  # [E, C]
        c_field = problem.ds(u_c)
        # linearised collocation operator rows: -a0 (2/h)^2 V2 + c V0
        D = (-problem.a0 * scale2) * D2[None] \
            + c_field[..., None] * V0[None]
        rhs = f_c - problem.s(u_c) + c_field * u_c
        w1, diags = kkt.solve_batched(D, Bj, rhs, bc, cfg.gamma,
                                      ZP=(Zj, Pj))
        return w1, diags

    w, diags_hist = jax.lax.scan(elem_newton, w, None,
                                 length=n_newton_elem)
    # final nonlinear collocation residual (the real convergence check)
    u_c = jnp.einsum("ck,ek->ec", V0, w, precision=HI)
    upp = scale2 * jnp.einsum("ck,ek->ec", D2, w, precision=HI)
    res = jnp.max(jnp.abs(-problem.a0 * upp + problem.s(u_c) - f_c))
    ok = jax.tree_util.tree_map(lambda a: a[-1], diags_hist).solve_ok
    return SemilinearSolution(nodes, fem_values, w, fem_res, res, ok)


def evaluate_semilinear(sol: SemilinearSolution, x):
    from ..ops import eval as ev

    return ev.evaluate(sol.nodes, sol.coeffs, x)


# --------------------------------------------------------------- 2D


@dataclasses.dataclass(frozen=True)
class SemilinearProblem2D:
    """-a0 Lap u + s(u) = f on a rectangle, Dirichlet u = g."""

    name: str
    s: Callable
    ds: Callable
    f: Callable  # f(x, y)
    g: Callable  # Dirichlet data
    a0: float = 1.0
    domain: Tuple[float, float, float, float] = (-1.0, 1.0, -1.0, 1.0)
    exact: Optional[Callable] = None


def cubic_2d() -> SemilinearProblem2D:
    """-Lap u + u^3 = f manufactured so u = sin(pi x) sin(pi y)."""
    pi = jnp.pi

    def u(x, y):
        return jnp.sin(pi * x) * jnp.sin(pi * y)

    return SemilinearProblem2D(
        name="cubic_2d",
        s=lambda v: v**3,
        ds=lambda v: 3.0 * v**2,
        f=lambda x, y: 2.0 * pi**2 * u(x, y) + u(x, y) ** 3,
        g=lambda x, y: jnp.zeros_like(x + y),
        exact=u,
    )


class SemilinearSolution2D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    fem_values: jnp.ndarray
    coeffs: jnp.ndarray  # [ny, nx, M, M]
    newton_residuals: jnp.ndarray
    colloc_residual: jnp.ndarray
    solve_ok: jnp.ndarray


def fem_newton_2d(problem: SemilinearProblem2D, cfg,
                  n_newton: int = 8, scheme: str = "p1"):
    """Coarse Newton stage of the 2D semilinear solve (the FEM level of
    ``hybrid_solve_semilinear_2d``, factored out so the distributed path
    — ``parallel/sharded_families.py`` — can replicate it).  Returns
    ``(xs, ys, fem, fem_res)``."""
    from ..ops import assembly2d, cg

    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    nx, ny = cfg.nx, cfg.ny
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    xs = jnp.linspace(x0, x1, nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, ny + 1, dtype=dtype)
    numerov = scheme == "numerov"
    if numerov:
        K_A_np, K_M_np = assembly2d.q1_numerov_locals(hx, hy, problem.a0,
                                                      0.0)
        K0 = jnp.asarray(K_A_np, dtype)
        K_M = jnp.asarray(K_M_np, dtype)
    else:
        K0 = jnp.asarray(assembly2d.q1_local_operator(
            hx, hy, problem.a0, 0.0, 0.0, 0.0), dtype)
        K_M = None
    interior = jnp.zeros((ny + 1, nx + 1), bool).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))
    m = hx * hy  # lumped Q1 mass at interior nodes (p1 scheme)
    f_n = problem.f(X, Y) * jnp.ones_like(X)
    diag0 = assembly2d.stiffness_diag((ny + 1, nx + 1), K0, dtype)
    if numerov:
        Mf = assembly2d.apply_stiffness(f_n, K_M)
        diagM = assembly2d.stiffness_diag((ny + 1, nx + 1), K_M, dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def newton_step(u, _):
        if numerov:
            R = jnp.where(interior,
                          assembly2d.apply_stiffness(u, K0)
                          + assembly2d.apply_stiffness(problem.s(u), K_M)
                          - Mf, 0.0)
        else:
            R = jnp.where(interior,
                          assembly2d.apply_stiffness(u, K0)
                          + m * (problem.s(u) - f_n), 0.0)
        c = problem.ds(u)

        def J_apply(v):
            vi = v * interior
            if numerov:
                return jnp.where(
                    interior,
                    assembly2d.apply_stiffness(vi, K0)
                    + assembly2d.apply_stiffness(c * vi, K_M), 0.0)
            return jnp.where(
                interior,
                assembly2d.apply_stiffness(vi, K0) + m * c * vi, 0.0)

        dj = diagM * c if numerov else m * c
        M_inv = jnp.where(interior, 1.0 / (diag0 + dj), 1.0)
        res = cg.cg(J_apply, R, M_inv=M_inv, tol=tol,
                    maxiter=cfg.cg_maxiter)
        return u - jnp.where(interior, res.x, 0.0), jnp.max(jnp.abs(R))

    fem, fem_res = jax.lax.scan(newton_step, u_bc, None, length=n_newton)
    return xs, ys, fem, fem_res


def _semilinear2d_element_parts_host(problem: SemilinearProblem2D, cfg,
                                     dtype):
    """Host-precomputed shared element operators for the 2D element-level
    Newton: (Lap rows scaled by -a0, Mass rows, trace matrix B, its
    null-space pair (Z, Pbc)) — shared by the single-device and
    distributed (``parallel/sharded_families.py``) enhancement."""
    from .hybrid2d import _boundary_coords

    M_, C = cfg.M, cfg.n_colloc
    x0, x1, y0, y1 = problem.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0h, _, V2h = legendre.vandermonde_host(t_int, M_)
    sx, sy = 2.0 / hx, 2.0 / hy
    Lap = (sx * sx * np.einsum("yk,xl->yxkl", V0h, V2h)
           + sy * sy * np.einsum("yk,xl->yxkl", V2h, V0h)
           ).reshape(C * C, M_ * M_)
    Mass = np.einsum("yk,xl->yxkl", V0h, V0h).reshape(C * C, M_ * M_)
    bpts = _boundary_coords(M_)
    V0y_b = legendre.vandermonde_host(bpts[:, 0], M_)[0]
    V0x_b = legendre.vandermonde_host(bpts[:, 1], M_)[0]
    B = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M_ * M_)
    Z, Pbc = kkt.nullspace_host(B)
    return (jnp.asarray(-problem.a0 * Lap, dtype),
            jnp.asarray(Mass, dtype), jnp.asarray(B, dtype),
            jnp.asarray(Z, dtype), jnp.asarray(Pbc, dtype),
            t_int, bpts)


def hybrid_solve_semilinear_2d(problem: SemilinearProblem2D, cfg,
                               n_newton: int = 8, n_newton_elem: int = 5,
                               scheme: str = "p1", trace_lift: int = 0):
    """2D two-level Newton (lift of ``hybrid_solve_semilinear``).

    FEM level, ``scheme="p1"``: matrix-free Q1 with the nonlinearity
    mass-LUMPED at the nodes (R = A0 u + m·(s(u) - f) with m the lumped
    Q1 mass — the standard O(h^2) scheme; lumping keeps the Jacobian
    apply matrix-free: J v = A0 v + m s'(u) v, solved by Jacobi-CG inside
    a lax.scan Newton loop).  ``scheme="numerov"``: tensor-Numerov
    compact rows A u + M s(u) = M f (``assembly2d.q1_numerov_locals``) —
    O(h^4) nodal, Jacobian J v = A v + M (s'(u) v), still matrix-free.
    Element level: Newton on the nonlinear collocation system with the
    nonlinearity evaluated exactly at interior collocation points; each
    step one batched null-space LSE solve with per-element
    D = -a0·Lap_rows + diag(s'(u_j))·Mass_rows.

    ``trace_lift >= 2`` replaces the bilinear element trace with the
    tangential-Lagrange lift (``hybrid2d._lifted_trace_2d``) — paired
    with ``scheme="numerov"`` the O(h^4) nodal values carry to an O(h^4)
    hybrid solution (the semilinear analog of
    ``Solver2DConfig(coarse="compact", trace_lift=6)``)."""
    from .hybrid2d import _element_data_2d

    dtype = cfg.jnp_dtype()
    nx, ny = cfg.nx, cfg.ny
    x0, x1, y0, y1 = problem.domain
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    xs, ys, fem, fem_res = fem_newton_2d(problem, cfg, n_newton, scheme)

    # element-level Newton: shared host reference parts
    M_, C = cfg.M, cfg.n_colloc
    Lap_j, Mass_j, Bj, Zj, Pj, t_int, bpts = \
        _semilinear2d_element_parts_host(problem, cfg, dtype)
    E = nx * ny
    t_int_j = jnp.asarray(t_int)
    bpts_j = jnp.asarray(bpts)
    # f at interior collocation + traces from the converged FEM grid
    # (trace_lift >= 2: tangential-Lagrange lifted traces, g-exact on
    # domain-boundary edges — handled inside _element_data_2d)
    _, bc_rows, corners = _element_data_2d(
        _P2DStub(problem), cfg, xs, ys, fem, t_int_j, bpts_j,
        trace_lift=trace_lift)
    t_j = jnp.asarray(t_int, dtype)
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    xq = xm[:, None] + 0.5 * hx * t_j[None, :]
    yq = ym[:, None] + 0.5 * hy * t_j[None, :]
    F = problem.f(xq[None, :, None, :], yq[:, None, :, None])
    f_rows = (F * jnp.ones((ny, nx, C, C), dtype)).reshape(E, C * C)
    # initial fit: bilinear interpolant projected through the Mass map
    from .hybrid2d import _bilinear_fallback_coeffs

    w = _bilinear_fallback_coeffs(*corners, M_).reshape(E, M_ * M_)
    # pad the bilinear coeffs [2, 2] into the [M, M] layout
    # (_bilinear_fallback_coeffs already returns [ny, nx, M, M])

    def elem_newton(w, _):
        u_c = jnp.dot(w, Mass_j.T, precision=HI)  # values at colloc
        c_field = problem.ds(u_c)
        D = Lap_j[None] + c_field[..., None] * Mass_j[None]
        rhs = f_rows - problem.s(u_c) + c_field * u_c
        w1, diags = kkt.solve_batched(D, Bj, rhs, bc_rows, cfg.gamma,
                                      ZP=(Zj, Pj))
        return w1, diags

    w, diags_hist = jax.lax.scan(elem_newton, w, None,
                                 length=n_newton_elem)
    u_c = jnp.dot(w, Mass_j.T, precision=HI)
    lap_u = jnp.dot(w, Lap_j.T, precision=HI)
    res = jnp.max(jnp.abs(lap_u + problem.s(u_c) - f_rows))
    ok = jax.tree_util.tree_map(lambda a: a[-1], diags_hist).solve_ok
    return SemilinearSolution2D(xs, ys, fem,
                                w.reshape(ny, nx, M_, M_), fem_res, res,
                                ok.reshape(ny, nx))


class _P2DStub:
    """Adapter exposing the Problem2D attributes _element_data_2d needs
    (f is evaluated there but discarded by the caller; bc_edges all
    Dirichlet)."""

    def __init__(self, p):
        self.f = p.f
        self.g = p.g
        self.bc_edges = ("dirichlet",) * 4


def evaluate_semilinear_2d(sol: SemilinearSolution2D, x, y):
    from .hybrid2d import Solution2D, evaluate_2d

    s2 = Solution2D(sol.xs, sol.ys, sol.fem_values, sol.coeffs,
                    0, 0.0, None, None, None)
    return evaluate_2d(s2, x, y)


# --------------------------------------------------------------- 3D


@dataclasses.dataclass(frozen=True)
class SemilinearProblem3D:
    """-a0 Lap u + s(u) = f on a box, Dirichlet u = g."""

    name: str
    s: Callable
    ds: Callable
    f: Callable  # f(x, y, z)
    g: Callable  # Dirichlet data
    a0: float = 1.0
    domain: Tuple[float, ...] = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
    exact: Optional[Callable] = None


def cubic_3d() -> SemilinearProblem3D:
    """-Lap u + u^3 = f manufactured so u = sin(pi x) sin(pi y) sin(pi z)."""
    pi = jnp.pi

    def u(x, y, z):
        return jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)

    return SemilinearProblem3D(
        name="cubic_3d",
        s=lambda v: v**3,
        ds=lambda v: 3.0 * v**2,
        f=lambda x, y, z: 3.0 * pi**2 * u(x, y, z) + u(x, y, z) ** 3,
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        exact=u,
    )


class SemilinearSolution3D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    zs: jnp.ndarray
    fem_values: jnp.ndarray  # [nz+1, ny+1, nx+1]
    coeffs: jnp.ndarray  # [nz, ny, nx, M, M, M]
    newton_residuals: jnp.ndarray
    colloc_residual: jnp.ndarray
    solve_ok: jnp.ndarray  # [nz, ny, nx]


def fem_newton_3d(problem: SemilinearProblem3D, cfg,
                  n_newton: int = 8, scheme: str = "p1"):
    """Coarse Newton stage of the 3D semilinear solve (the FEM level of
    ``hybrid_solve_semilinear_3d``, factored out so the distributed path
    — ``parallel/sharded_families.py`` — can replicate it).  Returns
    ``(xs, ys, zs, fem, fem_res)``."""
    from ..ops import assembly3d, cg

    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    hz = float((z1 - z0) / nz)
    xs = jnp.linspace(x0, x1, nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, nz + 1, dtype=dtype)
    numerov = scheme == "numerov"
    if numerov:
        K_A_np, K_M_np = assembly3d.q1_numerov_locals_3d(
            hx, hy, hz, problem.a0, 0.0)
        K0 = jnp.asarray(K_A_np, dtype)
        K_M = jnp.asarray(K_M_np, dtype)
    else:
        K0 = jnp.asarray(assembly3d.q1_local_operator_3d(
            hx, hy, hz, problem.a0, 0.0, 0.0, 0.0, 0.0), dtype)
        K_M = None
    interior = (jnp.zeros((nz + 1, ny + 1, nx + 1), bool)
                .at[1:-1, 1:-1, 1:-1].set(True))
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z_ = zs[:, None, None]
    ones = jnp.ones((nz + 1, ny + 1, nx + 1), dtype)
    u_bc = jnp.where(interior, 0.0, problem.g(X, Y, Z_) * ones)
    m = hx * hy * hz  # lumped Q1 mass at interior nodes (p1 scheme)
    f_n = problem.f(X, Y, Z_) * ones
    diag0 = assembly3d.stiffness_diag_3d((nz + 1, ny + 1, nx + 1), K0,
                                         dtype)
    if numerov:
        Mf = assembly3d.apply_stiffness_3d(f_n, K_M)
        diagM = assembly3d.stiffness_diag_3d((nz + 1, ny + 1, nx + 1),
                                             K_M, dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def newton_step(u, _):
        if numerov:
            R = jnp.where(interior,
                          assembly3d.apply_stiffness_3d(u, K0)
                          + assembly3d.apply_stiffness_3d(problem.s(u),
                                                          K_M)
                          - Mf, 0.0)
        else:
            R = jnp.where(interior,
                          assembly3d.apply_stiffness_3d(u, K0)
                          + m * (problem.s(u) - f_n), 0.0)
        c = problem.ds(u)

        def J_apply(v):
            vi = v * interior
            if numerov:
                return jnp.where(
                    interior,
                    assembly3d.apply_stiffness_3d(vi, K0)
                    + assembly3d.apply_stiffness_3d(c * vi, K_M), 0.0)
            return jnp.where(
                interior,
                assembly3d.apply_stiffness_3d(vi, K0) + m * c * vi, 0.0)

        dj = diagM * c if numerov else m * c
        M_inv = jnp.where(interior, 1.0 / (diag0 + dj), 1.0)
        res = cg.cg(J_apply, R, M_inv=M_inv, tol=tol,
                    maxiter=cfg.cg_maxiter)
        return u - jnp.where(interior, res.x, 0.0), jnp.max(jnp.abs(R))

    fem, fem_res = jax.lax.scan(newton_step, u_bc, None, length=n_newton)
    return xs, ys, zs, fem, fem_res


def _semilinear3d_element_parts_host(problem: SemilinearProblem3D, cfg,
                                     dtype):
    """Host-precomputed shared element operators for the 3D element-level
    Newton (the tensor lift of ``_semilinear2d_element_parts_host``;
    shared by the single-device and distributed enhancement)."""
    from .hybrid3d import _surface_coords

    M_, C = cfg.M, cfg.n_colloc
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0h, _, V2h = legendre.vandermonde_host(t_int, M_)
    sx, sy, sz = 2.0 / hx, 2.0 / hy, 2.0 / hz

    def t3(Az, Ay, Ax):
        return np.einsum("zk,yl,xm->zyxklm", Az, Ay, Ax).reshape(
            C * C * C, M_ * M_ * M_)

    Lap = (sx * sx * t3(V0h, V0h, V2h) + sy * sy * t3(V0h, V2h, V0h)
           + sz * sz * t3(V2h, V0h, V0h))
    Mass = t3(V0h, V0h, V0h)
    spts = _surface_coords(M_)
    Vz_b = legendre.vandermonde_host(spts[:, 0], M_)[0]
    Vy_b = legendre.vandermonde_host(spts[:, 1], M_)[0]
    Vx_b = legendre.vandermonde_host(spts[:, 2], M_)[0]
    B = np.einsum("pk,pl,pm->pklm", Vz_b, Vy_b, Vx_b).reshape(
        -1, M_ * M_ * M_)
    Z, Pbc = kkt.nullspace_host(B)
    return (jnp.asarray(-problem.a0 * Lap, dtype),
            jnp.asarray(Mass, dtype), jnp.asarray(B, dtype),
            jnp.asarray(Z, dtype), jnp.asarray(Pbc, dtype),
            t_int, spts)


def hybrid_solve_semilinear_3d(problem: SemilinearProblem3D, cfg,
                               n_newton: int = 8, n_newton_elem: int = 5,
                               scheme: str = "p1", trace_lift: int = 0):
    """3D two-level Newton (tensor lift of ``hybrid_solve_semilinear_2d``:
    matrix-free Q1 hex Newton with lumped-mass nonlinearity and Jacobi-CG
    inner solves, then element-level Newton on the nonlinear collocation
    system — each step one batched null-space LSE solve).

    ``scheme="numerov"``: tensor-Numerov compact rows A u + M s(u) = M f
    (``assembly3d.q1_numerov_locals_3d``) — O(h^4) nodal.
    ``trace_lift >= 2``: plane-lifted element traces
    (``hybrid3d._lifted_trace_3d`` via ``_element_data_3d``); the pair
    gives an O(h^4) hybrid semilinear solution."""
    from .hybrid3d import (_element_data_3d,  # noqa: F401
                           _trilinear_fallback_coeffs)

    dtype = cfg.jnp_dtype()
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    hz = float((z1 - z0) / nz)
    xs, ys, zs, fem, fem_res = fem_newton_3d(problem, cfg, n_newton,
                                             scheme)

    # element-level Newton: shared host reference parts (tensor triples)
    M_, C = cfg.M, cfg.n_colloc
    Lap_j, Mass_j, Bj, Zj, Pj, t_int, spts = \
        _semilinear3d_element_parts_host(problem, cfg, dtype)
    E = nx * ny * nz
    # f at interior collocation + traces from the converged FEM grid
    # (trace_lift >= 2: plane-lifted traces, g-exact on boundary faces)
    f_rows, bc_rows, cs = _element_data_3d(
        _P3DStub(problem), cfg, xs, ys, zs, fem, jnp.asarray(t_int),
        jnp.asarray(spts), trace_lift=trace_lift)
    w = _trilinear_fallback_coeffs(cs, M_).reshape(E, M_ * M_ * M_)

    def elem_newton(w, _):
        u_c = jnp.dot(w, Mass_j.T, precision=HI)  # values at colloc
        c_field = problem.ds(u_c)
        D = Lap_j[None] + c_field[..., None] * Mass_j[None]
        rhs = f_rows - problem.s(u_c) + c_field * u_c
        w1, diags = kkt.solve_batched(D, Bj, rhs, bc_rows, cfg.gamma,
                                      ZP=(Zj, Pj))
        return w1, diags

    w, diags_hist = jax.lax.scan(elem_newton, w, None,
                                 length=n_newton_elem)
    u_c = jnp.dot(w, Mass_j.T, precision=HI)
    lap_u = jnp.dot(w, Lap_j.T, precision=HI)
    res = jnp.max(jnp.abs(lap_u + problem.s(u_c) - f_rows))
    ok = jax.tree_util.tree_map(lambda a: a[-1], diags_hist).solve_ok
    return SemilinearSolution3D(xs, ys, zs, fem,
                                w.reshape(nz, ny, nx, M_, M_, M_),
                                fem_res, res, ok.reshape(nz, ny, nx))


class _P3DStub:
    """Adapter exposing the Problem3D attributes _element_data_3d needs
    (f evaluated there and returned as the linear rhs rows — the caller
    rebuilds the nonlinear rhs per Newton step; bc_faces all Dirichlet)."""

    def __init__(self, p):
        self.f = p.f
        self.g = p.g
        self.bc_faces = ("dirichlet",) * 6


def evaluate_semilinear_3d(sol: SemilinearSolution3D, x, y, z):
    from .hybrid3d import Solution3D, evaluate_3d

    s3 = Solution3D(sol.xs, sol.ys, sol.zs, sol.fem_values, sol.coeffs,
                    0, 0.0, None, None, None, None)
    return evaluate_3d(s3, x, y, z)
