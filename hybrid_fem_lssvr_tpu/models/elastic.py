"""2D linear elasticity (plane strain): the first VECTOR-valued family.

The reference prototype solves only scalar second-order 1D problems
(``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:8-18``); this module
extends the two-level hybrid scheme to the coupled elliptic SYSTEM

    -div sigma(u) = f,   sigma = 2 mu eps(u) + lam tr(eps(u)) I,

for displacement u = (u1, u2) on a rectangle with Dirichlet data on the
boundary (constant Lame coefficients lam, mu > 0).  Both stages reuse
the scalar machinery block-wise:

* Coarse stage — Q1 VECTOR elements, matrix-free: the block operator
  [[A11, A12], [A12^T, A22]] is applied through four calls to
  ``assembly2d.apply_stiffness`` with the shared local 4x4 gradient
  matrices (A11 = (lam+2mu) Kxx + mu Kyy, A12 = lam Kxy + mu Kxy^T,
  A22 = mu Kxx + (lam+2mu) Kyy), solved by CG on the stacked
  [2, ny+1, nx+1] grid.  The elasticity form is coercive (Korn), so CG
  applies; preconditioning is block-diagonal — one geometric V-cycle per
  displacement component built from that component's own anisotropic
  diagonal block (pure-stiffness local operators are scale-invariant in
  2D, so every level reuses the same 4x4).
* Enhancement stage — per element, a COUPLED tensor-Legendre fit: one
  shared block collocation operator D [[D11, D12], [D12, D22]] of shape
  [2 C^2, 2 M^2] (the off-diagonal (lam+mu) d2/dxdy rows are what make
  the system non-separable) and a block-diagonal trace matrix
  diag(B, B), pushed through the SAME host-f64 null-space LSE precompute
  as every scalar family (``kkt.precompute_shared_lse_host``) — all
  elements then solve in two MXU matmuls (``kkt.solve_primal_shared``).

Stress readout: ``evaluate_stress_2d`` differentiates the element
polynomials exactly (chain factors 2/h), giving pointwise
(sigma_11, sigma_22, sigma_12) — a first-class quantity the nodal FEM
stage alone cannot deliver at this accuracy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly2d, cg, kkt, legendre
from .hybrid2d import (Problem2D, _bilinear_fallback_coeffs,
                       _boundary_coords, _element_data_2d)


@dataclasses.dataclass(frozen=True)
class ElasticProblem2D:
    """-div sigma(u) = f on a rectangle, u = g on the boundary."""

    name: str
    f1: Callable  # body force components f(x, y)
    f2: Callable
    g1: Callable  # Dirichlet data per displacement component
    g2: Callable
    lam: float = 1.0  # Lame lambda
    mu: float = 1.0  # Lame mu (shear modulus)
    domain: Tuple[float, float, float, float] = (-1.0, 1.0, -1.0, 1.0)
    exact1: Optional[Callable] = None
    exact2: Optional[Callable] = None


def sin_elastic_2d(lam: float = 1.0, mu: float = 1.0) -> ElasticProblem2D:
    """Manufactured solution u1 = sin(pi x) sin(pi y),
    u2 = sin(pi x) sin(2 pi y) (both vanish on the boundary of
    [-1, 1]^2); the body force carries the full coupling:

        f1 = (lam+3mu) pi^2 u1 - 2 (lam+mu) pi^2 cos(pi x) cos(2 pi y)
        f2 = (4lam+9mu) pi^2 u2 - (lam+mu) pi^2 cos(pi x) cos(pi y)
    """
    pi = jnp.pi
    u1 = lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y)  # noqa: E731
    u2 = lambda x, y: jnp.sin(pi * x) * jnp.sin(2 * pi * y)  # noqa: E731
    zero = lambda x, y: jnp.zeros_like(x + y)  # noqa: E731
    return ElasticProblem2D(
        name="sin_elastic_2d",
        f1=lambda x, y: pi ** 2 * ((lam + 3 * mu) * u1(x, y)
                                   - 2 * (lam + mu) * jnp.cos(pi * x)
                                   * jnp.cos(2 * pi * y)),
        f2=lambda x, y: pi ** 2 * ((4 * lam + 9 * mu) * u2(x, y)
                                   - (lam + mu) * jnp.cos(pi * x)
                                   * jnp.cos(pi * y)),
        g1=zero, g2=zero, lam=lam, mu=mu,
        exact1=u1, exact2=u2,
    )


def poly_elastic_2d(lam: float = 2.0, mu: float = 0.5) -> ElasticProblem2D:
    """Inhomogeneous-Dirichlet polynomial solution u1 = x^3 y,
    u2 = x y^3 (exercises the g-override masks on every edge; the cubic
    is inside the element trial space, so the enhancement floor is set
    purely by the FEM traces)."""
    u1 = lambda x, y: x ** 3 * y  # noqa: E731
    u2 = lambda x, y: x * y ** 3  # noqa: E731
    # u1_xx = 6xy, u1_yy = 0, u2_xy = 3y^2; u2_xx = 0, u2_yy = 6xy,
    # u1_xy = 3x^2.
    return ElasticProblem2D(
        name="poly_elastic_2d",
        f1=lambda x, y: -((lam + 2 * mu) * 6 * x * y
                          + (lam + mu) * 3 * y ** 2),
        f2=lambda x, y: -((lam + 2 * mu) * 6 * x * y
                          + (lam + mu) * 3 * x ** 2),
        g1=u1, g2=u2, lam=lam, mu=mu,
        exact1=u1, exact2=u2,
    )


def get_elastic_problem(name: str, **kw) -> ElasticProblem2D:
    table = {"sin_elastic_2d": sin_elastic_2d,
             "poly_elastic_2d": poly_elastic_2d}
    if name not in table:
        raise KeyError(f"unknown elastic problem {name!r}; "
                       f"one of {sorted(table)}")
    return table[name](**kw)


@dataclasses.dataclass(frozen=True)
class ElasticConfig2D:
    nx: int = 16
    ny: int = 16
    M: int = 6  # per-dimension Legendre basis (M^2 coeffs per component)
    n_colloc: int = 6  # interior collocation grid per dimension
    cg_tol: Optional[float] = None  # None -> 100 * eps(dtype)
    cg_maxiter: int = 4000
    precond: str = "auto"  # 'auto' | 'jacobi' | 'mg' (block-diagonal
    # component-wise V-cycles; 'auto' picks mg on even >= 8 grids)
    diagnostics: bool = True
    dtype: Optional[str] = None
    coarse: str = "q1"  # 'q1' (O(h^2) nodal) | 'richardson' (two block
    # Q1 solves at h and h/2 combined as (4 u_{h/2} - u_h)/3 at the
    # coarse nodes -> O(h^4) nodal; measured 16.6x/16.1x per halving at
    # 8->16->32 on sin_elastic_2d.  The scalar compact/Numerov route does
    # NOT transfer to the vector system — the (lam+mu) d2/dxdy coupling is
    # non-separable — so extrapolation is the vector family's high-order
    # coarse stage.  Pair with trace_lift >= 4 so the O(h^4) nodal
    # accuracy carries through the element traces.
    trace_lift: int = 0  # 0: bilinear FEM element trace (O(h^2) — the
    # enhancement floor of the q1 coarse).  >= 2: tangential Lagrange
    # interpolation of nodal grid lines with this stencil width (6
    # typical) — useful ONLY with coarse='richardson', whose O(h^4)
    # nodal values the lift carries onto the traces; over plain q1
    # nodal values (O(h^2)) the lift cannot raise the order.
    backend: str = "auto"  # 'auto' | 'xla' | 'pallas'.  'auto' = XLA:
    # the fused vector kernel (fused_enhance_elastic_2d) was built and
    # measured SLOWER on-chip (0.87x at 512^2 M=4 — NUMERICS.md 35);
    # 'pallas' keeps the measured alternative selectable

    def __post_init__(self):
        if self.precond not in ("auto", "jacobi", "mg"):
            raise ValueError(f"unknown precond: {self.precond!r}")
        if self.coarse not in ("q1", "richardson"):
            raise ValueError(f"unknown coarse: {self.coarse!r}")
        if self.trace_lift == 1 or self.trace_lift < 0:
            raise ValueError("trace_lift must be 0 or >= 2")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend: {self.backend!r}")

    def jnp_dtype(self):
        if self.dtype is not None:
            return jnp.dtype(self.dtype)
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class ElasticSolution2D(NamedTuple):
    xs: jnp.ndarray  # [nx+1]
    ys: jnp.ndarray  # [ny+1]
    fem_values: jnp.ndarray  # [2, ny+1, nx+1] nodal displacements
    coeffs: jnp.ndarray  # [2, ny, nx, M(ky), M(kx)]
    cg_iters: jnp.ndarray
    cg_residual: jnp.ndarray
    max_slack: jnp.ndarray  # [ny, nx]
    bc_violation: jnp.ndarray  # [ny, nx]
    solve_ok: jnp.ndarray  # [ny, nx]
    cond_estimate: jnp.ndarray = None
    lam: float = 1.0
    mu: float = 1.0


@functools.lru_cache(maxsize=None)
def _q1_grad_mats(hx: float, hy: float):
    """Host-f64 local 4x4 gradient Gram matrices on a Q1 rectangle:
    Kxx[a,b] = int dxN_a dxN_b, Kyy likewise, Kxy[a,b] = int dxN_a dyN_b
    (2x2 Gauss — exact for these bilinear integrands)."""
    t, w = assembly2d.gauss_rule(2)
    t, w = np.array(t), np.array(w)
    Kxx = np.zeros((4, 4))
    Kyy = np.zeros((4, 4))
    Kxy = np.zeros((4, 4))
    jac = (hx / 2) * (hy / 2)
    for xi, wx in zip(t, w):
        for eta, wy in zip(t, w):
            _, dN_dxi, dN_deta = assembly2d._q1_shape(xi, eta)
            dx = dN_dxi * (2.0 / hx)
            dy = dN_deta * (2.0 / hy)
            Kxx += wx * wy * jac * np.outer(dx, dx)
            Kyy += wx * wy * jac * np.outer(dy, dy)
            Kxy += wx * wy * jac * np.outer(dx, dy)
    return Kxx, Kyy, Kxy


def _block_locals(problem: ElasticProblem2D, hx: float, hy: float, dtype):
    """Local 4x4 blocks of the vector weak form
    int 2 mu eps(u):eps(v) + lam div u div v."""
    Kxx, Kyy, Kxy = _q1_grad_mats(hx, hy)
    lam, mu = problem.lam, problem.mu
    A11 = (lam + 2 * mu) * Kxx + mu * Kyy
    A22 = mu * Kxx + (lam + 2 * mu) * Kyy
    A12 = lam * Kxy + mu * Kxy.T
    return (jnp.asarray(A11, dtype), jnp.asarray(A12, dtype),
            jnp.asarray(A22, dtype))


def _block_colloc_host(problem: ElasticProblem2D, cfg: ElasticConfig2D):
    """Host-f64 BLOCK collocation operators on the shared element.

    Returns ``(D, B, Mass_s, t_int, bpts)``: the [2 C^2, 2 M^2]
    momentum-balance operator D = [[D11, D12], [D12, D22]], the
    block-diagonal trace matrix B = diag(B_s, B_s), and the SCALAR
    [C^2, M^2] value (mass) rows V0 (x) V0 that the elastodynamics
    march needs for its inertial term (``models/elastic_wave.py``).
    Interior collocation points for the same structural reason as the
    scalar 2D path: at a corner every zero-trace tensor polynomial has
    vanishing second derivatives in BOTH axes, so corner momentum rows
    are unfittable.
    """
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    M, C = cfg.M, cfg.n_colloc
    lam, mu = problem.lam, problem.mu
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = legendre.vandermonde_host(t_int, M)
    sx, sy = 2.0 / hx, 2.0 / hy
    Dxx = (sx * sx) * np.einsum("yk,xl->yxkl", V0, V2).reshape(C * C,
                                                               M * M)
    Dyy = (sy * sy) * np.einsum("yk,xl->yxkl", V2, V0).reshape(C * C,
                                                               M * M)
    Dxy = (sx * sy) * np.einsum("yk,xl->yxkl", V1, V1).reshape(C * C,
                                                               M * M)
    D11 = -((lam + 2 * mu) * Dxx + mu * Dyy)
    D22 = -(mu * Dxx + (lam + 2 * mu) * Dyy)
    D12 = -(lam + mu) * Dxy
    D = np.block([[D11, D12], [D12, D22]])  # [2 C^2, 2 M^2]
    Mass_s = np.einsum("yk,xl->yxkl", V0, V0).reshape(C * C, M * M)
    bpts = _boundary_coords(M)
    V0y_b = legendre.vandermonde_host(bpts[:, 0], M)[0]
    V0x_b = legendre.vandermonde_host(bpts[:, 1], M)[0]
    Bs = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M * M)
    K = Bs.shape[0]
    B = np.zeros((2 * K, 2 * M * M))
    B[:K, :M * M] = Bs
    B[K:, M * M:] = Bs
    return D, B, Mass_s, t_int, bpts


def prepare_shared_elastic(problem: ElasticProblem2D, cfg: ElasticConfig2D):
    """Host-f64 shared-LSE precompute of the steady block operators
    (see ``_block_colloc_host`` for the block structure)."""
    D, B, _, t_int, bpts = _block_colloc_host(problem, cfg)
    shared = kkt.precompute_shared_lse_host(D, B, cfg.jnp_dtype())
    return shared, (jnp.asarray(t_int), jnp.asarray(bpts))


def fem_solve_elastic(problem: ElasticProblem2D, cfg: ElasticConfig2D,
                      xs, ys):
    """Vector Q1 nodal displacements [2, ny+1, nx+1] via block
    matrix-free CG (module docstring)."""
    dtype = xs.dtype
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    A11, A12, A22 = _block_locals(problem, hx, hy, dtype)

    def apply_block(u):
        r1 = (assembly2d.apply_stiffness(u[0], A11)
              + assembly2d.apply_stiffness(u[1], A12))
        r2 = (assembly2d.apply_stiffness(u[0], A12.T)
              + assembly2d.apply_stiffness(u[1], A22))
        return jnp.stack([r1, r2])

    b = jnp.stack([assembly2d.assemble_load(xs, ys, problem.f1),
                   assembly2d.assemble_load(xs, ys, problem.f2)])
    ny1, nx1 = ys.shape[0], xs.shape[0]
    interior = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.stack([
        jnp.where(interior, 0.0, problem.g1(X, Y) * jnp.ones_like(X)),
        jnp.where(interior, 0.0, problem.g2(X, Y) * jnp.ones_like(X)),
    ])

    def apply_free(v):
        return jnp.where(interior, apply_block(v * interior), 0.0)

    rhs = jnp.where(interior, b - apply_block(u_bc), 0.0)
    precond = cfg.precond
    mg_ok = cfg.nx % 2 == 0 and cfg.ny % 2 == 0 and min(cfg.nx,
                                                        cfg.ny) >= 8
    if precond == "auto":
        precond = "mg" if mg_ok else "jacobi"
    if precond == "mg":
        if not mg_ok:
            raise ValueError("precond='mg' needs an even >= 8 grid; "
                             "use precond='jacobi'")
        from ..ops import multigrid

        # Block-diagonal preconditioner: one V-cycle per component on its
        # own anisotropic diagonal block.  Pure-stiffness local operators
        # are scale-invariant in 2D, so every level reuses the fine 4x4.
        vc1 = multigrid.make_vcycle(ny1, nx1, A11, dtype,
                                    loc_for_level=lambda lvl: A11)
        vc2 = multigrid.make_vcycle(ny1, nx1, A22, dtype,
                                    loc_for_level=lambda lvl: A22)

        def M_inv(r):
            z1 = vc1(jnp.where(interior, r[0], 0.0))
            z2 = vc2(jnp.where(interior, r[1], 0.0))
            return jnp.where(interior, jnp.stack([z1, z2]), 0.0)
    else:
        diag = jnp.stack([
            assembly2d.stiffness_diag((ny1, nx1), A11, dtype),
            assembly2d.stiffness_diag((ny1, nx1), A22, dtype),
        ])
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                maxiter=cfg.cg_maxiter)
    u = u_bc + jnp.where(interior, res.x, 0.0)
    return u, res


def _component_problem(problem: ElasticProblem2D, comp: int) -> Problem2D:
    """Scalar Problem2D view of one displacement component, just enough
    for ``hybrid2d._element_data_2d`` (f at collocation points, g on the
    Dirichlet override masks)."""
    f = problem.f1 if comp == 0 else problem.f2
    g = problem.g1 if comp == 0 else problem.g2
    return Problem2D(name=f"{problem.name}:u{comp + 1}", f=f, g=g,
                     domain=problem.domain)


def enhance_elastic(problem: ElasticProblem2D, cfg: ElasticConfig2D,
                    xs, ys, fem_values, shared_bundle):
    """Coupled per-element vector fit: stack both components' collocation
    rhs and trace rows, one ``solve_primal_shared`` over the block LSE
    maps -> [2, ny, nx, M, M] coefficients with the scalar families'
    fallback/gate semantics per element."""
    shared, (t_int, bpts) = shared_bundle
    M = cfg.M
    E = cfg.nx * cfg.ny
    dtype = cfg.jnp_dtype()
    backend = cfg.backend if cfg.trace_lift == 0 else "xla"
    if backend == "auto":
        # 'auto' routes to XLA: the fused vector kernel was built and
        # measured SLOWER on-chip (0.87x at 512^2 M=4 even with the
        # one-stacked-dot layout; tile sweep 2048/8192 worse) — XLA's
        # own fusion of the element-data build wins here, unlike the
        # scalar families (NUMERICS.md 35).  backend='pallas' keeps the
        # measured alternative selectable.
        backend = "xla" 
    if backend == "pallas":
        from ..ops import pallas_kernels as pk

        x0, x1, y0, y1 = problem.domain
        hx = float((x1 - x0) / cfg.nx)
        hy = float((y1 - y0) / cfg.ny)
        w, slack, bcv = pk.fused_enhance_elastic_2d(
            fem_values, shared, (problem.f1, problem.f2),
            (problem.g1, problem.g2), (x0, hx, y0, hy), cfg.nx, cfg.ny,
            t_int, bpts, tile=pk.pick_tile(E, 4096),
            with_diagnostics=cfg.diagnostics,
        )
        corners = []
        for comp in range(2):
            fv = fem_values[comp]
            corners.append((fv[:-1, :-1], fv[:-1, 1:], fv[1:, :-1],
                            fv[1:, 1:]))
        if cfg.diagnostics:
            from .hybrid2d import _pallas_solve_ok

            # tolerance scaled by BOTH components' corner magnitudes
            # (the trilinear-trace bound, scalar rationale).
            ok_flat = (_pallas_solve_ok(slack, bcv, corners[0])
                       & _pallas_solve_ok(slack, bcv, corners[1]))
            diags = kkt.KKTDiagnostics(slack, bcv, ok_flat)
        else:
            z = jnp.zeros((E,), w.dtype)
            diags = kkt.KKTDiagnostics(
                z, z, jnp.all(jnp.isfinite(w), axis=-1))
        coeffs = w.reshape(-1, 2, M, M)
        ok = diags.solve_ok
    else:
        rows, traces, corners = [], [], []
        for comp in range(2):
            f_rows, bc_rows, corner = _element_data_2d(
                _component_problem(problem, comp), cfg, xs, ys,
                fem_values[comp], t_int, bpts,
                trace_lift=cfg.trace_lift,
            )
            rows.append(f_rows)
            traces.append(bc_rows)
            corners.append(corner)
        f_all = jnp.concatenate(rows, axis=1)  # [E, 2 C^2]
        bc_all = jnp.concatenate(traces, axis=1)  # [E, 2 (4M-4)]
        w, diags = kkt.solve_primal_shared(shared, f_all, bc_all)
        coeffs = w.reshape(-1, 2, M, M)
        ok = diags.solve_ok
    out = []
    for comp in range(2):
        fb = _bilinear_fallback_coeffs(*corners[comp], M)
        c = coeffs[:, comp].reshape(cfg.ny, cfg.nx, M, M)
        c = jnp.where(
            ok.reshape(cfg.ny, cfg.nx)[..., None, None],
            jnp.where(jnp.isfinite(c), c, 0.0),
            fb,
        )
        out.append(c)
    return jnp.stack(out), diags, shared.cond


def hybrid_solve_elastic(problem: ElasticProblem2D, cfg: ElasticConfig2D,
                         shared_bundle) -> ElasticSolution2D:
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    if cfg.coarse == "richardson":
        # Two block Q1 solves (h, h/2), h^2-term cancellation at the
        # shared coarse nodes: (4 u_{h/2} - u_h)/3 = u + O(h^4).
        # Boundary nodes carry g exactly in both solves, so the
        # combination preserves the Dirichlet data.
        cfg_f = dataclasses.replace(cfg, nx=2 * cfg.nx, ny=2 * cfg.ny)
        xs_f = jnp.linspace(x0, x1, 2 * cfg.nx + 1, dtype=dtype)
        ys_f = jnp.linspace(y0, y1, 2 * cfg.ny + 1, dtype=dtype)
        fem_f, cg_res = fem_solve_elastic(problem, cfg_f, xs_f, ys_f)
        fem_h, _ = fem_solve_elastic(problem, cfg, xs, ys)
        fem_values = (4.0 * fem_f[:, ::2, ::2] - fem_h) / 3.0
    else:
        fem_values, cg_res = fem_solve_elastic(problem, cfg, xs, ys)
    coeffs, diags, cond = enhance_elastic(problem, cfg, xs, ys,
                                          fem_values, shared_bundle)
    return ElasticSolution2D(
        xs=xs, ys=ys, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(cfg.ny, cfg.nx),
        bc_violation=diags.bc_violation.reshape(cfg.ny, cfg.nx),
        solve_ok=diags.solve_ok.reshape(cfg.ny, cfg.nx),
        cond_estimate=cond, lam=problem.lam, mu=problem.mu,
    )


def _locate(sol: ElasticSolution2D, x, y):
    xs, ys = sol.xs, sol.ys
    nx, ny = xs.shape[0] - 1, ys.shape[0] - 1
    hx, hy = xs[1] - xs[0], ys[1] - ys[0]
    ix = jnp.clip(jnp.floor((x - xs[0]) / hx).astype(jnp.int32), 0,
                  nx - 1)
    iy = jnp.clip(jnp.floor((y - ys[0]) / hy).astype(jnp.int32), 0,
                  ny - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy
    return ix, iy, tx, ty, hx, hy


def evaluate_elastic_2d(sol: ElasticSolution2D, x, y):
    """(u1, u2) at query points [P] — one tensor-Legendre contraction per
    component (same O(1) uniform lookup as ``hybrid2d.evaluate_2d``)."""
    ix, iy, tx, ty, _, _ = _locate(sol, x, y)
    M = sol.coeffs.shape[-1]
    (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
    (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
    hi = jax.lax.Precision.HIGHEST
    out = []
    for comp in range(2):
        W = sol.coeffs[comp][iy, ix]  # [P, M, M]
        out.append(jnp.einsum("pk,pkl,pl->p", Vy, W, Vx, precision=hi))
    return tuple(out)


def evaluate_stress_2d(sol: ElasticSolution2D, x, y):
    """(sigma_11, sigma_22, sigma_12) at query points [P] from exact
    element-polynomial derivatives: sigma = 2 mu eps + lam tr(eps) I."""
    ix, iy, tx, ty, hx, hy = _locate(sol, x, y)
    M = sol.coeffs.shape[-1]
    Vx, Vx1 = legendre.legendre_vandermonde(tx, M, num_derivs=1)
    Vy, Vy1 = legendre.legendre_vandermonde(ty, M, num_derivs=1)
    sx, sy = 2.0 / hx, 2.0 / hy
    hi = jax.lax.Precision.HIGHEST
    grads = []
    for comp in range(2):
        W = sol.coeffs[comp][iy, ix]
        dx = sx * jnp.einsum("pk,pkl,pl->p", Vy, W, Vx1, precision=hi)
        dy = sy * jnp.einsum("pk,pkl,pl->p", Vy1, W, Vx, precision=hi)
        grads.append((dx, dy))
    (u1x, u1y), (u2x, u2y) = grads
    lam, mu = sol.lam, sol.mu
    div = u1x + u2y
    s11 = 2 * mu * u1x + lam * div
    s22 = 2 * mu * u2y + lam * div
    s12 = mu * (u1y + u2x)
    return s11, s22, s12


def _lagrange_weights_runtime(t, k: int):
    """[P, k] Lagrange basis weights at stencil-local coordinates t in
    [0, k-1] (runtime points — the static-per-element analog is
    ``hybrid2d._lift_weights``)."""
    js = jnp.arange(k, dtype=t.dtype)
    diff = t[:, None] - js[None, :]  # [P, k]
    cols = []
    for m in range(k):
        denom = 1.0
        for j in range(k):
            if j != m:
                denom *= (m - j)
        num = jnp.prod(jnp.where(js[None, :] == m, 1.0, diff), axis=1)
        cols.append(num / denom)
    return jnp.stack(cols, axis=1)


def _center_grid_interp(V, x, y, x0, y0, hx, hy, k: int):
    """Tensor Lagrange interpolation of an element-center grid V [ny, nx]
    at runtime query points (k-point stencil per axis, one-sided windows
    near the boundary)."""
    ny, nx = V.shape
    kx, ky = min(k, nx), min(k, ny)
    ux = (x - x0) / hx - 0.5  # center-index coordinate
    uy = (y - y0) / hy - 0.5
    ix0 = jnp.clip(jnp.floor(ux).astype(jnp.int32) - (kx - 1) // 2,
                   0, nx - kx)
    iy0 = jnp.clip(jnp.floor(uy).astype(jnp.int32) - (ky - 1) // 2,
                   0, ny - ky)
    Wx = _lagrange_weights_runtime(ux - ix0.astype(x.dtype), kx)
    Wy = _lagrange_weights_runtime(uy - iy0.astype(y.dtype), ky)
    win = V[iy0[:, None, None] + jnp.arange(ky)[None, :, None],
            ix0[:, None, None] + jnp.arange(kx)[None, None, :]]
    hi = jax.lax.Precision.HIGHEST
    return jnp.einsum("pa,pab,pb->p", Wy, win, Wx, precision=hi)


def recover_stress_2d(sol: ElasticSolution2D, x, y, stencil: int = 4):
    """Superconvergent stress recovery: (sigma_11, sigma_22, sigma_12)
    at query points via element-CENTER sampling + cross-element tensor
    Lagrange interpolation.

    The raw derivative readout (``evaluate_stress_2d``) is O(h) globally
    because the trace error's gradient concentrates at element edges
    (measured Linf 6.75/3.48 at 16^2/32^2 near edges).  At element
    CENTERS the same readout superconverges at O(h^2) (measured
    0.236 -> 0.069), so sampling the [ny, nx] center grid and
    interpolating it with a ``stencil``-point tensor Lagrange window
    (cubic for the default 4 — O(h^4) interpolation, so the sample
    accuracy dominates) yields O(h^2) stress EVERYWHERE, one full order
    above the raw readout."""
    xs, ys = sol.xs, sol.ys
    nx, ny = xs.shape[0] - 1, ys.shape[0] - 1
    cx = 0.5 * (xs[:-1] + xs[1:])
    cy = 0.5 * (ys[:-1] + ys[1:])
    CX, CY = jnp.meshgrid(cx, cy)
    s11c, s22c, s12c = evaluate_stress_2d(sol, CX.ravel(), CY.ravel())
    hx, hy = xs[1] - xs[0], ys[1] - ys[0]
    return tuple(
        _center_grid_interp(c.reshape(ny, nx), x, y, xs[0], ys[0],
                            hx, hy, stencil)
        for c in (s11c, s22c, s12c)
    )


class ElasticSolver2D:
    """Facade mirroring ``HybridSolver2D`` for the elasticity system."""

    def __init__(self, problem: ElasticProblem2D,
                 config: ElasticConfig2D = ElasticConfig2D()):
        self.problem = problem
        self.config = config
        self._shared = prepare_shared_elastic(problem, config)
        self.solution: Optional[ElasticSolution2D] = None

    def solve(self) -> ElasticSolution2D:
        self.solution = hybrid_solve_elastic(self.problem, self.config,
                                             self._shared)
        return self.solution

    def evaluate_solution(self, x, y):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_elastic_2d(self.solution, jnp.asarray(x, dtype),
                                   jnp.asarray(y, dtype))

    def evaluate_stress(self, x, y, recover: bool = False):
        """Raw derivative readout, or (recover=True) the superconvergent
        center-sampled recovery (``recover_stress_2d``)."""
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        fn = recover_stress_2d if recover else evaluate_stress_2d
        return fn(self.solution, jnp.asarray(x, dtype),
                  jnp.asarray(y, dtype))

    def errors(self, x, y):
        """Max over components of (Linf, L2) vs the exact displacement."""
        from ..utils import metrics

        u1, u2 = self.evaluate_solution(x, y)
        dtype = u1.dtype
        xq = jnp.asarray(x, dtype)
        yq = jnp.asarray(y, dtype)
        e1 = self.problem.exact1(xq, yq)
        e2 = self.problem.exact2(xq, yq)
        linf = jnp.maximum(metrics.linf_error(u1, e1),
                           metrics.linf_error(u2, e2))
        l2 = jnp.maximum(metrics.l2_error(u1, e1),
                         metrics.l2_error(u2, e2))
        return linf, l2
