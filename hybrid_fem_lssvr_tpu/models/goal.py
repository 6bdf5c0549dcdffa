"""Goal-oriented (dual-weighted-residual) adaptivity — 1D, 2D and 3D.

Extends the slack-driven loop of ``models/adaptive.py`` to quantities of
interest J(u) = int j(x) u(x) dx.  The reference has no error estimation
at all (it computes per-element slack then discards it,
``Hybrid-FEM-LSSVR.py:102-103``); this module closes the loop with the
classical DWR identity.  For L u = -(a u')' + b u' + c u = f with
Dirichlet data matched exactly at the domain ends, the adjoint problem is

    L* z = -(a z')' - (b z)' + c z = j,    z(x0) = z(x1) = 0,

and, because the enhanced solution u_h is continuous (element traces are
pinned to the shared FEM nodal values on both sides of every face) while
u_h' jumps at faces, integration by parts gives EXACTLY

    J(u) - J(u_h) = sum_e  int_e R(u_h) z
                  + sum_i  z(x_i) * a(x_i) * [u_h'](x_i),

with R(u_h) = f - L u_h the strong residual and [u_h'](x_i) =
u_h'(x_i^+) - u_h'(x_i^-) the face derivative jump (interior faces only;
z vanishes at the domain ends).  Both terms are computable from the
per-element Legendre series: R at Gauss points via the Vandermonde
derivative matrices, the jumps from V'(+-1).  The only approximations are
Gauss quadrature (exact here: R z is polynomial of degree <= 2M plus a
smooth forcing) and z ~ z_h, the LSSVR-enhanced adjoint — spectrally
accurate, and there is no Galerkin orthogonality to cancel the estimate
(the enhancement is collocation + least squares, not Galerkin), so the
computed eta is a genuine error ESTIMATE with effectivity ~ 1, not a
bound-by-construction.

The signed per-element cell terms plus half of each adjacent face term
drive refinement; their sum is the reported goal-error estimate.

TPU notes: everything is batched [E, q] tensor algebra (MXU dots against
static [q, M] Vandermonde blocks); the adjoint solve reuses the full
hybrid pipeline, so it inherits the fused kernels and sharding of the
primal path.  The adjoint's advection sign flip keeps the same operator
family; for non-constant b the reaction shift b' comes from ``jax.grad``
(the framework is end-to-end differentiable).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import legendre
from .adaptive import refine_nodes
from .hybrid import HybridSolver, Solution, SolverConfig, uniform_nodes
from .problem import Problem1D


def adjoint_problem(problem: Problem1D, j: Callable,
                    name: Optional[str] = None) -> Problem1D:
    """The adjoint BVP L* z = j with homogeneous Dirichlet data.

    L* keeps the diffusion pair (a, a'), negates the advection b, and
    shifts the reaction c -> c - b' (zero shift when ``constant_coeffs``;
    otherwise b' via ``jax.grad``).  Only Dirichlet-Dirichlet primal
    problems are supported — the DWR identity above pins z = 0 at ends.
    """
    if problem.bc_left != "dirichlet" or problem.bc_right != "dirichlet":
        raise ValueError(
            "goal-oriented adaptivity needs Dirichlet-Dirichlet problems "
            f"(got {problem.bc_left}/{problem.bc_right})")
    b = problem.b
    if problem.constant_coeffs:
        c_adj = problem.c
    else:
        db = jnp.vectorize(jax.grad(lambda x: b(x) + 0.0 * x))
        c_orig = problem.c
        c_adj = lambda x: c_orig(x) - db(x)  # noqa: E731
    return Problem1D(
        name=name or f"adjoint({problem.name})",
        f=j,
        a=problem.a,
        da=problem.da,
        b=lambda x: -b(x),
        c=c_adj,
        domain=problem.domain,
        g_left=0.0,
        g_right=0.0,
        constant_coeffs=problem.constant_coeffs,
    )


def _gauss(q: int, dtype):
    tq, wq = np.polynomial.legendre.leggauss(q)  # host f64, static
    return jnp.asarray(tq, dtype), jnp.asarray(wq, dtype)


def _series_on_gauss(nodes, coeffs, tq):
    """(x, u, ux, uxx) of the element Legendre series at mapped Gauss
    points — [E, q] each, one [q, M] MXU dot per derivative order."""
    M = coeffs.shape[1]
    V0, V1, V2 = legendre.legendre_vandermonde(tq, M)
    xl = nodes[:-1]
    h = nodes[1:] - nodes[:-1]
    x = xl[:, None] + 0.5 * (tq + 1.0)[None, :] * h[:, None]
    chain = (2.0 / h)[:, None]
    # HIGHEST: the MXU's default f32 dot uses bf16 passes (~4e-4 rel
    # error) — measured to corrupt f32 goal values by 4e-4 (NUMERICS 1).
    dot = lambda V: jnp.matmul(  # noqa: E731
        coeffs, V.T, precision=jax.lax.Precision.HIGHEST)
    return x, dot(V0), chain * dot(V1), chain * chain * dot(V2)


def goal_value(nodes, coeffs, j: Callable, q: int = 8):
    """J(u_h) = int j u_h by per-element Gauss quadrature."""
    tq, wq = _gauss(q, coeffs.dtype)
    x, u, _, _ = _series_on_gauss(nodes, coeffs, tq)
    h = nodes[1:] - nodes[:-1]
    return jnp.sum(0.5 * h * ((j(x) * u) @ wq))


class DWREstimate(NamedTuple):
    total: jnp.ndarray  # scalar signed estimate of J(u) - J(u_h)
    cell: jnp.ndarray  # [E] signed cell residual terms
    face: jnp.ndarray  # [E-1] signed interior-face jump terms
    indicator: jnp.ndarray  # [E] refinement indicator (|cell| + half faces)


def dwr_estimate(problem: Problem1D, primal: Solution, adjoint: Solution,
                 q: int = 8) -> DWREstimate:
    """Dual-weighted residual estimate of J(u) - J(u_h) (docstring above).

    ``primal`` and ``adjoint`` must share ``nodes`` (same mesh)."""
    nodes, coeffs, zc = primal.nodes, primal.coeffs, adjoint.coeffs
    dtype = coeffs.dtype
    tq, wq = _gauss(q, dtype)
    x, u, ux, uxx = _series_on_gauss(nodes, coeffs, tq)
    a2, a1, a0 = problem.colloc_coeffs(x)
    R = problem.f(x) * jnp.ones_like(x) - (a2 * uxx + a1 * ux + a0 * u)
    _, z, _, _ = _series_on_gauss(nodes, zc, tq)
    h = nodes[1:] - nodes[:-1]
    cell = 0.5 * h * ((R * z) @ wq)

    # Interior-face derivative jumps: u_h' from the right element at
    # t = -1 minus from the left element at t = +1; z_h is continuous
    # there (FEM-pinned traces), take the left element's value.
    M = coeffs.shape[1]
    ends = jnp.asarray([-1.0, 1.0], dtype)
    V0e, V1e = legendre.legendre_vandermonde(ends, M, num_derivs=1)
    chain = (2.0 / h)[:, None]
    hi = jax.lax.Precision.HIGHEST
    # [E, 2] u_h' at (left, right) element ends
    ux_ends = chain * jnp.matmul(coeffs, V1e.T, precision=hi)
    z_ends = jnp.matmul(zc, V0e.T, precision=hi)
    xi = nodes[1:-1]
    jump = ux_ends[1:, 0] - ux_ends[:-1, 1]  # [E-1]
    face = z_ends[:-1, 1] * problem.a(xi) * jnp.ones_like(xi) * jump

    half = 0.5 * jnp.abs(face)
    indicator = (jnp.abs(cell)
                 .at[:-1].add(half)
                 .at[1:].add(half))
    return DWREstimate(total=jnp.sum(cell) + jnp.sum(face),
                       cell=cell, face=face, indicator=indicator)


class GoalAdaptiveResult(NamedTuple):
    solution: Solution
    adjoint: Solution
    nodes: jnp.ndarray
    history: List[dict]  # per-round {elements, goal, est_error, ...}


def goal_adaptive_solve(problem: Problem1D, j: Callable, cfg: SolverConfig,
                        rounds: int = 4, refine_frac: float = 0.3,
                        exact_goal: Optional[float] = None,
                        q: int = 8) -> GoalAdaptiveResult:
    """Solve-estimate-refine driven by |DWR| indicators.

    Each round solves primal AND adjoint on the current mesh through the
    full hybrid pipeline (two batched solves), computes J(u_h), the
    signed estimate and per-element indicators, then bisects the worst
    ``refine_frac`` of elements.  Host-side loop by design (mesh shapes
    change per round, like ``adaptive_solve``)."""
    dtype = cfg.jnp_dtype()
    adj = adjoint_problem(problem, j)
    nodes = np.asarray(uniform_nodes(problem, cfg.num_nodes, dtype))
    history: List[dict] = []
    psol = asol = None
    for r in range(rounds + 1):
        jn = jnp.asarray(nodes, dtype)
        psolver = HybridSolver(problem, cfg, nodes=jn)
        psol = psolver.solve()
        asol = HybridSolver(adj, cfg, nodes=jn).solve()
        est = dwr_estimate(problem, psol, asol, q=q)
        goal = goal_value(jn, psol.coeffs, j, q=q)
        rec = {
            "round": r,
            "elements": int(psol.coeffs.shape[0]),
            "goal": float(goal),
            "est_error": float(est.total),
        }
        if exact_goal is not None:
            rec["true_error"] = float(exact_goal) - rec["goal"]
        history.append(rec)
        if r == rounds:
            break
        nodes = refine_nodes(nodes, np.asarray(est.indicator), refine_frac)
    return GoalAdaptiveResult(solution=psol, adjoint=asol,
                              nodes=jnp.asarray(nodes, dtype),
                              history=history)



# --------------------------------------------------------------------- 2D
#
# Same DWR identity on the structured-quad mesh.  With z the true adjoint
# (-div(a grad z) - b.grad z + c z = j, z = 0 on the boundary) and u_h the
# piecewise tensor-Legendre hybrid solution, element-wise integration by
# parts gives
#
#   J(u) - J(u_h) = sum_E int_E R(u_h) z
#     + sum_{interior edges} int_e z a [du_h/dn]
#     + (terms in [u_h] and (u_h - g), both O(bc_violation) ~ 1e-9 here
#        because the trace constraints are enforced through the null-space
#        LSE — measured 1e-9 at 8^2 f64 — and therefore dropped)
#
# where [.] is the jump across the edge.  CRUCIAL 2D difference from 1D:
# the weight z must be approximated on a FINER mesh than the primal.  The
# 2D hybrid's accuracy floor is its O(h^2) bilinear FEM traces, so an
# equal-mesh z_h has its largest error exactly ON the primal element
# edges where the edge term samples it, and the un-computable defect
# int (u - u_h) d[z_h]/dn is the same order as the estimate itself
# (measured: effectivity -0.05 with an equal-mesh adjoint at 8^2).  With
# the adjoint solved on a once-bisected mesh the defect drops ~4x per
# zoom level: measured effectivity 0.90 (zoom 2), 0.98 (zoom 4) on 8^2
# Poisson; p-enrichment (M 6 -> 8) does NOT help — the adjoint's trace
# floor, not its polynomial degree, is binding.

from .hybrid2d import Problem2D, Solution2D  # noqa: E402


def adjoint_problem_2d(problem: Problem2D, j: Callable,
                       name: Optional[str] = None) -> Problem2D:
    """Adjoint BVP on the same domain: b -> -b (constant, so the reaction
    is unchanged), variable diffusion carried as is (self-adjoint)."""
    if any(bc != "dirichlet" for bc in problem.bc_edges):
        raise ValueError(
            "2D goal-oriented adaptivity needs all-Dirichlet problems "
            f"(got {problem.bc_edges})")
    bx, by = problem.b
    return Problem2D(
        name=name or f"adjoint({problem.name})",
        f=j,
        g=lambda x, y: jnp.zeros_like(x + y),
        domain=problem.domain,
        a0=problem.a0,
        c=problem.c,
        b=(-bx, -by),
        a_var=problem.a_var,
        grad_a=problem.grad_a,
    )


def _tensor_series_on_gauss(sol: Solution2D, tq):
    """(x, y, u, ux, uy, uxx, uyy) at the tensor Gauss grid — [ny, nx,
    qy, qx] each, einsum contractions at HIGHEST precision."""
    xs, ys, C = sol.xs, sol.ys, sol.coeffs
    M = C.shape[-1]
    V0, V1, V2 = legendre.legendre_vandermonde(tq, M)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    cx = (2.0 / hx)[None, :, None, None]
    cy = (2.0 / hy)[:, None, None, None]
    hi = jax.lax.Precision.HIGHEST
    con = lambda Vy, Vx: jnp.einsum(  # noqa: E731
        "YXkl,pk,ql->YXpq", C, Vy, Vx, precision=hi)
    xq = xs[:-1, None] + 0.5 * (tq + 1.0)[None, :] * hx[:, None]
    yq = ys[:-1, None] + 0.5 * (tq + 1.0)[None, :] * hy[:, None]
    x = xq[None, :, None, :]
    y = yq[:, None, :, None]
    return (x, y, con(V0, V0), cx * con(V0, V1), cy * con(V1, V0),
            cx * cx * con(V0, V2), cy * cy * con(V2, V0))


def _edge_traces(sol: Solution2D, tq):
    """Element values/normal derivatives on the 4 element edges at
    along-edge Gauss points: (u_xe, ux_xe, u_ye, uy_ye) with
    u_xe[Y, X, s, p] the trace at the x-end s in {left, right}, p the
    Gauss index along y (and symmetrically for y-ends)."""
    xs, ys, C = sol.xs, sol.ys, sol.coeffs
    M = C.shape[-1]
    dtype = C.dtype
    V0, _ = legendre.legendre_vandermonde(tq, M, num_derivs=1)
    ends = jnp.asarray([-1.0, 1.0], dtype)
    E0, E1 = legendre.legendre_vandermonde(ends, M, num_derivs=1)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hi = jax.lax.Precision.HIGHEST
    u_xe = jnp.einsum("YXkl,pk,sl->YXsp", C, V0, E0, precision=hi)
    ux_xe = (2.0 / hx)[None, :, None, None] * jnp.einsum(
        "YXkl,pk,sl->YXsp", C, V0, E1, precision=hi)
    u_ye = jnp.einsum("YXkl,sk,ql->YXsq", C, E0, V0, precision=hi)
    uy_ye = (2.0 / hy)[:, None, None, None] * jnp.einsum(
        "YXkl,sk,ql->YXsq", C, E1, V0, precision=hi)
    return u_xe, ux_xe, u_ye, uy_ye


def goal_value_2d(sol: Solution2D, j: Callable, q: int = 8):
    """J(u_h) = int j u_h by tensor Gauss quadrature per element."""
    tq, wq = _gauss(q, sol.coeffs.dtype)
    x, y, u, *_ = _tensor_series_on_gauss(sol, tq)
    hx = sol.xs[1:] - sol.xs[:-1]
    hy = sol.ys[1:] - sol.ys[:-1]
    area4 = 0.25 * hy[:, None] * hx[None, :]
    cell = jnp.einsum("YXpq,p,q->YX", j(x, y) * u, wq, wq)
    return jnp.sum(area4 * cell)


class DWREstimate2D(NamedTuple):
    total: jnp.ndarray  # scalar signed estimate of J(u) - J(u_h)
    cell: jnp.ndarray  # [ny, nx] signed cell residual terms
    indicator: jnp.ndarray  # [ny, nx] |cell| + half adjacent edge terms


def dwr_estimate_2d(problem: Problem2D, primal: Solution2D,
                    adjoint: Solution2D, q: int = 8) -> DWREstimate2D:
    """Dual-weighted residual estimate on the (possibly graded) quad mesh.

    ``adjoint`` may live on ANY mesh of the same domain — it SHOULD be a
    once- or twice-bisected refinement of the primal mesh (see the
    section comment: an equal-mesh adjoint destroys the effectivity); its
    value is read pointwise via ``evaluate_2d_graded``."""
    from .hybrid2d_graded import evaluate_2d_graded

    xs, ys = primal.xs, primal.ys
    dtype = primal.coeffs.dtype
    tq, wq = _gauss(q, dtype)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    bx, by = problem.b
    if problem.a_var is not None:
        a_fn = problem.a_var
        ax_fn, ay_fn = problem.grad_a
    else:
        a_fn = lambda x, y: problem.a0 * jnp.ones_like(x + y)  # noqa: E731
        ax_fn = ay_fn = lambda x, y: jnp.zeros_like(x + y)  # noqa: E731

    # Cell residual terms, z sampled from the (finer) adjoint solution.
    x, y, u, ux, uy, uxx, uyy = _tensor_series_on_gauss(primal, tq)
    a = a_fn(x, y) * jnp.ones_like(u)
    R = (problem.f(x, y) * jnp.ones_like(u)
         - (-(a * (uxx + uyy) + ax_fn(x, y) * ux + ay_fn(x, y) * uy)
            + bx * ux + by * uy + problem.c * u))
    ones = jnp.ones_like(u)
    z = evaluate_2d_graded(adjoint, (x * ones).ravel(),
                           (y * ones).ravel()).reshape(u.shape)
    area4 = 0.25 * hy[:, None] * hx[None, :]
    cell = area4 * jnp.einsum("YXpq,p,q->YX", R * z, wq, wq)

    # Interior-edge flux-jump terms int_e z a [du_h/dn].
    _, ux_xe, _, uy_ye = _edge_traces(primal, tq)
    ypts = ys[:-1, None] + 0.5 * (tq + 1.0)[None, :] * hy[:, None]
    xpts = xs[:-1, None] + 0.5 * (tq + 1.0)[None, :] * hx[:, None]
    ny, nx = cell.shape

    # Vertical edges i = 1..nx-1 (normal +x): z at (xs[i], ypts[Y, :]).
    xv = jnp.broadcast_to(xs[1:-1][None, :, None], (ny, nx - 1, q))
    yv = jnp.broadcast_to(ypts[:, None, :], (ny, nx - 1, q))
    zv = evaluate_2d_graded(adjoint, xv.ravel(), yv.ravel()).reshape(
        ny, nx - 1, q)
    a_v = a_fn(xv, yv) * jnp.ones_like(zv)
    jump_v = ux_xe[:, 1:, 0] - ux_xe[:, :-1, 1]
    Fv = 0.5 * hy[:, None] * ((zv * a_v * jump_v) @ wq)  # [ny, nx-1]

    # Horizontal edges (normal +y): z at (xpts[X, :], ys[i]).
    xh = jnp.broadcast_to(xpts[None, :, :], (ny - 1, nx, q))
    yh = jnp.broadcast_to(ys[1:-1][:, None, None], (ny - 1, nx, q))
    zh = evaluate_2d_graded(adjoint, xh.ravel(), yh.ravel()).reshape(
        ny - 1, nx, q)
    a_h = a_fn(xh, yh) * jnp.ones_like(zh)
    jump_h = uy_ye[1:, :, 0] - uy_ye[:-1, :, 1]
    Fh = 0.5 * hx[None, :] * ((zh * a_h * jump_h) @ wq)  # [ny-1, nx]

    total = jnp.sum(cell) + jnp.sum(Fv) + jnp.sum(Fh)
    halfv = 0.5 * jnp.abs(Fv)
    halfh = 0.5 * jnp.abs(Fh)
    indicator = (jnp.abs(cell)
                 .at[:, :-1].add(halfv).at[:, 1:].add(halfv)
                 .at[:-1, :].add(halfh).at[1:, :].add(halfh))
    return DWREstimate2D(total=total, cell=cell, indicator=indicator)


def _bisect(nodes: np.ndarray, levels: int = 1) -> np.ndarray:
    """Insert interval midpoints ``levels`` times (keeps grading)."""
    for _ in range(levels):
        nodes = np.sort(np.concatenate(
            [nodes, 0.5 * (nodes[1:] + nodes[:-1])]))
    return nodes


class GoalAdaptiveResult2D(NamedTuple):
    solution: Solution2D
    adjoint: Solution2D
    xs: np.ndarray
    ys: np.ndarray
    history: List[dict]


def goal_adaptive_solve_2d(problem: Problem2D, j: Callable, cfg,
                           rounds: int = 3, refine_frac: float = 0.3,
                           exact_goal: Optional[float] = None,
                           q: int = 8,
                           adjoint_zoom: int = 1) -> GoalAdaptiveResult2D:
    """Tensor-product goal-oriented adaptivity: per round, a primal solve
    on the current graded mesh plus an adjoint solve on its
    ``adjoint_zoom``-times-bisected refinement (cost 4x primal per level;
    zoom 1 -> effectivity ~0.9, zoom 2 -> ~0.98 — see the section
    comment), DWR indicators summed along strips drive per-axis bisection
    (mesh layout as in ``hybrid2d_graded.adaptive_solve_2d``).  DWR
    indicators are true per-element error contributions, so no row-scale
    normalisation is needed (they shrink with h, unlike the raw slack)."""
    from .hybrid2d_graded import HybridSolver2DGraded, refine_axis

    adj = adjoint_problem_2d(problem, j)
    x0, x1, y0, y1 = problem.domain
    xs = np.linspace(x0, x1, cfg.nx + 1)
    ys = np.linspace(y0, y1, cfg.ny + 1)
    history: List[dict] = []
    psolver = asolver = None
    for r in range(rounds + 1):
        psolver = HybridSolver2DGraded(problem, cfg, xs, ys)
        psol = psolver.solve()
        asolver = HybridSolver2DGraded(adj, cfg, _bisect(xs, adjoint_zoom),
                                       _bisect(ys, adjoint_zoom))
        asol = asolver.solve()
        est = dwr_estimate_2d(problem, psol, asol, q=q)
        goal = goal_value_2d(psol, j, q=q)
        rec = {
            "round": r,
            "elements": int(est.cell.size),
            "goal": float(goal),
            "est_error": float(est.total),
        }
        if exact_goal is not None:
            rec["true_error"] = float(exact_goal) - rec["goal"]
        history.append(rec)
        if r == rounds:
            break
        ind = np.asarray(est.indicator)
        xs = refine_axis(xs, ind.sum(axis=0), refine_frac)
        ys = refine_axis(ys, ind.sum(axis=1), refine_frac)
    return GoalAdaptiveResult2D(solution=psolver.solution,
                                adjoint=asolver.solution,
                                xs=xs, ys=ys, history=history)


# --------------------------------------------------------------------- 3D
#
# Tensor lift of the 2D estimator to structured hexes: cell residuals at
# the tensor Gauss grid, face flux-jump terms int_F z a [du_h/dn] on the
# three interior-face families, z from an adjoint solved on a bisected
# mesh (the 2D lesson applies verbatim — the O(h^2) FEM trace floor
# peaks on the primal faces, so an equal-mesh weight is useless).  The
# [u_h] and (u_h - g) terms are O(bc_violation) and dropped, as in 2D.

from .hybrid3d import Problem3D, Solution3D  # noqa: E402


def adjoint_problem_3d(problem: Problem3D, j: Callable,
                       name: Optional[str] = None) -> Problem3D:
    """Adjoint BVP: b -> -b (constant advection), diffusion/reaction
    carried as is (self-adjoint)."""
    if any(bc != "dirichlet" for bc in problem.bc_faces):
        raise ValueError(
            "3D goal-oriented adaptivity needs all-Dirichlet problems "
            f"(got {problem.bc_faces})")
    bx, by, bz = problem.b
    return Problem3D(
        name=name or f"adjoint({problem.name})",
        f=j,
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        domain=problem.domain,
        a0=problem.a0,
        c=problem.c,
        b=(-bx, -by, -bz),
        a_var=problem.a_var,
        grad_a=problem.grad_a,
    )


def _tensor_series_on_gauss_3d(sol: Solution3D, tq):
    """(x, y, z, u, ux, uy, uz, lap) at the tensor Gauss grid — each
    [nz, ny, nx, qz, qy, qx]."""
    xs, ys, zs, C = sol.xs, sol.ys, sol.zs, sol.coeffs
    M = C.shape[-1]
    V0, V1, V2 = legendre.legendre_vandermonde(tq, M)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    cx = (2.0 / hx)[None, None, :, None, None, None]
    cy = (2.0 / hy)[None, :, None, None, None, None]
    cz = (2.0 / hz)[:, None, None, None, None, None]
    hi = jax.lax.Precision.HIGHEST
    con = lambda Vz, Vy, Vx: jnp.einsum(  # noqa: E731
        "ZYXabc,pa,qb,rc->ZYXpqr", C, Vz, Vy, Vx, precision=hi)
    grid = lambda ns, h: ns[:-1, None] + 0.5 * (tq + 1.0)[None, :] \
        * h[:, None]  # noqa: E731
    x = grid(xs, hx)[None, None, :, None, None, :]
    y = grid(ys, hy)[None, :, None, None, :, None]
    z = grid(zs, hz)[:, None, None, :, None, None]
    u = con(V0, V0, V0)
    ux = cx * con(V0, V0, V1)
    uy = cy * con(V0, V1, V0)
    uz = cz * con(V1, V0, V0)
    lap = (cx * cx * con(V0, V0, V2) + cy * cy * con(V0, V2, V0)
           + cz * cz * con(V2, V0, V0))
    return x, y, z, u, ux, uy, uz, lap


def goal_value_3d(sol: Solution3D, j: Callable, q: int = 6):
    """J(u_h) = int j u_h by tensor Gauss quadrature per hex."""
    tq, wq = _gauss(q, sol.coeffs.dtype)
    x, y, z, u, *_ = _tensor_series_on_gauss_3d(sol, tq)
    hx = sol.xs[1:] - sol.xs[:-1]
    hy = sol.ys[1:] - sol.ys[:-1]
    hz = sol.zs[1:] - sol.zs[:-1]
    vol8 = 0.125 * (hz[:, None, None] * hy[None, :, None]
                    * hx[None, None, :])
    cell = jnp.einsum("ZYXpqr,p,q,r->ZYX",
                      j(x, y, z) * jnp.ones_like(u) * u, wq, wq, wq)
    return jnp.sum(vol8 * cell)


def _face_normal_derivs_3d(sol: Solution3D, tq):
    """Normal derivatives of the element series on its 6 faces at the
    face tensor Gauss points: (ux_f, uy_f, uz_f) with
    ux_f[Z, Y, X, s, pz, py] at the x-end s (and cyclically)."""
    xs, ys, zs, C = sol.xs, sol.ys, sol.zs, sol.coeffs
    M = C.shape[-1]
    V0, _ = legendre.legendre_vandermonde(tq, M, num_derivs=1)
    ends = jnp.asarray([-1.0, 1.0], C.dtype)
    _, E1 = legendre.legendre_vandermonde(ends, M, num_derivs=1)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    hi = jax.lax.Precision.HIGHEST
    ux_f = (2.0 / hx)[None, None, :, None, None, None] * jnp.einsum(
        "ZYXabc,pa,qb,sc->ZYXspq", C, V0, V0, E1, precision=hi)
    uy_f = (2.0 / hy)[None, :, None, None, None, None] * jnp.einsum(
        "ZYXabc,pa,sb,qc->ZYXspq", C, V0, E1, V0, precision=hi)
    uz_f = (2.0 / hz)[:, None, None, None, None, None] * jnp.einsum(
        "ZYXabc,sa,pb,qc->ZYXspq", C, E1, V0, V0, precision=hi)
    return ux_f, uy_f, uz_f


class DWREstimate3D(NamedTuple):
    total: jnp.ndarray
    cell: jnp.ndarray  # [nz, ny, nx]
    indicator: jnp.ndarray  # [nz, ny, nx]


def dwr_estimate_3d(problem: Problem3D, primal: Solution3D,
                    adjoint: Solution3D, q: int = 6) -> DWREstimate3D:
    """3D dual-weighted residual estimate; ``adjoint`` should live on a
    bisected refinement of the primal mesh (see the 2D section)."""
    from .hybrid3d_graded import evaluate_3d_graded

    xs, ys, zs = primal.xs, primal.ys, primal.zs
    dtype = primal.coeffs.dtype
    tq, wq = _gauss(q, dtype)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    bx, by, bz = problem.b
    if problem.a_var is not None:
        a_fn = problem.a_var
        ax_fn, ay_fn, az_fn = problem.grad_a
    else:
        a_fn = lambda x, y, z: problem.a0 * jnp.ones_like(  # noqa: E731
            x + y + z)
        ax_fn = ay_fn = az_fn = lambda x, y, z: jnp.zeros_like(  # noqa: E731
            x + y + z)

    x, y, z_, u, ux, uy, uz, lap = _tensor_series_on_gauss_3d(primal, tq)
    ones = jnp.ones_like(u)
    a = a_fn(x, y, z_) * ones
    R = (problem.f(x, y, z_) * ones
         - (-(a * lap + ax_fn(x, y, z_) * ux + ay_fn(x, y, z_) * uy
              + az_fn(x, y, z_) * uz)
            + bx * ux + by * uy + bz * uz + problem.c * u))
    zval = evaluate_3d_graded(adjoint, (x * ones).ravel(),
                              (y * ones).ravel(),
                              (z_ * ones).ravel()).reshape(u.shape)
    vol8 = 0.125 * (hz[:, None, None] * hy[None, :, None]
                    * hx[None, None, :])
    cell = vol8 * jnp.einsum("ZYXpqr,p,q,r->ZYX", R * zval, wq, wq, wq)

    ux_f, uy_f, uz_f = _face_normal_derivs_3d(primal, tq)
    grid = lambda ns, h: ns[:-1, None] + 0.5 * (tq + 1.0)[None, :] \
        * h[:, None]  # noqa: E731
    xpts, ypts, zpts = grid(xs, hx), grid(ys, hy), grid(zs, hz)
    nz, ny, nx = cell.shape

    def face_sum(jump, w1, w2, xq, yq, zq):
        """0.5-scaled twice: int_F z a [du/dn] over one interior-face
        family; jump/coords arrived as [n1, n2, nf, q, q] already."""
        zv = evaluate_3d_graded(adjoint, xq.ravel(), yq.ravel(),
                                zq.ravel()).reshape(jump.shape)
        av = a_fn(xq, yq, zq) * jnp.ones_like(jump)
        F = 0.25 * w1 * w2 * jnp.einsum("ZYXpq,p,q->ZYX",
                                        zv * av * jump, wq, wq)
        return F

    # x-normal interior faces i=1..nx-1: points (xs[i], ypts, zpts).
    jx = ux_f[:, :, 1:, 0] - ux_f[:, :, :-1, 1]  # [nz, ny, nx-1, qz, qy]
    xq = jnp.broadcast_to(xs[1:-1][None, None, :, None, None], jx.shape)
    yq = jnp.broadcast_to(ypts[None, :, None, None, :], jx.shape)
    zq = jnp.broadcast_to(zpts[:, None, None, :, None], jx.shape)
    Fx = face_sum(jx, hz[:, None, None], hy[None, :, None], xq, yq, zq)

    # y-normal interior faces: points (xpts, ys[i], zpts).
    jy = uy_f[:, 1:, :, 0] - uy_f[:, :-1, :, 1]  # [nz, ny-1, nx, qz, qx]
    xq = jnp.broadcast_to(xpts[None, None, :, None, :], jy.shape)
    yq = jnp.broadcast_to(ys[1:-1][None, :, None, None, None], jy.shape)
    zq = jnp.broadcast_to(zpts[:, None, None, :, None], jy.shape)
    Fy = face_sum(jy, hz[:, None, None], hx[None, None, :], xq, yq, zq)

    # z-normal interior faces: points (xpts, ypts, zs[i]).
    jz = uz_f[1:, :, :, 0] - uz_f[:-1, :, :, 1]  # [nz-1, ny, nx, qy, qx]
    xq = jnp.broadcast_to(xpts[None, None, :, None, :], jz.shape)
    yq = jnp.broadcast_to(ypts[None, :, None, :, None], jz.shape)
    zq = jnp.broadcast_to(zs[1:-1][:, None, None, None, None], jz.shape)
    Fz = face_sum(jz, hy[None, :, None], hx[None, None, :], xq, yq, zq)

    total = jnp.sum(cell) + jnp.sum(Fx) + jnp.sum(Fy) + jnp.sum(Fz)
    hfx, hfy, hfz = 0.5 * jnp.abs(Fx), 0.5 * jnp.abs(Fy), 0.5 * jnp.abs(Fz)
    indicator = (jnp.abs(cell)
                 .at[:, :, :-1].add(hfx).at[:, :, 1:].add(hfx)
                 .at[:, :-1, :].add(hfy).at[:, 1:, :].add(hfy)
                 .at[:-1, :, :].add(hfz).at[1:, :, :].add(hfz))
    return DWREstimate3D(total=total, cell=cell, indicator=indicator)


class GoalAdaptiveResult3D(NamedTuple):
    solution: Solution3D
    adjoint: Solution3D
    xs: np.ndarray
    ys: np.ndarray
    zs: np.ndarray
    history: List[dict]


def goal_adaptive_solve_3d(problem: Problem3D, j: Callable, cfg,
                           rounds: int = 2, refine_frac: float = 0.3,
                           exact_goal: Optional[float] = None,
                           q: int = 6,
                           adjoint_zoom: int = 1) -> GoalAdaptiveResult3D:
    """3D goal-oriented tensor-product adaptivity (mirror of the 2D
    loop; the bisected adjoint costs 8x the primal per zoom level)."""
    from .hybrid3d_graded import HybridSolver3DGraded, refine_axis

    adj = adjoint_problem_3d(problem, j)
    x0, x1, y0, y1, z0, z1 = problem.domain
    xs = np.linspace(x0, x1, cfg.nx + 1)
    ys = np.linspace(y0, y1, cfg.ny + 1)
    zs = np.linspace(z0, z1, cfg.nz + 1)
    history: List[dict] = []
    psolver = asolver = None
    for r in range(rounds + 1):
        psolver = HybridSolver3DGraded(problem, cfg, xs, ys, zs)
        psol = psolver.solve()
        asolver = HybridSolver3DGraded(
            adj, cfg, _bisect(xs, adjoint_zoom), _bisect(ys, adjoint_zoom),
            _bisect(zs, adjoint_zoom))
        asol = asolver.solve()
        est = dwr_estimate_3d(problem, psol, asol, q=q)
        goal = goal_value_3d(psol, j, q=q)
        rec = {
            "round": r,
            "elements": int(est.cell.size),
            "goal": float(goal),
            "est_error": float(est.total),
        }
        if exact_goal is not None:
            rec["true_error"] = float(exact_goal) - rec["goal"]
        history.append(rec)
        if r == rounds:
            break
        ind = np.asarray(est.indicator)
        xs = refine_axis(xs, ind.sum(axis=(0, 1)), refine_frac)
        ys = refine_axis(ys, ind.sum(axis=(0, 2)), refine_frac)
        zs = refine_axis(zs, ind.sum(axis=(1, 2)), refine_frac)
    return GoalAdaptiveResult3D(solution=psolver.solution,
                                adjoint=asolver.solution,
                                xs=xs, ys=ys, zs=zs, history=history)


# ------------------------------------------------------ semilinear (1D)
#
# Goal-error estimation for the NONLINEAR family -a0 u'' + s(u) = f
# (models/nonlinear.py).  The first-order (DWR) adjoint is the
# LINEARIZED operator at the computed solution — self-adjoint here:
#
#     -a0 z'' + s'(u_h) z = j,    z(x0) = z(x1) = 0,
#
# solved through the ordinary linear hybrid pipeline with the reaction
# coefficient c(x) = s'(u_h(x)) read from the element polynomials.  The
# identity then matches the linear case with R = f + a0 u_h'' - s(u_h),
# exact up to the second-order remainder ~ s''(u)·e^2 (negligible at
# the hybrid solver's 1e-7-class errors) and z ~ z_h.


def adjoint_problem_semilinear(problem, sol, j: Callable) -> Problem1D:
    """Linearized adjoint BVP of a ``SemilinearProblem1D`` at the
    computed ``SemilinearSolution``."""
    from ..ops import eval as ev

    ds = problem.ds
    nodes, coeffs = sol.nodes, sol.coeffs

    def c_lin(x):
        return ds(ev.evaluate(nodes, coeffs, jnp.atleast_1d(x)))

    return Problem1D(
        name=f"adjoint({problem.name})",
        f=j,
        a=lambda x: problem.a0 * jnp.ones_like(x),
        c=c_lin,
        domain=problem.domain,
        g_left=0.0,
        g_right=0.0,
    )


def dwr_estimate_semilinear(problem, primal, adjoint: Solution,
                            q: int = 8) -> DWREstimate:
    """DWR estimate for a semilinear solve: cell residuals
    R = f + a0 u'' - s(u) at Gauss points + the face flux-jump terms
    (``adjoint`` from ``adjoint_problem_semilinear`` on the same
    mesh)."""
    nodes, coeffs, zc = primal.nodes, primal.coeffs, adjoint.coeffs
    dtype = coeffs.dtype
    tq, wq = _gauss(q, dtype)
    x, u, ux, uxx = _series_on_gauss(nodes, coeffs, tq)
    R = (problem.f(x) * jnp.ones_like(x) + problem.a0 * uxx
         - problem.s(u))
    _, z, _, _ = _series_on_gauss(nodes, zc, tq)
    h = nodes[1:] - nodes[:-1]
    cell = 0.5 * h * ((R * z) @ wq)

    M = coeffs.shape[1]
    ends = jnp.asarray([-1.0, 1.0], dtype)
    V0e, V1e = legendre.legendre_vandermonde(ends, M, num_derivs=1)
    chain = (2.0 / h)[:, None]
    hi = jax.lax.Precision.HIGHEST
    ux_ends = chain * jnp.matmul(coeffs, V1e.T, precision=hi)
    z_ends = jnp.matmul(zc, V0e.T, precision=hi)
    jump = ux_ends[1:, 0] - ux_ends[:-1, 1]
    face = z_ends[:-1, 1] * problem.a0 * jump

    half = 0.5 * jnp.abs(face)
    indicator = (jnp.abs(cell).at[:-1].add(half).at[1:].add(half))
    return DWREstimate(total=jnp.sum(cell) + jnp.sum(face),
                       cell=cell, face=face, indicator=indicator)


def goal_error_semilinear(problem, sol, cfg, j: Callable, q: int = 8):
    """One-call goal-error estimate for a semilinear solve: solves the
    linearized adjoint through the linear hybrid pipeline on the same
    (uniform) mesh and returns (J(u_h), DWREstimate, adjoint
    Solution)."""
    adj = adjoint_problem_semilinear(problem, sol, j)
    asol = HybridSolver(adj, cfg, nodes=sol.nodes).solve()
    est = dwr_estimate_semilinear(problem, sol, asol, q=q)
    return goal_value(sol.nodes, sol.coeffs, j, q=q), est, asol
