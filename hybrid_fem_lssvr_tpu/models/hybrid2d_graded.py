"""Graded (non-uniform tensor-product) 2D meshes + slack-driven adaptivity.

2D analog of the 1D graded-mesh path (``hybrid.hybrid_solve_general`` /
``models/adaptive.py``), a capability beyond the reference (uniform 1D
meshes only, ``Hybrid-FEM-LSSVR.py:120``).  The mesh stays a tensor product
``xs [nx+1] x ys [ny+1]`` with arbitrary monotone spacings, so every
per-element operator is a PER-ELEMENT-SCALAR combination of shared
reference matrices:

- coarse Q1: ``K_e = a0 (hy/hx) Cxx + a0 (hx/hy) Cyy + c (hx hy/4) Mhat
  + bx (hy/2) Chatx + by (hx/2) Chaty`` (``assembly2d.q1_reference_parts``),
  applied matrix-free through the existing variable-coefficient
  gather-scatter (``apply_stiffness_var``) with the reference parts as the
  S_q stack and the geometric scalars as the coefficient maps — variable
  diffusion composes by sampling a(x, y) at each element's own quadrature
  points (``q1_reference_quad_parts``);
- enhancement: ``D_e = -a_e (sx_e^2 W20 + sy_e^2 W02)
  - ax_e sx_e W10 - ay_e sy_e W01 + bx sx_e W10 + by sy_e W01 + c W00``
  with ``sx_e = 2/hx_e`` chain factors and shared reference tensor-Legendre
  collocation matrices; solved by the batched null-space QR
  (``kkt.solve_batched``), trace matrix B unchanged (reference coords).

Adaptivity refines the worst x-intervals and y-intervals independently
(per-axis max of the per-element slack), preserving the tensor-product
structure; each round is a fresh jit specialisation (host-side control
flow by design, like 1D).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly2d, cg, kkt, legendre
from .hybrid2d import (
    Problem2D, Solution2D, Solver2DConfig, _bilinear_fallback_coeffs,
    _boundary_coords, _element_data_2d,
)


class Graded2DOperators(NamedTuple):
    """Shared host-f64 reference collocation operators (unit chain
    factors; per-element scaling applied at solve time)."""

    W20: jnp.ndarray  # [C^2, M^2]  V0y (x) V2x
    W02: jnp.ndarray  # [C^2, M^2]  V2y (x) V0x
    W10: jnp.ndarray  # [C^2, M^2]  V0y (x) V1x
    W01: jnp.ndarray  # [C^2, M^2]  V1y (x) V0x
    W00: jnp.ndarray  # [C^2, M^2]  V0y (x) V0x
    B: jnp.ndarray  # [4M-4, M^2] shared trace rows
    Z: jnp.ndarray  # [M^2, K] null basis of B
    Pbc: jnp.ndarray  # [M^2, 4M-4] min-norm particular map
    # Fused-kernel precompute: the five reference parts projected onto the
    # null basis / particular map, stacked [W20; W02; W10; W01; W00] at
    # UNIT scale — the per-element chain factors and the per-element row
    # scale 1/(sx^2 + sy^2) are applied in-kernel (unlike the uniform
    # var-coeff kernel's static 1/s2).
    AZ: jnp.ndarray = None  # [5 C^2, K]
    AP: jnp.ndarray = None  # [5 C^2, 4M-4]


def prepare_shared_2d_graded(problem: Problem2D, cfg: Solver2DConfig):
    """Host f64 precompute of the reference-coordinate operator parts
    (graded analog of ``prepare_shared_2d``; interior collocation points
    for the same corner-row reason)."""
    if any(t != "dirichlet" for t in problem.bc_edges):
        raise NotImplementedError(
            "this path eliminates all boundary edges structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver2D)"
        )
    M, C = cfg.M, cfg.n_colloc
    dtype = cfg.jnp_dtype()
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = legendre.vandermonde_host(t_int, M)

    def tensor(Vy, Vx):
        return np.einsum("yk,xl->yxkl", Vy, Vx).reshape(C * C, M * M)

    W20 = tensor(V0, V2)
    W02 = tensor(V2, V0)
    W10 = tensor(V0, V1)
    W01 = tensor(V1, V0)
    W00 = tensor(V0, V0)
    bpts = _boundary_coords(M)
    V0y_b = legendre.vandermonde_host(bpts[:, 0], M)[0]
    V0x_b = legendre.vandermonde_host(bpts[:, 1], M)[0]
    B = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M * M)
    Z, Pbc = kkt.nullspace_host(B)
    Wstack = np.concatenate([W20, W02, W10, W01, W00])  # [5 C^2, M^2]
    ops = Graded2DOperators(
        W20=jnp.asarray(W20, dtype), W02=jnp.asarray(W02, dtype),
        W10=jnp.asarray(W10, dtype), W01=jnp.asarray(W01, dtype),
        W00=jnp.asarray(W00, dtype), B=jnp.asarray(B, dtype),
        Z=jnp.asarray(Z, dtype), Pbc=jnp.asarray(Pbc, dtype),
        AZ=jnp.asarray(Wstack @ Z, dtype),
        AP=jnp.asarray(Wstack @ Pbc, dtype),
    )
    return ops, (jnp.asarray(t_int), jnp.asarray(bpts))


def graded_fem_parts(problem: Problem2D, xs, ys):
    """Matrix-free per-element operator parts on a graded tensor-product
    mesh: stacked reference 4x4 blocks Sq and their per-element scalar
    maps [ny, nx].  ``ys`` may be a y-slab of a larger mesh (the maps
    depend only on the local node positions) — this is what the
    distributed graded solve slices per device."""
    dtype = xs.dtype
    hx = xs[1:] - xs[:-1]  # [nx]
    hy = ys[1:] - ys[:-1]  # [ny]
    HX = hx[None, :] * jnp.ones_like(hy)[:, None]  # [ny, nx]
    HY = hy[:, None] * jnp.ones_like(hx)[None, :]
    bx, by = problem.b
    Sq_list, map_list = [], []
    Cxx, Cyy, Mh, Chx, Chy = assembly2d.q1_reference_parts()
    if problem.a_var is not None:
        # Variable diffusion: sample a at each element's own quadrature
        # points; the per-point gradient parts carry the geometric scalars.
        Sxx, Syy, tq = assembly2d.q1_reference_quad_parts()
        Q = tq.shape[0]
        xq = (0.5 * (xs[1:] + xs[:-1])[None, :]
              + 0.5 * hx[None, :] * jnp.asarray(tq[:, 0], dtype)[:, None])
        yq = (0.5 * (ys[1:] + ys[:-1])[None, :]
              + 0.5 * hy[None, :] * jnp.asarray(tq[:, 1], dtype)[:, None])
        # a on [Q, ny, nx]
        A = problem.a_var(xq[:, None, :], yq[:, :, None])
        A = A * jnp.ones((Q, hy.shape[0], hx.shape[0]), dtype)
        Sq_list += [Sxx[q] for q in range(Q)]
        map_list += [A[q] * HY / HX for q in range(Q)]
        Sq_list += [Syy[q] for q in range(Q)]
        map_list += [A[q] * HX / HY for q in range(Q)]
    else:
        Sq_list += [Cxx, Cyy]
        map_list += [problem.a0 * HY / HX, problem.a0 * HX / HY]
    if problem.c != 0.0:
        Sq_list.append(Mh)
        map_list.append(problem.c * HX * HY / 4.0)
    if bx != 0.0:
        Sq_list.append(Chx)
        map_list.append(bx * HY / 2.0 + jnp.zeros_like(HX))
    if by != 0.0:
        Sq_list.append(Chy)
        map_list.append(by * HX / 2.0 + jnp.zeros_like(HX))
    Sq = jnp.asarray(np.stack(Sq_list), dtype)
    return Sq, jnp.stack(map_list)


def fem_solve_2d_graded(problem: Problem2D, cfg: Solver2DConfig, xs, ys):
    """Coarse Q1 solve on the graded tensor-product mesh: matrix-free
    per-element operators via reference-part scalar maps; Jacobi-CG (SPD)
    or Jacobi-BiCGStab (nonsymmetric/indefinite).  Multigrid needs nested
    uniform coarsenings, so graded meshes use the Jacobi path."""
    dtype = xs.dtype
    bx, by = problem.b
    Sq, a_maps = graded_fem_parts(problem, xs, ys)

    ny1, nx1 = ys.shape[0], xs.shape[0]
    interior = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))
    b = assembly2d.assemble_load(xs, ys, problem.f)

    def apply_op(v):
        return assembly2d.apply_stiffness_var(v, Sq, a_maps)

    def apply_free(v):
        return jnp.where(interior, apply_op(v * interior), 0.0)

    rhs = jnp.where(interior, b - apply_op(u_bc), 0.0)
    diag = assembly2d.stiffness_var_diag((ny1, nx1), Sq, a_maps, dtype)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    spd = bx == 0.0 and by == 0.0 and problem.c >= 0.0
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter)
    return u_bc + jnp.where(interior, res.x, 0.0), res


def _graded_element_operators(problem: Problem2D, cfg: Solver2DConfig,
                              xs, ys, gops: Graded2DOperators, t_int):
    """Batched per-element collocation operators D [E, C^2, M^2] on the
    graded mesh: per-element chain factors (and sampled coefficient fields
    for variable diffusion) against the shared reference parts."""
    dtype = xs.dtype
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    E = nx * ny
    C = cfg.n_colloc
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    sx = 2.0 / hx  # [nx]
    sy = 2.0 / hy  # [ny]
    SX = (sx[None, :] * jnp.ones((ny, 1), dtype)).reshape(E, 1, 1)
    SY = (sy[:, None] * jnp.ones((1, nx), dtype)).reshape(E, 1, 1)
    bx, by = problem.b
    if problem.a_var is not None:
        t = jnp.asarray(t_int, dtype)
        xq = xs[:-1][:, None] + 0.5 * hx[:, None] * (t[None, :] + 1.0)
        yq = ys[:-1][:, None] + 0.5 * hy[:, None] * (t[None, :] + 1.0)

        def samp(fn):
            v = fn(xq[None, :, None, :], yq[:, None, :, None])
            v = v * jnp.ones((ny, nx, C, C), dtype)
            return v.reshape(E, C * C, 1)

        if problem.grad_a is not None:
            ax_fn, ay_fn = problem.grad_a
        else:
            ax_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=0))
            ay_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=1))
        a_e = samp(problem.a_var)
        ax_e = samp(ax_fn)
        ay_e = samp(ay_fn)
    else:
        a_e = problem.a0
        ax_e = 0.0
        ay_e = 0.0
    D = -a_e * (SX * SX * gops.W20 + SY * SY * gops.W02)
    cx = bx - ax_e  # (b - grad a) . grad u chain rows
    cy = by - ay_e
    if problem.a_var is not None or bx != 0.0:
        D = D + cx * SX * gops.W10
    if problem.a_var is not None or by != 0.0:
        D = D + cy * SY * gops.W01
    if problem.c != 0.0:
        D = D + problem.c * gops.W00
    return D


@functools.partial(jax.jit, static_argnums=(0, 1))
def hybrid_solve_2d_graded(problem: Problem2D, cfg: Solver2DConfig,
                           shared_bundle, xs, ys) -> Solution2D:
    """Full graded-mesh hybrid solve: graded coarse Q1 + per-element
    batched null-space enhancement.  jit-specialised per mesh SHAPE; the
    node positions are traced, so adaptive rounds that move (not add)
    nodes reuse the compilation."""
    gops, (t_int, bpts) = shared_bundle
    dtype = cfg.jnp_dtype()
    xs = jnp.asarray(xs, dtype)
    ys = jnp.asarray(ys, dtype)
    # The mesh is the node arrays; rebind the config's element counts so
    # _element_data_2d's domain-boundary masks (driven by cfg.nx/cfg.ny)
    # see the true extents — adaptive rounds grow the mesh past the
    # config's starting nx/ny.  Shapes are static under jit.
    import dataclasses

    cfg = dataclasses.replace(cfg, nx=xs.shape[0] - 1, ny=ys.shape[0] - 1)
    if cfg.fem_dtype is not None:
        fd = jnp.dtype(cfg.fem_dtype)
        fem_values, cg_res = fem_solve_2d_graded(
            problem, cfg, xs.astype(fd), ys.astype(fd))
        fem_values = fem_values.astype(dtype)
    else:
        fem_values, cg_res = fem_solve_2d_graded(problem, cfg, xs, ys)
    M = cfg.M
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    E = nx * ny
    backend = cfg.backend
    if backend == "auto":
        from ..ops import pallas_kernels as pk

        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pk.pick_tile(E, 1024) >= 128
            and dtype == jnp.float32
            and (problem.a_var is None or problem.grad_a is not None)
            else "xla"
        )
    if backend == "pallas":
        from ..ops import pallas_kernels as pk
        from .hybrid2d import _pallas_solve_ok

        w, slack, bcv = pk.fused_enhance_graded_2d(
            fem_values, gops, problem, xs, ys, nx, ny, t_int, bpts,
            tile=pk.pick_tile(E, 512),
            with_diagnostics=cfg.diagnostics,
        )
        corners = (fem_values[:-1, :-1], fem_values[:-1, 1:],
                   fem_values[1:, :-1], fem_values[1:, 1:])
        if cfg.diagnostics:
            diags = kkt.KKTDiagnostics(
                slack, bcv, _pallas_solve_ok(slack, bcv, corners)
            )
        else:
            z = jnp.zeros((E,), w.dtype)
            diags = kkt.KKTDiagnostics(
                z, z, jnp.all(jnp.isfinite(w), axis=-1)
            )
    else:
        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs, ys, fem_values, t_int, bpts
        )
        D = _graded_element_operators(problem, cfg, xs, ys, gops, t_int)
        w, diags = kkt.solve_batched(
            D, gops.B, f_rows, bc_rows, cfg.gamma,
            formulation=cfg.formulation, ZP=(gops.Z, gops.Pbc),
        )
    coeffs = w.reshape(ny, nx, M, M)
    fb = _bilinear_fallback_coeffs(*corners, M)
    ok = diags.solve_ok.reshape(ny, nx)
    coeffs = jnp.where(
        ok[..., None, None],
        jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
    )
    return Solution2D(
        xs=xs, ys=ys, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(ny, nx),
        bc_violation=diags.bc_violation.reshape(ny, nx),
        solve_ok=ok, cond_estimate=diags.cond_estimate,
    )


def evaluate_2d_graded(sol: Solution2D, x: jnp.ndarray, y: jnp.ndarray):
    """u(x, y) on the graded mesh: searchsorted element lookup per axis
    (the uniform path's index arithmetic does not apply), then the same
    batched tensor-Legendre evaluation; clamps outside the domain like the
    uniform path / the reference ``:198-209``."""
    xs, ys = sol.xs, sol.ys
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    ix = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(ys, y, side="right") - 1, 0, ny - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / (xs[ix + 1] - xs[ix])
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / (ys[iy + 1] - ys[iy])
    M = sol.coeffs.shape[-1]
    (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
    (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
    W = sol.coeffs[iy, ix]  # [P, M, M]
    return jnp.einsum("pk,pkl,pl->p", Vy, W, Vx,
                      precision=jax.lax.Precision.HIGHEST)


def evaluate_2d_graded_gradient(sol: Solution2D, x: jnp.ndarray,
                                y: jnp.ndarray):
    """(du/dx, du/dy) on the graded mesh — per-element chain factors
    2/hx_e, 2/hy_e (graded analog of ``hybrid2d.evaluate_2d_gradient``)."""
    xs, ys = sol.xs, sol.ys
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    ix = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(ys, y, side="right") - 1, 0, ny - 1)
    hx_e = xs[ix + 1] - xs[ix]
    hy_e = ys[iy + 1] - ys[iy]
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx_e
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy_e
    M = sol.coeffs.shape[-1]
    Vx, Vx1 = legendre.legendre_vandermonde(tx, M, num_derivs=1)
    Vy, Vy1 = legendre.legendre_vandermonde(ty, M, num_derivs=1)
    W = sol.coeffs[iy, ix]  # [P, M(ky), M(kx)]
    hi = jax.lax.Precision.HIGHEST
    ux = (2.0 / hx_e) * jnp.einsum("pk,pkl,pl->p", Vy, W, Vx1,
                                   precision=hi)
    uy = (2.0 / hy_e) * jnp.einsum("pk,pkl,pl->p", Vy1, W, Vx,
                                   precision=hi)
    return ux, uy


class HybridSolver2DGraded:
    """Facade for graded tensor-product meshes (mirrors HybridSolver2D;
    nx/ny in the config are ignored — the mesh is the node arrays)."""

    def __init__(self, problem: Problem2D, config: Solver2DConfig,
                 xs, ys):
        self.problem = problem
        self.config = config
        self.xs = np.asarray(xs)
        self.ys = np.asarray(ys)
        self._shared = prepare_shared_2d_graded(problem, config)
        self.solution: Optional[Solution2D] = None

    def solve(self) -> Solution2D:
        self.solution = hybrid_solve_2d_graded(
            self.problem, self.config, self._shared, self.xs, self.ys
        )
        return self.solution

    def evaluate_solution(self, x, y):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_2d_graded(self.solution, jnp.asarray(x, dtype),
                                  jnp.asarray(y, dtype))

    def evaluate_gradient(self, x, y):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_2d_graded_gradient(
            self.solution, jnp.asarray(x, dtype), jnp.asarray(y, dtype))

    def errors(self, x, y):
        from ..utils import metrics

        u = self.evaluate_solution(x, y)
        dtype = u.dtype
        ue = self.problem.exact(jnp.asarray(x, dtype),
                                jnp.asarray(y, dtype))
        return metrics.linf_error(u, ue), metrics.l2_error(u, ue)


class AdaptiveResult2D(NamedTuple):
    solution: Solution2D
    xs: np.ndarray
    ys: np.ndarray
    history: List[dict]


def refine_axis(nodes: np.ndarray, indicator: np.ndarray,
                refine_frac: float) -> np.ndarray:
    """Bisect the worst ``refine_frac`` of intervals along one axis."""
    E = nodes.shape[0] - 1
    n_ref = max(1, int(np.ceil(refine_frac * E)))
    worst = np.argsort(indicator)[-n_ref:]
    mids = 0.5 * (nodes[worst] + nodes[worst + 1])
    return np.sort(np.concatenate([nodes, mids]))


def adaptive_solve_2d(problem: Problem2D, cfg: Solver2DConfig,
                      rounds: int = 3, refine_frac: float = 0.3,
                      eval_points=None) -> AdaptiveResult2D:
    """Slack-driven tensor-product adaptivity (2D analog of
    ``adaptive.adaptive_solve``): each round refines the worst x-intervals
    by the column-max slack and the worst y-intervals by the row-max slack
    — the tensor-product constraint means an interval refines across the
    whole strip.  Starts from the cfg.nx x cfg.ny uniform mesh."""
    x0, x1, y0, y1 = problem.domain
    xs = np.linspace(x0, x1, cfg.nx + 1)
    ys = np.linspace(y0, y1, cfg.ny + 1)
    history: List[dict] = []
    solver = None
    for r in range(rounds + 1):
        solver = HybridSolver2DGraded(problem, cfg, xs, ys)
        sol = solver.solve()
        slack = np.asarray(sol.max_slack)  # [ny, nx]
        # Scale-normalised indicator: the raw slack is the PDE residual
        # against operator rows of size ~ sx^2 + sy^2, so it grows ~ 1/h^2
        # on refined elements; dividing by the row scale makes the
        # indicator comparable across element sizes (else refinement
        # positively feeds back onto the smallest elements).
        hx = np.diff(xs)
        hy = np.diff(ys)
        row_scale = ((2.0 / hx) ** 2)[None, :] + ((2.0 / hy) ** 2)[:, None]
        slack = slack / row_scale
        rec = {
            "round": r,
            "elements": int(slack.size),
            "max_slack": float(slack.max()),
        }
        if eval_points is not None:
            xq, yq = eval_points
            linf, _ = solver.errors(xq, yq)
            rec["linf"] = float(linf)
        history.append(rec)
        if r == rounds:
            break
        xs = refine_axis(xs, slack.max(axis=0), refine_frac)
        ys = refine_axis(ys, slack.max(axis=1), refine_frac)
    return AdaptiveResult2D(solution=solver.solution, xs=xs, ys=ys,
                            history=history)
