"""2D Poisson on structured quad meshes: Q1 FEM + tensor-product LSSVR.

BASELINE.json config 5.  The 1D architecture generalises directly:

* coarse stage: matrix-free Q1 stiffness (ops/assembly2d) + Jacobi-CG
  (ops/cg) instead of a banded solve;
* enhancement: per element a tensor-product Legendre expansion
  u = sum_{ky,kx} w[ky,kx] P_ky(ty) P_kx(tx), constrained by -Lap u = f at a
  C x C collocation grid and by pinning the element-boundary trace to the Q1
  FEM trace (bilinear on each element; linear along each edge), which is the
  2D analog of the reference's endpoint pinning (Hybrid-FEM-LSSVR.py:64-79)
  and keeps the enhanced solution globally continuous.  On the domain
  boundary the trace is pinned to the Dirichlet data g instead (reference
  ``:67-79`` semantics).
* Every element shares the same D [C^2, M^2] and B [4C-4, M^2] on a uniform
  mesh, so the whole enhancement is the same two-matmul affine map as 1D,
  precomputed host-side in float64 (ops/kkt.precompute_shared_host).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly2d, cg, kkt, legendre


@dataclasses.dataclass(frozen=True)
class Problem2D:
    """-Laplace(u) = f on a rectangle, u = g on the boundary."""

    name: str
    f: Callable  # f(x, y)
    g: Callable  # Dirichlet data g(x, y)
    domain: Tuple[float, float, float, float] = (-1.0, 1.0, -1.0, 1.0)
    exact: Optional[Callable] = None
    # Optional structured rhs for the fused kernel: f_shifted(xl, dx, yl, dy)
    # == f(xl+dx, yl+dy) with per-quad transcendental work factored out.
    f_shifted: Optional[Callable] = None
    # Optional SEPARABLE rhs (strongest structure; see the 1D analog in
    # models/problem.py): f((xl, yl) + (dx, dy)) ==
    # sum_r f_elem_factors(xl, yl)[r] * colloc_r(dx, dy), with
    # f_colloc_factors(dx, dy) STATIC (numpy f64 [C^2] in, list of [C^2]
    # out).  The static factors are contracted with the shared affine map
    # host-side in f64, so the fused kernel never materialises a
    # [C^2, tile] rhs and every contraction unrolls to VPU FMAs.
    f_elem_factors: Optional[Callable] = None
    f_colloc_factors: Optional[Callable] = None


def poisson_2d() -> Problem2D:
    """-Lap u = 2 pi^2 sin(pi x) sin(pi y), exact u = sin(pi x) sin(pi y)."""
    pi = jnp.pi

    def f_shifted(xl, dx, yl, dy):
        # Separable trig rhs via angle addition: 4 transcendental vectors of
        # the tile width instead of C^2 per quad.
        sx = jnp.sin(pi * xl) * jnp.cos(pi * dx) \
            + jnp.cos(pi * xl) * jnp.sin(pi * dx)
        sy = jnp.sin(pi * yl) * jnp.cos(pi * dy) \
            + jnp.cos(pi * yl) * jnp.sin(pi * dy)
        return 2.0 * pi**2 * sx * sy

    def f_elem_factors(xl, yl):
        amp = 2.0 * pi**2
        sx, cx = jnp.sin(pi * xl), jnp.cos(pi * xl)
        sy, cy = jnp.sin(pi * yl), jnp.cos(pi * yl)
        return [amp * sx * sy, amp * sx * cy, amp * cx * sy, amp * cx * cy]

    def f_colloc_factors(dx, dy):
        import numpy as np

        cdx, sdx = np.cos(np.pi * dx), np.sin(np.pi * dx)
        cdy, sdy = np.cos(np.pi * dy), np.sin(np.pi * dy)
        return [cdx * cdy, cdx * sdy, sdx * cdy, sdx * sdy]

    return Problem2D(
        name="poisson_2d",
        f=lambda x, y: 2.0 * pi**2 * jnp.sin(pi * x) * jnp.sin(pi * y),
        g=lambda x, y: jnp.zeros_like(x + y),
        exact=lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y),
        f_shifted=f_shifted,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
    )


def poisson_2d_inhomogeneous() -> Problem2D:
    """-Lap u = 2 pi^2 cos(pi x) cos(pi y), exact u = cos(pi x) cos(pi y).

    Nonzero Dirichlet trace (g = -cos(pi y) on x = +/-1 etc.) — the 2D
    analog of ``poisson_inhomogeneous``; exercises the domain-boundary
    g-override masks (reference ``Hybrid-FEM-LSSVR.py:67-79`` semantics)
    and the boundary-magnitude solve_ok gate end-to-end.
    """
    pi = jnp.pi

    def f_shifted(xl, dx, yl, dy):
        cx = jnp.cos(pi * xl) * jnp.cos(pi * dx) \
            - jnp.sin(pi * xl) * jnp.sin(pi * dx)
        cy = jnp.cos(pi * yl) * jnp.cos(pi * dy) \
            - jnp.sin(pi * yl) * jnp.sin(pi * dy)
        return 2.0 * pi**2 * cx * cy

    def f_elem_factors(xl, yl):
        amp = 2.0 * pi**2
        sx, cx = jnp.sin(pi * xl), jnp.cos(pi * xl)
        sy, cy = jnp.sin(pi * yl), jnp.cos(pi * yl)
        return [amp * cx * cy, -amp * cx * sy, -amp * sx * cy,
                amp * sx * sy]

    def f_colloc_factors(dx, dy):
        import numpy as np

        cdx, sdx = np.cos(np.pi * dx), np.sin(np.pi * dx)
        cdy, sdy = np.cos(np.pi * dy), np.sin(np.pi * dy)
        # cos(a+dx)cos(b+dy) expansion against the four element factors
        return [cdx * cdy, cdx * sdy, sdx * cdy, sdx * sdy]

    return Problem2D(
        name="poisson_2d_inhomogeneous",
        f=lambda x, y: 2.0 * pi**2 * jnp.cos(pi * x) * jnp.cos(pi * y),
        g=lambda x, y: jnp.cos(pi * x) * jnp.cos(pi * y),
        exact=lambda x, y: jnp.cos(pi * x) * jnp.cos(pi * y),
        f_shifted=f_shifted,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
    )


@dataclasses.dataclass(frozen=True)
class Solver2DConfig:
    nx: int = 16  # elements per dimension
    ny: int = 16
    M: int = 6  # Legendre basis size per dimension (M^2 coefficients)
    gamma: float = 1.0e4
    n_colloc: int = 6  # collocation grid per dimension (C^2 PDE rows)
    formulation: str = "primal"  # 'primal' | 'dual' (same QP; primal goes
    # through the null-space LSE algebra, dual through the augmented
    # quasi-definite kernel system — 2D analog of SolverConfig.formulation)
    cg_tol: Optional[float] = None  # None -> 100 * dtype eps (relative)
    cg_maxiter: int = 2000
    precond: str = "auto"  # 'auto' | 'jacobi' | 'mg' (geometric V-cycle)
    # | 'adi' (Peaceman-Rachford line sweeps — exact line solves per
    # direction, the right tool for strongly anisotropic hx/hy where
    # point-smoothing degrades; parallel/transpose.py)
    backend: str = "auto"  # 'auto' | 'xla' | 'pallas' (enhancement stage)
    diagnostics: bool = True
    dtype: Optional[str] = None
    fem_dtype: Optional[str] = None  # 'float64' runs the coarse CG stage in
    # (TPU-emulated) f64 — all MG/CG ops are elementwise so this works on
    # TPU (requires jax_enable_x64); same kappa-growth rationale as 1D

    def __post_init__(self):
        if self.formulation not in ("primal", "dual"):
            raise ValueError(f"unknown formulation: {self.formulation!r}")

    def jnp_dtype(self):
        if self.dtype is not None:
            return jnp.dtype(self.dtype)
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class Solution2D(NamedTuple):
    xs: jnp.ndarray  # [nx+1]
    ys: jnp.ndarray  # [ny+1]
    fem_values: jnp.ndarray  # [ny+1, nx+1]
    coeffs: jnp.ndarray  # [ny, nx, M, M]  (ky, kx ordering)
    cg_iters: jnp.ndarray
    cg_residual: jnp.ndarray
    max_slack: jnp.ndarray  # [ny, nx]
    bc_violation: jnp.ndarray  # [ny, nx]
    solve_ok: jnp.ndarray  # [ny, nx]
    cond_estimate: jnp.ndarray = None  # scalar monitor (see kkt)


def _boundary_coords(M: int):
    """(ty, tx) pairs pinning the element trace: M points per edge, corners
    shared -> 4M-4 constraints, exactly the trace space's dimension (the
    trace of a degree-(M-1, M-1) tensor polynomial has 4M-4 dof), so B is
    square-on-the-trace and full rank."""
    tb = np.linspace(-1.0, 1.0, M)
    pts = [(-1.0, tx) for tx in tb]  # bottom edge
    pts += [(1.0, tx) for tx in tb]  # top edge
    pts += [(ty, -1.0) for ty in tb[1:-1]]  # left edge sans corners
    pts += [(ty, 1.0) for ty in tb[1:-1]]  # right edge sans corners
    return np.array(pts)  # [4M-4, 2]


def prepare_shared_2d(problem: Problem2D, cfg: Solver2DConfig):
    """Host float64 precompute of the shared 2D operators (D, B, Wf, Wbc).

    PDE collocation uses INTERIOR points only: at element corners
    Lap(p) == 0 for every zero-trace polynomial p (both second-derivative
    terms carry a vanishing trace factor), so corner rows are structurally
    unfittable and would only pollute the least-squares fit.
    """
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    M, C = cfg.M, cfg.n_colloc
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = legendre.vandermonde_host(t_int, M)
    sx2 = (2.0 / hx) ** 2
    sy2 = (2.0 / hy) ** 2
    # D[(iy, ix), (ky, kx)] = -sx2 V0y[iy,ky] V2x[ix,kx]
    #                         -sy2 V2y[iy,ky] V0x[ix,kx]
    D = -(
        sx2 * np.einsum("yk,xl->yxkl", V0, V2)
        + sy2 * np.einsum("yk,xl->yxkl", V2, V0)
    ).reshape(C * C, M * M)
    bpts = _boundary_coords(M)
    V0y_b = legendre.vandermonde_host(bpts[:, 0], M)[0]  # [K, M]
    V0x_b = legendre.vandermonde_host(bpts[:, 1], M)[0]
    B = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M * M)
    rhs_factors = None
    if problem.f_colloc_factors is not None:
        # Static in-element offsets matching D's row-major (iy, ix) rows.
        dx = (np.tile(t_int, C) + 1.0) * 0.5 * hx
        dy = (np.repeat(t_int, C) + 1.0) * 0.5 * hy
        rhs_factors = problem.f_colloc_factors(dx, dy)
    if cfg.formulation == "dual":
        # Genuine dual algebra: the augmented quasi-definite kernel system
        # (kkt.solve_dual_batched's factorisation, extracted once in host
        # f64).  The -I block regularises the discrete-harmonic directions
        # that break the gamma-form normal equations, so this is stable
        # where Cholesky/Schur is not; finite gamma makes it differ from
        # the LSE (gamma -> inf) primal by O(1/gamma) — primal==dual is
        # asserted to solver tolerance in tests.
        shared = kkt.precompute_shared_dual_host(
            D, B, cfg.gamma, cfg.jnp_dtype(),
            rhs_colloc_factors=rhs_factors,
        )
    else:
        # LSE precompute: the 2D Laplacian's discrete-harmonic null space
        # makes the gamma-form normal equations unsolvable even in f64
        # (see kkt.precompute_shared_lse_host).
        shared = kkt.precompute_shared_lse_host(
            D, B, cfg.jnp_dtype(), rhs_colloc_factors=rhs_factors,
        )
    return shared, (jnp.asarray(t_int), jnp.asarray(bpts))


def fem_solve_2d(problem: Problem2D, cfg: Solver2DConfig, xs, ys):
    """Coarse Q1 nodal values on the grid via Jacobi-preconditioned CG."""
    dtype = xs.dtype
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    K_loc = jnp.asarray(assembly2d.q1_local_stiffness(hx, hy), dtype)

    b = assembly2d.assemble_load(xs, ys, problem.f)
    ny1, nx1 = ys.shape[0], xs.shape[0]
    interior = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)

    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))

    def apply_free(v):
        return jnp.where(
            interior, assembly2d.apply_stiffness(v * interior, K_loc), 0.0
        )

    rhs = jnp.where(
        interior, b - assembly2d.apply_stiffness(u_bc, K_loc), 0.0
    )
    precond = cfg.precond
    if precond == "auto":
        # V-cycle needs 2-divisible grids; Jacobi-CG iterations grow O(N)
        # (measured 88/177/357 at n=32/64/128) so prefer multigrid.
        precond = (
            "mg" if cfg.nx % 2 == 0 and cfg.ny % 2 == 0
            and min(cfg.nx, cfg.ny) >= 8 else "jacobi"
        )
    if precond == "mg":
        from ..ops import multigrid

        M_inv = multigrid.make_vcycle(ny1, nx1, K_loc, dtype)
    elif precond == "adi":
        from ..parallel.transpose import make_adi_preconditioner

        M_inv = make_adi_preconditioner(ny1, nx1, hx, hy, dtype)
    else:
        diag = assembly2d.stiffness_diag((ny1, nx1), K_loc, dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                maxiter=cfg.cg_maxiter)
    u = u_bc + jnp.where(interior, res.x, 0.0)
    return u, res


def _element_data_2d(problem: Problem2D, cfg: Solver2DConfig, xs, ys,
                     fem_values, t_int, bpts, row_offset=0, col_offset=0):
    """Per-element collocation rhs [E, C^2] (interior points) and
    boundary-trace values [E, 4M-4] (FEM bilinear trace, overridden by g on
    domain-boundary edges).

    ``ys``/``fem_values`` may be a local y-slab (sharded solve); then
    ``row_offset`` is the slab's global first element row (possibly traced),
    used for the domain-boundary masks.  ``col_offset`` likewise for 2-axis
    block sharding (``parallel.sharded2d.make_sharded_solve_2d_grid``).
    """
    dtype = xs.dtype
    C = cfg.n_colloc
    nx_loc = xs.shape[0] - 1
    ny_loc = ys.shape[0] - 1
    t = jnp.asarray(t_int, dtype)  # [C] interior points
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    xq = xm[:, None] + 0.5 * hx[:, None] * t[None, :]
    yq = ym[:, None] + 0.5 * hy[:, None] * t[None, :]
    # f on [ny, nx, C(y), C(x)] -> flatten rows row-major (iy, ix)
    F = problem.f(xq[None, :, None, :], yq[:, None, :, None])
    F = F * jnp.ones((ny_loc, nx_loc, C, C), dtype)
    f_rows = F.reshape(ny_loc * nx_loc, C * C)

    # corner values
    u00 = fem_values[:-1, :-1]
    u10 = fem_values[:-1, 1:]
    u01 = fem_values[1:, :-1]
    u11 = fem_values[1:, 1:]
    ty = jnp.asarray(bpts[:, 0], dtype)  # [K]
    tx = jnp.asarray(bpts[:, 1], dtype)
    N00 = 0.25 * (1 - tx) * (1 - ty)
    N10 = 0.25 * (1 + tx) * (1 - ty)
    N01 = 0.25 * (1 - tx) * (1 + ty)
    N11 = 0.25 * (1 + tx) * (1 + ty)
    trace = (
        u00[..., None] * N00 + u10[..., None] * N10
        + u01[..., None] * N01 + u11[..., None] * N11
    )  # [ny, nx, K]

    # Domain-boundary override: boundary points on edges of boundary elements
    # take g(x, y) exactly (reference ``:67-79`` semantics, masked).
    ex = col_offset + jnp.arange(nx_loc)  # GLOBAL element columns
    ey = row_offset + jnp.arange(ny_loc)  # GLOBAL element rows
    # absolute coordinates of each element's boundary points: [ny, nx, K]
    xp = (xm[:, None] + 0.5 * hx[:, None] * tx[None, :])[None, :, :]
    yp = (ym[:, None] + 0.5 * hy[:, None] * ty[None, :])[:, None, :]
    on_left = (ex[None, :, None] == 0) & (tx[None, None, :] == -1.0)
    on_right = (ex[None, :, None] == cfg.nx - 1) & (
        tx[None, None, :] == 1.0
    )
    on_bottom = (ey[:, None, None] == 0) & (ty[None, None, :] == -1.0)
    on_top = (ey[:, None, None] == cfg.ny - 1) & (
        ty[None, None, :] == 1.0
    )
    on_domain_bdry = on_left | on_right | on_bottom | on_top
    gvals = problem.g(xp, yp) * jnp.ones_like(trace)
    bc_rows = jnp.where(on_domain_bdry, gvals, trace)
    return (f_rows, bc_rows.reshape(ny_loc * nx_loc, -1),
            (u00, u10, u01, u11))


def _bilinear_fallback_coeffs(u00, u10, u01, u11, M):
    """Tensor-Legendre coefficients of the Q1 bilinear interpolant —
    the 2D analog of the reference's linear fallback (``:171-176``)."""
    ny, nx = u00.shape
    c = jnp.zeros((ny, nx, M, M), u00.dtype)
    c = c.at[:, :, 0, 0].set(0.25 * (u00 + u10 + u01 + u11))
    c = c.at[:, :, 0, 1].set(0.25 * (-u00 + u10 - u01 + u11))
    c = c.at[:, :, 1, 0].set(0.25 * (-u00 - u10 + u01 + u11))
    c = c.at[:, :, 1, 1].set(0.25 * (u00 - u10 - u01 + u11))
    return c


def _pallas_solve_ok(slack, bcv, corners):
    """Per-element acceptance gate for the fused-kernel path.

    The tolerance scales with the boundary-data magnitude (the corner
    values bound the bilinear trace, and boundary nodes hold g exactly) —
    the same semantics as the 1D gate in ``hybrid.py`` and
    ``kkt._diagnostics``.  It must NOT scale with the violation itself
    (a self-referential gate lets a broken element inflate its own
    threshold and skip the bilinear fallback).
    """
    u00, u10, u01, u11 = corners
    finite = jnp.isfinite(slack) & jnp.isfinite(bcv)
    scale = 1.0 + jnp.maximum(
        jnp.maximum(jnp.abs(u00), jnp.abs(u10)),
        jnp.maximum(jnp.abs(u01), jnp.abs(u11)),
    ).reshape(bcv.shape)
    return finite & (bcv <= 1e-2 * scale)


@functools.partial(jax.jit, static_argnums=(0, 1))
def hybrid_solve_2d(problem: Problem2D, cfg: Solver2DConfig,
                    shared_bundle) -> Solution2D:
    shared, (t_int, bpts) = shared_bundle
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)

    if cfg.fem_dtype is not None:
        fd = jnp.dtype(cfg.fem_dtype)
        fem_values, cg_res = fem_solve_2d(
            problem, cfg, xs.astype(fd), ys.astype(fd)
        )
        fem_values = fem_values.astype(dtype)
    else:
        fem_values, cg_res = fem_solve_2d(problem, cfg, xs, ys)
    E = cfg.nx * cfg.ny
    backend = cfg.backend
    if backend == "auto":
        from ..ops import pallas_kernels as pk

        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pk.pick_tile(E, 4096) >= 128
            and not jax.config.jax_enable_x64  # Mosaic x64 lowering issues
            else "xla"
        )
    if backend == "pallas":
        from ..ops import pallas_kernels as pk

        hx = (x1 - x0) / cfg.nx
        hy = (y1 - y0) / cfg.ny
        if shared.Pres is not None:
            # Stacked-operator kernel: [w; e] in ONE MXU dot (the generic
            # kernel's 3-4 separately K-padded HIGHEST dots dominated its
            # cost — see the kernel docstring and NUMERICS.md 13).
            w, slack, bcv = pk.fused_enhance_stacked_2d(
                fem_values, shared, problem.f, problem.g,
                (x0, hx, y0, hy), cfg.nx, cfg.ny, t_int, bpts,
                tile=pk.pick_tile(E, 4096),
                with_diagnostics=cfg.diagnostics,
                f_shifted_fn=problem.f_shifted,
            )
        else:
            w, slack, bcv = pk.fused_enhance_shared_2d(
                fem_values, shared, problem.f, problem.g,
                (x0, hx, y0, hy), cfg.nx, cfg.ny, t_int, bpts,
                tile=pk.pick_tile(E, 4096),
                with_diagnostics=cfg.diagnostics,
                f_shifted_fn=problem.f_shifted,
            )
        u00 = fem_values[:-1, :-1]
        u10 = fem_values[:-1, 1:]
        u01 = fem_values[1:, :-1]
        u11 = fem_values[1:, 1:]
        corners = (u00, u10, u01, u11)
        if cfg.diagnostics:
            ok_flat = _pallas_solve_ok(slack, bcv, corners)
            diags = kkt.KKTDiagnostics(slack, bcv, ok_flat)
        else:
            z = jnp.zeros((E,), w.dtype)
            diags = kkt.KKTDiagnostics(
                z, z, jnp.all(jnp.isfinite(w), axis=-1)
            )
    else:
        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs, ys, fem_values, t_int, bpts
        )
        w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
    M = cfg.M
    coeffs = w.reshape(cfg.ny, cfg.nx, M, M)
    fb = _bilinear_fallback_coeffs(*corners, M)
    ok = diags.solve_ok.reshape(cfg.ny, cfg.nx)
    coeffs = jnp.where(
        ok[..., None, None], jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb
    )
    return Solution2D(
        xs=xs, ys=ys, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(cfg.ny, cfg.nx),
        bc_violation=diags.bc_violation.reshape(cfg.ny, cfg.nx),
        solve_ok=ok,
        cond_estimate=shared.cond,
    )


def evaluate_2d(sol: Solution2D, x: jnp.ndarray, y: jnp.ndarray):
    """u(x, y) at query points [P] — searchsorted-free O(1) lookup on the
    uniform grid, batched tensor-Legendre evaluation (2D analog of
    ops/eval.py; clamps outside the domain like the reference ``:198-209``).
    """
    xs, ys = sol.xs, sol.ys
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    hx = xs[1] - xs[0]
    hy = ys[1] - ys[0]
    ix = jnp.clip(jnp.floor((x - xs[0]) / hx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(jnp.floor((y - ys[0]) / hy).astype(jnp.int32), 0, ny - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy
    M = sol.coeffs.shape[-1]
    (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)  # [P, M]
    (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
    W = sol.coeffs[iy, ix]  # [P, M(ky), M(kx)]
    return jnp.einsum("pk,pkl,pl->p", Vy, W, Vx,
                      precision=jax.lax.Precision.HIGHEST)


def evaluate_2d_gradient(sol: Solution2D, x: jnp.ndarray, y: jnp.ndarray):
    """(du/dx, du/dy) at query points [P] — 2D analog of
    ``ops.eval.evaluate_derivative``: tensor-Legendre derivative
    Vandermonde with the per-axis chain factors 2/hx, 2/hy."""
    xs, ys = sol.xs, sol.ys
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    hx = xs[1] - xs[0]
    hy = ys[1] - ys[0]
    ix = jnp.clip(jnp.floor((x - xs[0]) / hx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(jnp.floor((y - ys[0]) / hy).astype(jnp.int32), 0, ny - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy
    M = sol.coeffs.shape[-1]
    Vx, Vx1 = legendre.legendre_vandermonde(tx, M, num_derivs=1)
    Vy, Vy1 = legendre.legendre_vandermonde(ty, M, num_derivs=1)
    W = sol.coeffs[iy, ix]  # [P, M(ky), M(kx)]
    hi = jax.lax.Precision.HIGHEST
    ux = (2.0 / hx) * jnp.einsum("pk,pkl,pl->p", Vy, W, Vx1, precision=hi)
    uy = (2.0 / hy) * jnp.einsum("pk,pkl,pl->p", Vy1, W, Vx, precision=hi)
    return ux, uy


class HybridSolver2D:
    """Facade mirroring the 1D API for structured-quad 2D problems."""

    def __init__(self, problem: Problem2D, config: Solver2DConfig = Solver2DConfig()):
        self.problem = problem
        self.config = config
        self._shared = prepare_shared_2d(problem, config)
        self.solution: Optional[Solution2D] = None

    def solve(self) -> Solution2D:
        self.solution = hybrid_solve_2d(self.problem, self.config,
                                        self._shared)
        return self.solution

    def evaluate_solution(self, x, y):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_2d(self.solution,
                           jnp.asarray(x, dtype), jnp.asarray(y, dtype))

    def evaluate_gradient(self, x, y):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_2d_gradient(self.solution,
                                    jnp.asarray(x, dtype),
                                    jnp.asarray(y, dtype))

    def errors(self, x, y):
        from ..utils import metrics

        u = self.evaluate_solution(x, y)
        dtype = u.dtype
        ue = self.problem.exact(jnp.asarray(x, dtype), jnp.asarray(y, dtype))
        return metrics.linf_error(u, ue), metrics.l2_error(u, ue)
