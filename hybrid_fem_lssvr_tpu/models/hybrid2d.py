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
    """L u = -a0 Lap(u) + b . grad(u) + c u = f on a rectangle, u = g on the
    boundary.  Constant coefficients (a0, b, c) keep the per-element
    operators shared across the uniform mesh, so every family rides the same
    precomputed-affine-map enhancement fast path as Poisson; defaults give
    the pure Poisson operator.  c < 0 is Helmholtz, b != 0 is
    advection-diffusion — the 2D analogs of the 1D families in
    ``models/problems.py`` (reference scope: 1D Poisson only,
    ``Hybrid-FEM-LSSVR.py:8-18``)."""

    name: str
    f: Callable  # f(x, y)
    g: Callable  # Dirichlet data g(x, y)
    domain: Tuple[float, float, float, float] = (-1.0, 1.0, -1.0, 1.0)
    # Per-edge BC type (left, right, bottom, top): "dirichlet" (u = g,
    # the reference's only mode), "neumann" (a0 du/dn = g_natural) or
    # "robin" (a0 du/dn + robin_alpha u = g_natural).  Natural edges keep
    # their boundary nodes as unknowns (weak boundary term assembled by
    # ``fem_solve_2d``); the enhancement pins those element traces to the
    # FEM trace instead of exact data.
    bc_edges: Tuple[str, str, str, str] = ("dirichlet",) * 4
    g_natural: Optional[Callable] = None  # natural data on non-Dirichlet edges
    robin_alpha: float = 0.0
    exact: Optional[Callable] = None
    a0: float = 1.0  # diffusion coefficient (constant)
    c: float = 0.0  # reaction coefficient (c < 0: Helmholtz)
    b: Tuple[float, float] = (0.0, 0.0)  # advection velocity (bx, by)
    # Variable diffusion: L u = -div(a(x,y) grad u) + c u.  When set, the
    # per-element operators differ and the enhancement runs the batched
    # null-space QR path (2D analog of problems.variable_coeff_elliptic);
    # grad_a = (da/dx, da/dy) callables for the chain-rule collocation rows.
    a_var: Optional[Callable] = None
    grad_a: Optional[Tuple[Callable, Callable]] = None
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


def _trig_tensor_rhs(a1, a2, a3, a4):
    """(f, f_shifted, f_elem_factors, f_colloc_factors) for the rhs family
    f = a1 SxSy + a2 CxSy + a3 SxCy + a4 CxCy with Sx = sin(pi x) etc. —
    every constant-coefficient operator applied to u = sin(pi x) sin(pi y)
    lands in this 4-term tensor basis, so all 2D families share one
    separable-rhs expansion (angle addition against the static collocation
    offsets; see the poisson_2d docstrings)."""
    pi = jnp.pi

    def f(x, y):
        sx, cx = jnp.sin(pi * x), jnp.cos(pi * x)
        sy, cy = jnp.sin(pi * y), jnp.cos(pi * y)
        return a1 * sx * sy + a2 * cx * sy + a3 * sx * cy + a4 * cx * cy

    def f_shifted(xl, dx, yl, dy):
        sx = jnp.sin(pi * (xl + dx))
        cx = jnp.cos(pi * (xl + dx))
        sy = jnp.sin(pi * (yl + dy))
        cy = jnp.cos(pi * (yl + dy))
        return a1 * sx * sy + a2 * cx * sy + a3 * sx * cy + a4 * cx * cy

    def f_elem_factors(xl, yl):
        sx, cx = jnp.sin(pi * xl), jnp.cos(pi * xl)
        sy, cy = jnp.sin(pi * yl), jnp.cos(pi * yl)
        # coefficients of [cdx*cdy, cdx*sdy, sdx*cdy, sdx*sdy]
        return [
            a1 * sx * sy + a2 * cx * sy + a3 * sx * cy + a4 * cx * cy,
            a1 * sx * cy + a2 * cx * cy - a3 * sx * sy - a4 * cx * sy,
            a1 * cx * sy - a2 * sx * sy + a3 * cx * cy - a4 * sx * cy,
            a1 * cx * cy - a2 * sx * cy - a3 * cx * sy + a4 * sx * sy,
        ]

    def f_colloc_factors(dx, dy):
        cdx, sdx = np.cos(np.pi * dx), np.sin(np.pi * dx)
        cdy, sdy = np.cos(np.pi * dy), np.sin(np.pi * dy)
        return [cdx * cdy, cdx * sdy, sdx * cdy, sdx * sdy]

    return f, f_shifted, f_elem_factors, f_colloc_factors


def helmholtz_2d(k: float = 2.0) -> Problem2D:
    """-Lap u - k^2 u = (2 pi^2 - k^2) sin(pi x) sin(pi y), exact
    u = sin(pi x) sin(pi y) — 2D analog of ``problems.helmholtz_1d``.

    The continuous operator's smallest Dirichlet eigenvalue on (-1,1)^2 is
    pi^2/2 ~ 4.93, so k > ~2.2 makes the coarse system indefinite; the
    coarse stage routes to BiCGStab for any k (symmetric indefinite is fine,
    CG is not)."""
    pi = float(jnp.pi)
    amp = 2.0 * pi * pi - k * k
    f, f_shifted, f_ef, f_cf = _trig_tensor_rhs(amp, 0.0, 0.0, 0.0)
    return Problem2D(
        name="helmholtz_2d",
        f=f,
        g=lambda x, y: jnp.zeros_like(x + y),
        exact=lambda x, y: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y),
        c=-k * k,
        f_shifted=f_shifted,
        f_elem_factors=f_ef,
        f_colloc_factors=f_cf,
    )


def advection_diffusion_2d(bx: float = 3.0, by: float = 1.5) -> Problem2D:
    """-Lap u + b . grad u = f with exact u = sin(pi x) sin(pi y) — the 2D
    analog of ``problems.advection_diffusion_1d``; the coarse Q1 system is
    nonsymmetric (BiCGStab) and the collocation rows gain first-derivative
    terms."""
    pi = float(jnp.pi)
    f, f_shifted, f_ef, f_cf = _trig_tensor_rhs(
        2.0 * pi * pi, bx * pi, by * pi, 0.0
    )
    return Problem2D(
        name="advection_diffusion_2d",
        f=f,
        g=lambda x, y: jnp.zeros_like(x + y),
        exact=lambda x, y: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y),
        b=(bx, by),
        f_shifted=f_shifted,
        f_elem_factors=f_ef,
        f_colloc_factors=f_cf,
    )


def reaction_diffusion_2d(c: float = 10.0) -> Problem2D:
    """-Lap u + c u = f (c > 0: SPD coarse system, exercises the mass term
    on the CG path), exact u = sin(pi x) sin(pi y)."""
    pi = float(jnp.pi)
    f, f_shifted, f_ef, f_cf = _trig_tensor_rhs(
        2.0 * pi * pi + c, 0.0, 0.0, 0.0
    )
    return Problem2D(
        name="reaction_diffusion_2d",
        f=f,
        g=lambda x, y: jnp.zeros_like(x + y),
        exact=lambda x, y: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y),
        c=c,
        f_shifted=f_shifted,
        f_elem_factors=f_ef,
        f_colloc_factors=f_cf,
    )


def variable_coeff_elliptic_2d() -> Problem2D:
    """-div(a grad u) = f with a(x, y) = 1 + xy/2 (positive on the square),
    exact u = sin(pi x) sin(pi y) — 2D analog of
    ``problems.variable_coeff_elliptic``.  Expanding the divergence:
    f = 2 pi^2 a u - da/dx u_x - da/dy u_y."""
    pi = jnp.pi

    def a(x, y):
        return 1.0 + 0.5 * x * y

    def ax(x, y):
        return 0.5 * y * jnp.ones_like(x + y)

    def ay(x, y):
        return 0.5 * x * jnp.ones_like(x + y)

    def f(x, y):
        sx, cx = jnp.sin(pi * x), jnp.cos(pi * x)
        sy, cy = jnp.sin(pi * y), jnp.cos(pi * y)
        return (2.0 * pi * pi * a(x, y) * sx * sy
                - ax(x, y) * pi * cx * sy
                - ay(x, y) * pi * sx * cy)

    def f_shifted(xl, dx, yl, dy):
        # Angle addition against the static in-element offsets: 4
        # transcendentals per element (on [1, tile]) + O(C^2) per tile,
        # instead of 4 C^2 per element (the fused-kernel rhs hook).
        sxl, cxl = jnp.sin(pi * xl), jnp.cos(pi * xl)
        syl, cyl = jnp.sin(pi * yl), jnp.cos(pi * yl)
        sdx, cdx = jnp.sin(pi * dx), jnp.cos(pi * dx)
        sdy, cdy = jnp.sin(pi * dy), jnp.cos(pi * dy)
        sx = sxl * cdx + cxl * sdx
        cx = cxl * cdx - sxl * sdx
        sy = syl * cdy + cyl * sdy
        cy = cyl * cdy - syl * sdy
        x = xl + dx
        y = yl + dy
        return (2.0 * pi * pi * (1.0 + 0.5 * x * y) * sx * sy
                - 0.5 * y * pi * cx * sy
                - 0.5 * x * pi * sx * cy)

    return Problem2D(
        name="variable_coeff_elliptic_2d",
        f=f,
        g=lambda x, y: jnp.zeros_like(x + y),
        exact=lambda x, y: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y),
        a_var=a,
        grad_a=(ax, ay),
        f_shifted=f_shifted,
    )


def poisson_2d_neumann() -> Problem2D:
    """-Lap u = 2 pi^2 sin sin with a Neumann right edge:
    du/dn|_{x=1} = -pi sin(pi y); Dirichlet (g = 0) on the other three.
    Exact u = sin(pi x) sin(pi y) — exercises the natural-BC weak
    boundary term and the FEM-trace pin on the right-edge elements."""
    pi = jnp.pi
    return Problem2D(
        name="poisson_2d_neumann",
        f=lambda x, y: 2.0 * pi**2 * jnp.sin(pi * x) * jnp.sin(pi * y),
        g=lambda x, y: jnp.zeros_like(x + y),
        bc_edges=("dirichlet", "neumann", "dirichlet", "dirichlet"),
        g_natural=lambda x, y: -pi * jnp.sin(pi * y) * jnp.ones_like(x),
        exact=lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y),
    )


def robin_2d(alpha: float = 1.0) -> Problem2D:
    """-Lap u + u = (2 pi^2 + 1) cos cos with Robin right and top edges
    (du/dn + alpha u = g_natural; du/dn = 0 there, so g_natural =
    alpha·u_exact), Dirichlet left and bottom.  Exact u = cos(pi x)
    cos(pi y): nonzero boundary values including the free corner where
    the two Robin edges meet."""
    pi = jnp.pi

    def u(x, y):
        return jnp.cos(pi * x) * jnp.cos(pi * y)

    return Problem2D(
        name=f"robin_2d_alpha{alpha:g}",
        f=lambda x, y: (2.0 * pi**2 + 1.0) * u(x, y),
        g=u,
        c=1.0,
        bc_edges=("dirichlet", "robin", "dirichlet", "robin"),
        g_natural=lambda x, y: alpha * u(x, y),
        robin_alpha=alpha,
        exact=u,
    )


_PROBLEMS_2D = {
    "poisson_2d": poisson_2d,
    "poisson_2d_inhomogeneous": poisson_2d_inhomogeneous,
    "helmholtz_2d": helmholtz_2d,
    "advection_diffusion_2d": advection_diffusion_2d,
    "reaction_diffusion_2d": reaction_diffusion_2d,
    "variable_coeff_elliptic_2d": variable_coeff_elliptic_2d,
    "poisson_2d_neumann": poisson_2d_neumann,
    "robin_2d": robin_2d,
}


def get_problem_2d(name: str, **kwargs) -> Problem2D:
    """Registry lookup mirroring ``problems.get`` for the 2D families."""
    try:
        return _PROBLEMS_2D[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown 2D problem {name!r}; available: "
            f"{sorted(_PROBLEMS_2D)}"
        ) from None


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
    # | 'shifted' (SPD-shifted real Laplacian V-cycle, c -> |c| — the
    # robust preconditioner for indefinite Helmholtz; 'auto' picks it
    # when c < 0 and the grid is MG-eligible)
    backend: str = "auto"  # 'auto' | 'xla' | 'pallas' (enhancement stage)
    varcoeff_method: str = "sne"  # Pallas per-element LSE algorithm:
    # 'sne' (semi-normal equations + refinement, MXU, ~1.2x faster) |
    # 'qr' (CGS2, VPU).  Identical accuracy (tests/test_pallas.py);
    # XLA/CPU paths always use the QR algebra.
    diagnostics: bool = True
    dtype: Optional[str] = None
    fem_dtype: Optional[str] = None  # 'float64' runs the coarse CG stage in
    # (TPU-emulated) f64 — all MG/CG ops are elementwise so this works on
    # TPU (requires jax_enable_x64); same kappa-growth rationale as 1D
    coarse: str = "q1"  # 'q1' (O(h^2) nodal) | 'compact' (tensor-Numerov
    # 9-point scheme A u = M f_nodal, O(h^4) nodal — requires uniform mesh,
    # constant diffusion, b == 0, all-Dirichlet edges; the steady analog of
    # TransientConfig.mass='numerov')
    trace_lift: int = 0  # 0: bilinear FEM element trace (O(h^2) — the
    # enhancement floor of the q1 coarse).  >= 2: tangential Lagrange
    # interpolation of nodal grid lines with this stencil width (6 typical)
    # — with coarse='compact' the O(h^4) nodal values carry through to an
    # O(h^4) hybrid solution (same lift as the eigen family's
    # ``_lifted_trace_2d``; forces the XLA enhancement backend)

    def __post_init__(self):
        if self.formulation not in ("primal", "dual"):
            raise ValueError(f"unknown formulation: {self.formulation!r}")
        if self.coarse not in ("q1", "compact"):
            raise ValueError(f"unknown coarse scheme: {self.coarse!r}")
        if self.trace_lift == 1 or self.trace_lift < 0:
            raise ValueError("trace_lift must be 0 or >= 2")

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


def _lift_weights(n_nodes: int, t_pts, stencil: int = 6):
    """Static Lagrange interpolation of grid-line nodal values to element
    edge points: for element b, interpolate through ``stencil`` consecutive
    nodes (one-sided near the boundary) at local coords t in [-1, 1].

    Returns numpy (idx [n_el, stencil] node indices, w [n_el, P, stencil]).
    The interpolation reproduces nodal values exactly (Lagrange), so
    homogeneous Dirichlet lines lift to exactly zero with no special-casing.
    """
    n_el = n_nodes - 1
    s = min(stencil, n_nodes)
    starts = np.clip(np.arange(n_el) - (s - 1) // 2, 0, n_nodes - s)
    idx = starts[:, None] + np.arange(s)[None, :]
    t_pts = np.asarray(t_pts, np.float64)
    w = np.empty((n_el, t_pts.shape[0], s))
    nodes = np.arange(s, dtype=np.float64)
    for b in range(n_el):
        xi = (b - starts[b]) + 0.5 * (t_pts + 1.0)  # stencil-local coords
        for j in range(s):
            others = np.delete(nodes, j)
            w[b, :, j] = np.prod(
                (xi[:, None] - others[None, :]) / (nodes[j] - others),
                axis=1)
    return idx, w


def _lifted_trace_2d(fem, M: int, nx: int, ny: int, stencil: int = 6):
    """[E, 4M-4] element-edge trace values from HIGH-ORDER tangential
    interpolation of the nodal grid along each edge's grid line — replaces
    the O(h^2) bilinear trace that caps the 2D enhancement floor.  Valid
    whenever the nodal values are themselves high-order: the eigen family
    (exact sampled eigenvectors on the tensor pencil) and the steady
    ``coarse='compact'`` scheme (O(h^4) nodal).

    Row order matches ``_boundary_coords``: bottom M points (ty=-1), top M,
    left tb[1:-1], right tb[1:-1].
    """
    dtype = fem.dtype
    tb = np.linspace(-1.0, 1.0, M)
    idxx, wxf = _lift_weights(nx + 1, tb, stencil)
    idxy, wyi = _lift_weights(ny + 1, tb[1:-1], stencil)
    wx = jnp.asarray(wxf, dtype)
    wy = jnp.asarray(wyi, dtype)
    # HIGHEST: these contractions hit the MXU on TPU, and the default bf16
    # passes would put a ~4e-4 relative error straight onto the trace —
    # swamping the O(h^4) nodal accuracy the lift exists to preserve
    # (measured: 3.3e-3 vs 8.6e-6 hybrid Linf at 32^2 f32).
    hi = jax.lax.Precision.HIGHEST
    Ux = fem[:, idxx]  # [ny+1, nx, S] tangential windows on each row
    bottom = jnp.einsum("bmj,abj->abm", wx, Ux[:-1], precision=hi)
    top = jnp.einsum("bmj,abj->abm", wx, Ux[1:], precision=hi)
    Uy = fem[idxy]  # [ny, S, nx+1] windows down each column
    left = jnp.einsum("amj,ajb->abm", wy, Uy[:, :, :-1], precision=hi)
    right = jnp.einsum("amj,ajb->abm", wy, Uy[:, :, 1:], precision=hi)
    rows = jnp.concatenate([bottom, top, left, right], axis=-1)
    return rows.reshape(ny * nx, 4 * M - 4)


class VarCoeff2DOperators(NamedTuple):
    """Shared host-f64-precomputed operator parts for the per-element
    variable-coefficient 2D enhancement: D_e = -a_e * Lap - ax_e * Gx
    - ay_e * Gy + Dconst, batched over elements with the coefficient fields
    sampled at each element's collocation points."""

    Lap: jnp.ndarray  # [C^2, M^2]  sx^2 V0(x)V2 + sy^2 V2(x)V0 (positive)
    Gx: jnp.ndarray  # [C^2, M^2]  sx V0 (x) V1
    Gy: jnp.ndarray  # [C^2, M^2]  sy V1 (x) V0
    Dconst: jnp.ndarray  # [C^2, M^2]  bx Gx + by Gy + c Mass
    B: jnp.ndarray  # [4M-4, M^2] shared trace rows
    Z: jnp.ndarray  # [M^2, M^2-(4M-4)] null basis of B
    Pbc: jnp.ndarray  # [M^2, 4M-4] min-norm particular map
    # Fused-kernel precompute (host f64, statically scaled by 1/s2 so every
    # f32 intermediate is O(1)): the four operator parts projected onto the
    # null basis / particular map, stacked [Lap; Gx; Gy; Dconst].
    AZ: jnp.ndarray = None  # [4 C^2, K]  (K = null-space dim)
    AP: jnp.ndarray = None  # [4 C^2, 4M-4]
    s2: float = 1.0  # the static row scale sx^2 + sy^2
    # Semi-normal-equations precompute: pair-symmetrised products of the
    # AZ blocks, so N = G^T G = NZ contracted against the coefficient
    # pair-product fields in ONE MXU dot (see
    # pallas_kernels.fused_enhance_varcoeff_2d method='sne').  Pairs (s, t),
    # s <= t < n_terms, in lexicographic order; n_terms = 3 when Dconst
    # vanishes (pure -div(a grad u)) else 4.
    NZ: jnp.ndarray = None  # [K^2, P C^2], P = n_terms (n_terms+1) / 2
    n_terms: int = 3


def prepare_shared_2d(problem: Problem2D, cfg: Solver2DConfig):
    """Host float64 precompute of the shared 2D operators (D, B, Wf, Wbc);
    for variable-coefficient problems (``problem.a_var``), the shared
    operator PARTS + null-space basis instead (``VarCoeff2DOperators``).

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
    if problem.a_var is not None:
        dtype = cfg.jnp_dtype()
        sxf, syf = 2.0 / hx, 2.0 / hy
        Lap = (
            sxf * sxf * np.einsum("yk,xl->yxkl", V0, V2)
            + syf * syf * np.einsum("yk,xl->yxkl", V2, V0)
        ).reshape(C * C, M * M)
        Gx = (sxf * np.einsum("yk,xl->yxkl", V0, V1)).reshape(C * C, M * M)
        Gy = (syf * np.einsum("yk,xl->yxkl", V1, V0)).reshape(C * C, M * M)
        Mass = np.einsum("yk,xl->yxkl", V0, V0).reshape(C * C, M * M)
        bxv, byv = problem.b
        Dconst = bxv * Gx + byv * Gy + problem.c * Mass
        bpts = _boundary_coords(M)
        V0y_b = legendre.vandermonde_host(bpts[:, 0], M)[0]
        V0x_b = legendre.vandermonde_host(bpts[:, 1], M)[0]
        B = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M * M)
        Z, Pbc = kkt.nullspace_host(B)
        s2 = sxf * sxf + syf * syf
        AZ = np.concatenate(
            [Lap @ Z, Gx @ Z, Gy @ Z, Dconst @ Z]
        ) / s2  # [4 C^2, K]
        AP = np.concatenate(
            [Lap @ Pbc, Gx @ Pbc, Gy @ Pbc, Dconst @ Pbc]
        ) / s2  # [4 C^2, 4M-4]
        # Pair-symmetrised AZ products for the semi-normal-equations
        # kernel: N[j, k] = sum_p sum_q (c_s c_t)[q] NZ[(j, k), (p, q)].
        C2 = C * C
        K = Z.shape[1]
        n_terms = 4 if (bxv != 0.0 or byv != 0.0 or problem.c != 0.0) \
            else 3
        AZb = (AZ / 1.0).reshape(4, C2, K)
        pairs = [(s, t) for s in range(n_terms) for t in range(s, n_terms)]
        NZ = np.zeros((K * K, len(pairs) * C2))
        for pi, (s, t) in enumerate(pairs):
            blk = np.einsum("qj,qk->jkq", AZb[s], AZb[t])
            if s != t:
                blk = blk + np.einsum("qj,qk->jkq", AZb[t], AZb[s])
            NZ[:, pi * C2:(pi + 1) * C2] = blk.reshape(K * K, C2)
        ops = VarCoeff2DOperators(
            Lap=jnp.asarray(Lap, dtype), Gx=jnp.asarray(Gx, dtype),
            Gy=jnp.asarray(Gy, dtype), Dconst=jnp.asarray(Dconst, dtype),
            B=jnp.asarray(B, dtype), Z=jnp.asarray(Z, dtype),
            Pbc=jnp.asarray(Pbc, dtype),
            AZ=jnp.asarray(AZ, dtype), AP=jnp.asarray(AP, dtype),
            s2=float(s2),
            NZ=jnp.asarray(NZ, dtype), n_terms=n_terms,
        )
        return ops, (jnp.asarray(t_int), jnp.asarray(bpts))
    sx = 2.0 / hx
    sy = 2.0 / hy
    # D[(iy, ix), (ky, kx)] = rows of L = -a0 Lap + b . grad + c applied to
    # the tensor-product basis P_ky(ty) P_kx(tx) with chain factors 2/h.
    Dt = -problem.a0 * (
        sx * sx * np.einsum("yk,xl->yxkl", V0, V2)
        + sy * sy * np.einsum("yk,xl->yxkl", V2, V0)
    )
    bx, by = problem.b
    if bx != 0.0:
        Dt = Dt + bx * sx * np.einsum("yk,xl->yxkl", V0, V1)
    if by != 0.0:
        Dt = Dt + by * sy * np.einsum("yk,xl->yxkl", V1, V0)
    if problem.c != 0.0:
        Dt = Dt + problem.c * np.einsum("yk,xl->yxkl", V0, V0)
    D = Dt.reshape(C * C, M * M)
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


def _varcoeff_mg_levels(problem: Problem2D, hx: float, hy: float, dtype,
                        lvl_offset: int = 0, c_override: float = None):
    """``apply_diag_for_level(lvl, shape)`` factory for
    ``multigrid.make_vcycle`` with variable diffusion: exact per-level
    rediscretisation by re-sampling the coefficient callable at each
    level's own quadrature points.  Level ``lvl`` sits at spacing
    ``h * 2**(lvl + lvl_offset)`` — pass ``lvl_offset=1`` when the serial
    V-cycle runs below a distributed fine level (``parallel/sharded2d``).
    ``c_override`` replaces the reaction coefficient (shifted-Laplacian
    preconditioning of indefinite Helmholtz uses c -> |c|)."""
    from ..ops import assembly2d

    x0d, y0d = problem.domain[0], problem.domain[2]
    bx, by = problem.b
    c_eff = problem.c if c_override is None else c_override
    has_const = c_eff != 0.0 or bx != 0.0 or by != 0.0

    def apply_diag_for_level(lvl, shape):
        s = float(2 ** (lvl + lvl_offset))
        Sq_l, dxq_l, dyq_l = assembly2d.q1_varcoeff_parts(hx * s, hy * s)
        Sq_l = jnp.asarray(Sq_l, dtype)
        xs_l = x0d + hx * s * jnp.arange(shape[1], dtype=dtype)
        ys_l = y0d + hy * s * jnp.arange(shape[0], dtype=dtype)
        am = assembly2d.coeff_maps(xs_l, ys_l, problem.a_var, dxq_l, dyq_l)
        Kc = None
        if has_const:
            Kc = jnp.asarray(
                assembly2d.q1_local_operator(
                    hx * s, hy * s, 0.0, c_eff, bx, by
                ),
                dtype,
            )

        def apply_l(v):
            y = assembly2d.apply_stiffness_var(v, Sq_l, am)
            if Kc is not None:
                y = y + assembly2d.apply_stiffness(v, Kc)
            return y

        d = assembly2d.stiffness_var_diag(shape, Sq_l, am, dtype)
        if Kc is not None:
            d = d + assembly2d.stiffness_diag(shape, Kc, dtype)
        return apply_l, d

    return apply_diag_for_level


def _edge_mass_apply(g, h):
    """Consistent P1 edge-mass product M @ g on a uniform edge: interior
    rows h/6·(g_{i-1} + 4 g_i + g_{i+1}), end rows h/6·(2 g_end + g_nb) —
    the exact integral of (P1 interpolant of g)·hat_i along the edge."""
    core = (g[:-2] + 4.0 * g[1:-1] + g[2:]) * (h / 6.0)
    e0 = ((2.0 * g[0] + g[1]) * (h / 6.0))[None]
    e1 = ((g[-2] + 2.0 * g[-1]) * (h / 6.0))[None]
    return jnp.concatenate([e0, core, e1])


def _edge_mass_diag(n, h, dtype):
    d = jnp.full((n,), 4.0 * h / 6.0, dtype)
    return d.at[0].set(2.0 * h / 6.0).at[-1].set(2.0 * h / 6.0)


# (edge index) -> grid slicing helpers for the four rectangle edges in
# bc_edges order (left, right, bottom, top).
def _edge_rows(v, e):
    return [v[:, 0], v[:, -1], v[0, :], v[-1, :]][e]


def _edge_add(arr, e, vals):
    return [lambda: arr.at[:, 0].add(vals), lambda: arr.at[:, -1].add(vals),
            lambda: arr.at[0, :].add(vals), lambda: arr.at[-1, :].add(vals)
            ][e]()


def fem_solve_2d(problem: Problem2D, cfg: Solver2DConfig, xs, ys):
    """Coarse Q1 nodal values on the grid via preconditioned CG (SPD
    operators) or BiCGStab (advection / indefinite Helmholtz)."""
    dtype = xs.dtype
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    bx, by = problem.b
    var = problem.a_var is not None
    compact = cfg.coarse == "compact"
    if compact:
        if var:
            raise ValueError(
                "coarse='compact' needs constant diffusion (a_var is set); "
                "use coarse='q1'")
        if bx != 0.0 or by != 0.0:
            raise ValueError("coarse='compact' requires b == (0, 0)")
        if any(t != "dirichlet" for t in problem.bc_edges):
            raise ValueError(
                "coarse='compact' requires all-Dirichlet edges (the "
                "Numerov rhs weighting assumes value-pinned boundaries)")

    def _local_op_np(hx_, hy_, c_):
        """Shared local 4x4 at spacing (hx_, hy_) — Q1 weak form, or the
        tensor-Numerov compact operator (same 9-point sparsity, so the
        whole matrix-free/MG machinery below is scheme-agnostic)."""
        if compact:
            return assembly2d.q1_numerov_locals(hx_, hy_, problem.a0, c_)[0]
        return assembly2d.q1_local_operator(hx_, hy_, problem.a0, c_, bx, by)

    if var:
        # Per-element stiffness K_e = sum_q a(x_q) S_q; reaction/advection
        # terms stay shared (constant coefficients) and compose additively.
        Sq_np, dxq, dyq = assembly2d.q1_varcoeff_parts(hx, hy)
        Sq = jnp.asarray(Sq_np, dtype)
        a_maps = assembly2d.coeff_maps(xs, ys, problem.a_var, dxq, dyq)
        K_const = None
        if problem.c != 0.0 or bx != 0.0 or by != 0.0:
            K_const = jnp.asarray(
                assembly2d.q1_local_operator(hx, hy, 0.0, problem.c, bx,
                                             by),
                dtype,
            )

        def apply_op(v):
            y = assembly2d.apply_stiffness_var(v, Sq, a_maps)
            if K_const is not None:
                y = y + assembly2d.apply_stiffness(v, K_const)
            return y
    else:
        K_loc = jnp.asarray(_local_op_np(hx, hy, problem.c), dtype)

        def apply_op(v):
            return assembly2d.apply_stiffness(v, K_loc)
    # CG requires SPD: symmetric needs b == 0; definiteness can fail for
    # c < 0 (Helmholtz shifts eigenvalues down), so route those to BiCGStab.
    spd = bx == 0.0 and by == 0.0 and problem.c >= 0.0

    if compact:
        # Numerov-weighted load M f_nodal (nodal samples, not quadrature):
        # the pair (A, M f) is what makes the scheme O(h^4).
        K_M = jnp.asarray(
            assembly2d.q1_numerov_locals(hx, hy, problem.a0, problem.c)[1],
            dtype)
        Xl, Yl = jnp.meshgrid(xs, ys)
        F_nodes = problem.f(Xl, Yl) * jnp.ones_like(Xl)
        b = assembly2d.apply_stiffness(F_nodes, K_M)
    else:
        b = assembly2d.assemble_load(xs, ys, problem.f)
    ny1, nx1 = ys.shape[0], xs.shape[0]
    bcs = problem.bc_edges
    mixed = any(t != "dirichlet" for t in bcs)
    robin_edges = []
    edge_h = (hy, hy, hx, hx)
    if not mixed:
        interior = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)
    else:
        # Natural (Neumann/Robin) edges keep their boundary nodes as
        # unknowns; only Dirichlet edges are eliminated.  A corner between
        # a Dirichlet and a natural edge is Dirichlet.
        interior = jnp.ones((ny1, nx1), bool)
        if bcs[0] == "dirichlet":
            interior = interior.at[:, 0].set(False)
        if bcs[1] == "dirichlet":
            interior = interior.at[:, -1].set(False)
        if bcs[2] == "dirichlet":
            interior = interior.at[0, :].set(False)
        if bcs[3] == "dirichlet":
            interior = interior.at[-1, :].set(False)
        # Weak boundary term of -(a0 Lap u) on natural edges:
        # [a0 du/dn] v = (g_natural - robin_alpha u) v integrated along
        # the edge -> consistent edge load into b, Robin edge mass into
        # the operator.
        edge_xy = ((jnp.full_like(ys, xs[0]), ys),
                   (jnp.full_like(ys, xs[-1]), ys),
                   (xs, jnp.full_like(xs, ys[0])),
                   (xs, jnp.full_like(xs, ys[-1])))
        robin_edges = []
        for e, t in enumerate(bcs):
            if t == "dirichlet":
                continue
            gx, gy = edge_xy[e]
            gv = problem.g_natural(gx, gy) * jnp.ones_like(gx)
            b = _edge_add(b, e, _edge_mass_apply(gv, edge_h[e]))
            if t == "robin":
                robin_edges.append(e)
        if robin_edges:
            alpha = problem.robin_alpha
            base_apply = apply_op

            def apply_op(v):
                y = base_apply(v)
                for e in robin_edges:
                    y = _edge_add(
                        y, e,
                        alpha * _edge_mass_apply(_edge_rows(v, e),
                                                 edge_h[e]))
                return y

    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))

    def apply_free(v):
        return jnp.where(interior, apply_op(v * interior), 0.0)

    rhs = jnp.where(interior, b - apply_op(u_bc), 0.0)
    precond = cfg.precond
    if mixed:
        if precond in ("shifted", "adi"):
            raise ValueError(
                f"precond={precond!r} assumes all-Dirichlet edges; "
                f"mixed-BC problems run with precond='mg'|'jacobi' "
                f"(or 'auto')"
            )
        mg_ok = (cfg.nx % 2 == 0 and cfg.ny % 2 == 0
                 and min(cfg.nx, cfg.ny) >= 8 and problem.c >= 0.0
                 and not var)
        if precond == "auto":
            precond = "mg" if mg_ok else "jacobi"
        if precond == "mg":
            if not mg_ok:
                raise ValueError(
                    "mixed-BC 'mg' needs an even >= 8 grid, c >= 0 and "
                    "constant coefficients; use precond='jacobi'"
                )
            # Composite preconditioner: the all-Dirichlet V-cycle on the
            # inner subspace + Jacobi on the natural-edge unknowns (the
            # V-cycle hierarchy assumes zero-trace grids; measured
            # 104 -> 38 iterations at 32^2 and 207 -> 60 at 64^2 on
            # robin_2d, identical solution to 2e-14).
            from ..ops import multigrid

            inner = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)
            diag_m = assembly2d.stiffness_diag((ny1, nx1), K_loc, dtype)
            for e in robin_edges:
                diag_m = _edge_add(
                    diag_m, e,
                    problem.robin_alpha * _edge_mass_diag(
                        ny1 if e < 2 else nx1, edge_h[e], dtype))
            vcyc = multigrid.make_vcycle(ny1, nx1, K_loc, dtype)

            def M_inv(r):
                return (jnp.where(inner, vcyc(r * inner), 0.0)
                        + jnp.where(interior & ~inner, r / diag_m, 0.0))

            tol = cfg.cg_tol
            if tol is None:
                tol = 100.0 * float(jnp.finfo(dtype).eps)
            solver = cg.cg if spd else cg.bicgstab
            res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                         maxiter=cfg.cg_maxiter)
            u = u_bc + jnp.where(interior, res.x, 0.0)
            return u, res
    if precond == "auto":
        # V-cycle needs 2-divisible grids; Jacobi-CG iterations grow O(N)
        # (measured 88/177/357 at n=32/64/128) so prefer multigrid.  For
        # indefinite Helmholtz (c < 0) damped-Jacobi smoothing amplifies
        # the near-null modes on the TRUE operator, so precondition
        # BiCGStab with the SPD-shifted operator's V-cycle instead
        # ('shifted': c -> |c|, the real shifted Laplacian — measured
        # 67 -> 10 BiCGStab iterations at k=2 and 959 -> 39 at k=4 on a
        # random rhs at n=32, tests/test_families2d.py).
        if cfg.nx % 2 == 0 and cfg.ny % 2 == 0 and min(cfg.nx, cfg.ny) >= 8:
            precond = "mg" if problem.c >= 0.0 else "shifted"
        else:
            precond = "jacobi"
    if precond == "shifted":
        from ..ops import multigrid

        if var:
            # Variable diffusion + indefinite shift: build the V-cycle from
            # the TRUE a_var (exact per-level rediscretisation) with the
            # reaction shifted c -> |c| — ignoring a_var here silently
            # degrades preconditioner quality for heterogeneous media.
            M_inv = multigrid.make_vcycle(
                ny1, nx1, None, dtype,
                apply_diag_for_level=_varcoeff_mg_levels(
                    problem, hx, hy, dtype, c_override=abs(problem.c)
                ),
            )
        else:
            def loc_for_level_shifted(lvl):
                s = float(2 ** lvl)
                return jnp.asarray(
                    _local_op_np(hx * s, hy * s, abs(problem.c)), dtype)

            M_inv = multigrid.make_vcycle(
                ny1, nx1, loc_for_level_shifted(0), dtype,
                loc_for_level=loc_for_level_shifted,
            )
    elif precond == "mg":
        from ..ops import multigrid

        if var:
            # Exact rediscretisation per level: re-sample the coefficient
            # callable at each level's own quadrature points.
            M_inv = multigrid.make_vcycle(
                ny1, nx1, None, dtype,
                apply_diag_for_level=_varcoeff_mg_levels(
                    problem, hx, hy, dtype
                ),
            )
        else:
            # Rediscretise the full operator per level: the stiffness part
            # is scale-invariant but mass/convection parts scale with h, so
            # coarse levels rebuild the local 4x4 at their own spacing.
            def loc_for_level(lvl):
                s = float(2 ** lvl)
                return jnp.asarray(
                    _local_op_np(hx * s, hy * s, problem.c), dtype)

            M_inv = multigrid.make_vcycle(ny1, nx1, K_loc, dtype,
                                          loc_for_level=loc_for_level)
    elif precond == "adi":
        from ..parallel.transpose import make_adi_preconditioner

        M_inv = make_adi_preconditioner(ny1, nx1, hx, hy, dtype)
    else:
        if var:
            diag = assembly2d.stiffness_var_diag((ny1, nx1), Sq, a_maps,
                                                 dtype)
            if K_const is not None:
                diag = diag + assembly2d.stiffness_diag((ny1, nx1),
                                                        K_const, dtype)
        else:
            diag = assembly2d.stiffness_diag((ny1, nx1), K_loc, dtype)
        for e in robin_edges:
            diag = _edge_add(
                diag, e,
                problem.robin_alpha * _edge_mass_diag(
                    ny1 if e < 2 else nx1, edge_h[e], dtype))
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter)
    u = u_bc + jnp.where(interior, res.x, 0.0)
    return u, res


def _element_data_2d(problem: Problem2D, cfg: Solver2DConfig, xs, ys,
                     fem_values, t_int, bpts, row_offset=0, col_offset=0,
                     trace_lift: int = 0, skip_f: bool = False,
                     trace_rows=None):
    """Per-element collocation rhs [E, C^2] (interior points) and
    boundary-trace values [E, 4M-4] (FEM bilinear trace, overridden by g on
    domain-boundary edges).

    ``ys``/``fem_values`` may be a local y-slab (sharded solve); then
    ``row_offset`` is the slab's global first element row (possibly traced),
    used for the domain-boundary masks.  ``col_offset`` likewise for 2-axis
    block sharding (``parallel.sharded2d.make_sharded_solve_2d_grid``).

    ``trace_lift >= 2`` replaces the bilinear trace with the tangential
    Lagrange lift (``_lifted_trace_2d``; full-grid callers only — the lift
    windows need whole grid lines).  Sharded slab callers pass
    ``trace_rows`` instead: precomputed [ny_loc, nx, K] trace values
    (computed on the gathered full grid so the lift windows are global,
    then sliced per slab — ``parallel.sharded2d``).  Domain-boundary
    points still take g exactly in all cases.

    ``skip_f=True`` skips the body-force collocation rows (returned as
    ``None``) for trace-only callers — the per-step ``traces()`` of the
    elastodynamics marches need only the boundary rows.
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
    if skip_f:
        f_rows = None
    else:
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
    if trace_rows is not None:
        trace = trace_rows  # [ny_loc, nx, K] precomputed (global windows)
    elif trace_lift >= 2:
        trace = _lifted_trace_2d(
            fem_values, cfg.M, nx_loc, ny_loc, stencil=trace_lift
        ).reshape(ny_loc, nx_loc, -1)  # [ny, nx, K] (bpts order)
    else:
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
    # Natural (Neumann/Robin) edges have no exact boundary VALUE: those
    # element traces keep the FEM bilinear trace (mirrors the 1D
    # _dirichlet_consistent semantics); bc types are static strings.
    on_edge = (on_left, on_right, on_bottom, on_top)
    dirichlet_edges = [
        m for m, t in zip(on_edge, problem.bc_edges) if t == "dirichlet"
    ]
    on_domain_bdry = functools.reduce(
        jnp.logical_or, dirichlet_edges,
        jnp.zeros_like(on_left),
    )
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


def _varcoeff_element_operators(problem: Problem2D, cfg: Solver2DConfig,
                                xs, ys, vb: VarCoeff2DOperators, t_int):
    """Batched per-element collocation operators D [E, C^2, M^2]: sample
    the coefficient fields (a, da/dx, da/dy) at each element's collocation
    grid and combine the shared host-f64 parts.  grad_a analytic when
    supplied, else derived by ``jax.grad`` (the fused Pallas kernel requires
    analytic grad_a; this XLA build is the AD fallback).  Element counts
    come from the node arrays, so a sharded caller can pass its local
    slab/block (``parallel/sharded2d.py``)."""
    dtype = xs.dtype
    nx_l = xs.shape[0] - 1
    ny_l = ys.shape[0] - 1
    E = nx_l * ny_l
    C = cfg.n_colloc
    t = jnp.asarray(t_int, dtype)
    hx = xs[1] - xs[0]
    hy = ys[1] - ys[0]
    xq = xs[:-1][:, None] + 0.5 * hx * (t[None, :] + 1.0)  # [nx_l, C]
    yq = ys[:-1][:, None] + 0.5 * hy * (t[None, :] + 1.0)  # [ny_l, C]

    def samp(fn):
        v = fn(xq[None, :, None, :], yq[:, None, :, None])
        v = v * jnp.ones((ny_l, nx_l, C, C), dtype)
        return v.reshape(E, C * C)

    if problem.grad_a is not None:
        ax_fn, ay_fn = problem.grad_a
    else:  # derive the chain-rule coefficients by AD
        ax_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=0))
        ay_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=1))
    a_e = samp(problem.a_var)
    ax_e = samp(ax_fn)
    ay_e = samp(ay_fn)
    return (
        -a_e[..., None] * vb.Lap
        - ax_e[..., None] * vb.Gx
        - ay_e[..., None] * vb.Gy
        + vb.Dconst
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def hybrid_solve_2d(problem: Problem2D, cfg: Solver2DConfig,
                    shared_bundle) -> Solution2D:
    shared, (t_int, bpts) = shared_bundle
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)

    if cfg.fem_dtype is not None:
        from ..utils.checks import require_x64

        require_x64(cfg.fem_dtype, "Solver2DConfig.fem_dtype")
        fd = jnp.dtype(cfg.fem_dtype)
        fem_values, cg_res = fem_solve_2d(
            problem, cfg, xs.astype(fd), ys.astype(fd)
        )
        fem_values = fem_values.astype(dtype)
    else:
        fem_values, cg_res = fem_solve_2d(problem, cfg, xs, ys)
    coeffs, diags, cond = enhance_2d(problem, cfg, xs, ys, fem_values,
                                     shared_bundle)
    return Solution2D(
        xs=xs, ys=ys, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(cfg.ny, cfg.nx),
        bc_violation=diags.bc_violation.reshape(cfg.ny, cfg.nx),
        solve_ok=diags.solve_ok.reshape(cfg.ny, cfg.nx),
        cond_estimate=cond,
    )


def enhance_2d(problem: Problem2D, cfg: Solver2DConfig, xs, ys, fem_values,
               shared_bundle, bc_rows_override=None):
    """Enhancement stage in isolation: per-element tensor-Legendre fit of
    the operator against arbitrary nodal trace data (the second half of
    ``hybrid_solve_2d``, reusable by the eigenvalue family where the trace
    is a FEM eigenvector rather than a source-problem solve).

    ``bc_rows_override``: [E, 4M-4] trace values replacing the FEM bilinear
    edge trace (the eigen family's high-order lifted traces,
    ``models/eigen.py::_lifted_trace_2d``); forces the XLA path.
    """
    shared, (t_int, bpts) = shared_bundle
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    E = cfg.nx * cfg.ny
    # Lifted traces (explicit override, or cfg.trace_lift) are computed on
    # the host-XLA path; the fused Pallas kernels build the bilinear trace
    # in-kernel.
    use_lift = bc_rows_override is None and cfg.trace_lift >= 2
    backend = (cfg.backend
               if bc_rows_override is None and not use_lift else "xla")
    if backend == "auto":
        from ..ops import pallas_kernels as pk

        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pk.pick_tile(E, 4096) >= 128
            and dtype == jnp.float32  # kernels are f32-only; a global x64
            # flag alone no longer disqualifies (_mosaic_x64_safe)
            # Per-element (a_var) fused path needs analytic chain-rule
            # coefficients; AD-derived grad_a routes to XLA.
            and (problem.a_var is None or problem.grad_a is not None)
            else "xla"
        )
    if backend == "pallas":
        from ..ops import pallas_kernels as pk

        if problem.a_var is not None:
            sx, sy = 2.0 / hx, 2.0 / hy
            w, slack, bcv = pk.fused_enhance_varcoeff_2d(
                fem_values, shared, problem.a_var, problem.grad_a,
                problem.f, problem.g, (x0, hx, y0, hy), cfg.nx, cfg.ny,
                t_int, bpts, s2=sx * sx + sy * sy,
                # tile=2048 measured fastest once the 3-pass NZ contraction
                # cut VMEM+MXU cost (10.69 ms at 1024^2 vs 11.41 at 1024;
                # 4096 exceeds VMEM) — round 3.
                tile=pk.pick_tile(E, 2048),
                with_diagnostics=cfg.diagnostics,
                f_shifted_fn=problem.f_shifted,
                method=cfg.varcoeff_method,
            )
        elif shared.Pres is not None:
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
            problem, cfg, xs, ys, fem_values, t_int, bpts,
            trace_lift=cfg.trace_lift if use_lift else 0,
        )
        if bc_rows_override is not None:
            bc_rows = bc_rows_override
        if problem.a_var is not None:
            # Per-element operators: sample the coefficient fields at each
            # element's collocation grid and assemble D_e from the shared
            # parts, then the batched null-space QR (1D analog:
            # hybrid.lssvr_enhance's variable-coefficient branch).
            vb: VarCoeff2DOperators = shared
            D = _varcoeff_element_operators(problem, cfg, xs, ys, vb,
                                            t_int)
            w, diags = kkt.solve_batched(
                D, vb.B, f_rows, bc_rows, cfg.gamma,
                formulation=cfg.formulation, ZP=(vb.Z, vb.Pbc),
            )
        else:
            w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
    M = cfg.M
    coeffs = w.reshape(cfg.ny, cfg.nx, M, M)
    fb = _bilinear_fallback_coeffs(*corners, M)
    ok = diags.solve_ok.reshape(cfg.ny, cfg.nx)
    coeffs = jnp.where(
        ok[..., None, None], jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb
    )
    cond = (diags.cond_estimate if problem.a_var is not None
            else shared.cond)
    return coeffs, diags, cond


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
