"""3D Poisson-family solver on structured hex meshes: Q1 FEM +
tensor-product LSSVR enhancement.

The 2D architecture (``models/hybrid2d.py``) extends tensorially — the
reference itself is 1D-only (``Hybrid-FEM-LSSVR.py:8-18``), so 3D is a
beyond-reference capability on the same two-stage design:

* coarse stage: matrix-free Q1 hex stiffness (``ops/assembly3d``) +
  Jacobi- or V-cycle-preconditioned CG (``ops/cg``, ``ops/multigrid``);
* enhancement: per element a tensor-product Legendre expansion
  u = sum_{kz,ky,kx} w[kz,ky,kx] P_kz(tz) P_ky(ty) P_kx(tx), constrained
  by L u = f at a C^3 interior collocation grid and by pinning the
  element-boundary trace to the Q1 FEM trilinear trace at the surface
  points of the M^3 tensor grid.  A degree-(M-1)^3 tensor polynomial
  vanishing on all six faces is divisible by (1-tx^2)(1-ty^2)(1-tz^2),
  so the trace space has dimension M^3 - (M-2)^3 — exactly the number of
  surface points of the M^3 grid, and each face carries a full MxM
  tensor grid, so point values there determine the trace: B is square
  and full-rank on the trace, the 3D analog of ``_boundary_coords``.
* Every element shares the same D [C^3, M^3] and B [S, M^3] on a
  uniform mesh, so the whole enhancement is the same two-matmul affine
  map as 1D/2D, precomputed host-side in float64 via the null-space LSE
  algebra (the 3D Laplacian has (M-2)^3 discrete-harmonic null
  directions — the gamma-form normal equations are unusable, same
  rationale as ``kkt.precompute_shared_lse_host``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly3d, cg, kkt, legendre


@dataclasses.dataclass(frozen=True)
class Problem3D:
    """L u = -a0 Lap(u) + b . grad(u) + c u = f on a box, u = g on the
    boundary.  Constant coefficients keep the per-element operators shared
    across the uniform mesh (the 3D analog of ``Problem2D``)."""

    name: str
    f: Callable  # f(x, y, z)
    g: Callable  # Dirichlet data g(x, y, z)
    domain: Tuple[float, ...] = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
    # Per-face BC type in domain order (xlo, xhi, ylo, yhi, zlo, zhi):
    # "dirichlet" (u = g), "neumann" (a0 du/dn = g_natural) or "robin"
    # (a0 du/dn + robin_alpha u = g_natural).  Natural faces keep their
    # boundary nodes as unknowns (consistent Q1 face-mass boundary terms
    # assembled by ``fem_solve_3d``); the enhancement pins those element
    # traces to the FEM trace instead of exact data.
    bc_faces: Tuple[str, ...] = ("dirichlet",) * 6
    g_natural: Optional[Callable] = None
    robin_alpha: float = 0.0
    exact: Optional[Callable] = None
    a0: float = 1.0
    c: float = 0.0  # reaction (c < 0: Helmholtz -> BiCGStab coarse stage)
    b: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Variable diffusion -div(a(x,y,z) grad u): a_var the coefficient
    # callable, grad_a = (da/dx, da/dy, da/dz) callables for the
    # chain-rule collocation rows (derived by jax.grad when omitted).
    a_var: Optional[Callable] = None
    grad_a: Optional[Tuple[Callable, Callable, Callable]] = None
    # Structured rhs hook for the fused kernel:
    # f_shifted(xl, dx, yl, dy, zl, dz) == f(xl+dx, yl+dy, zl+dz) with
    # transcendentals only on the [1, tile] element corners and the
    # [C^3, 1] static offsets (trig angle addition) — a naive in-kernel
    # f costs C^3 = 64 transcendental rows per tile, measured to make the
    # fused kernel SLOWER than the XLA path (RESULTS.md).
    f_shifted: Optional[Callable] = None


def _sincos_shift(xl, dx):
    """(sin, cos) of pi (xl + dx) by angle addition: transcendentals only
    on the two factor shapes ([1, tile] corners, [C^3, 1] offsets), never
    on the [C^3, tile] product (the 1D/2D structured-rhs trick,
    NUMERICS.md 11)."""
    pi = jnp.pi
    sxl, cxl = jnp.sin(pi * xl), jnp.cos(pi * xl)
    sd, cd = jnp.sin(pi * dx), jnp.cos(pi * dx)
    return sxl * cd + cxl * sd, cxl * cd - sxl * sd


def poisson_3d() -> Problem3D:
    """-Lap u = 3 pi^2 sin(pi x) sin(pi y) sin(pi z), exact
    u = sin(pi x) sin(pi y) sin(pi z)."""
    pi = jnp.pi

    def f_shifted(xl, dx, yl, dy, zl, dz):
        sx, _ = _sincos_shift(xl, dx)
        sy, _ = _sincos_shift(yl, dy)
        sz, _ = _sincos_shift(zl, dz)
        return 3.0 * pi**2 * sx * sy * sz

    return Problem3D(
        name="poisson_3d",
        f=lambda x, y, z: 3.0 * pi**2 * jnp.sin(pi * x) * jnp.sin(pi * y)
        * jnp.sin(pi * z),
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        exact=lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y)
        * jnp.sin(pi * z),
        f_shifted=f_shifted,
    )


def poisson_3d_inhomogeneous() -> Problem3D:
    """-Lap u = 3 pi^2 cos(pi x) cos(pi y) cos(pi z), exact
    u = cos(pi x) cos(pi y) cos(pi z) — nonzero Dirichlet trace exercises
    the face g-override masks end-to-end (reference
    ``Hybrid-FEM-LSSVR.py:67-79`` semantics, lifted to faces)."""
    pi = jnp.pi

    def u(x, y, z):
        return jnp.cos(pi * x) * jnp.cos(pi * y) * jnp.cos(pi * z)

    def f_shifted(xl, dx, yl, dy, zl, dz):
        _, cx = _sincos_shift(xl, dx)
        _, cy = _sincos_shift(yl, dy)
        _, cz = _sincos_shift(zl, dz)
        return 3.0 * pi**2 * cx * cy * cz

    return Problem3D(
        name="poisson_3d_inhomogeneous",
        f=lambda x, y, z: 3.0 * pi**2 * u(x, y, z),
        g=u,
        exact=u,
        f_shifted=f_shifted,
    )


def helmholtz_3d(k: float = 2.0) -> Problem3D:
    """-Lap u - k^2 u with exact u = sin(pi x) sin(pi y) sin(pi z) — the
    3D indefinite family (coarse stage routes to BiCGStab with the
    shifted-Laplacian V-cycle, as in 2D)."""
    pi = float(np.pi)

    def u(x, y, z):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.sin(jnp.pi * z)

    amp = 3.0 * pi * pi - k * k

    def f_shifted(xl, dx, yl, dy, zl, dz):
        sx, _ = _sincos_shift(xl, dx)
        sy, _ = _sincos_shift(yl, dy)
        sz, _ = _sincos_shift(zl, dz)
        return amp * sx * sy * sz

    return Problem3D(
        name="helmholtz_3d",
        f=lambda x, y, z: amp * u(x, y, z),
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        exact=u,
        c=-k * k,
        f_shifted=f_shifted,
    )


def advection_diffusion_3d(bx: float = 2.0, by: float = 1.0,
                           bz: float = 0.5) -> Problem3D:
    """-Lap u + b . grad u = f with exact u = sin(pi x) sin(pi y) sin(pi z)
    (nonsymmetric coarse system -> BiCGStab)."""
    pi = jnp.pi

    def u(x, y, z):
        return jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)

    def f(x, y, z):
        sx, cx = jnp.sin(pi * x), jnp.cos(pi * x)
        sy, cy = jnp.sin(pi * y), jnp.cos(pi * y)
        sz, cz = jnp.sin(pi * z), jnp.cos(pi * z)
        return (3.0 * pi**2 * sx * sy * sz
                + bx * pi * cx * sy * sz
                + by * pi * sx * cy * sz
                + bz * pi * sx * sy * cz)

    def f_shifted(xl, dx, yl, dy, zl, dz):
        sx, cx = _sincos_shift(xl, dx)
        sy, cy = _sincos_shift(yl, dy)
        sz, cz = _sincos_shift(zl, dz)
        return (3.0 * pi**2 * sx * sy * sz
                + bx * pi * cx * sy * sz
                + by * pi * sx * cy * sz
                + bz * pi * sx * sy * cz)

    return Problem3D(
        name="advection_diffusion_3d", f=f,
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        exact=u, b=(bx, by, bz),
        f_shifted=f_shifted,
    )


def variable_coeff_elliptic_3d() -> Problem3D:
    """-div(a grad u) = f with a(x,y,z) = 1 + 0.5 x y z (positive on the
    cube: a in [7/8, 9/8] -> SPD coarse system) and exact
    u = sin(pi x) sin(pi y) sin(pi z).  The 3D member of the
    variable-coefficient elliptic family (BASELINE config 3 lifted to
    hexes; 2D analog ``variable_coeff_elliptic_2d``).
    f = 3 pi^2 a u - grad a . grad u with grad a = 0.5 (yz, xz, xy)."""
    pi = jnp.pi

    def a(x, y, z):
        return 1.0 + 0.5 * x * y * z

    def ax(x, y, z):
        return 0.5 * y * z * jnp.ones_like(x)

    def ay(x, y, z):
        return 0.5 * x * z * jnp.ones_like(y)

    def az(x, y, z):
        return 0.5 * x * y * jnp.ones_like(z)

    def u(x, y, z):
        return jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)

    def f(x, y, z):
        sx, cx = jnp.sin(pi * x), jnp.cos(pi * x)
        sy, cy = jnp.sin(pi * y), jnp.cos(pi * y)
        sz, cz = jnp.sin(pi * z), jnp.cos(pi * z)
        return (3.0 * pi * pi * (1.0 + 0.5 * x * y * z) * sx * sy * sz
                - 0.5 * pi * (y * z * cx * sy * sz
                              + x * z * sx * cy * sz
                              + x * y * sx * sy * cz))

    return Problem3D(
        name="variable_coeff_elliptic_3d",
        f=f,
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        exact=u,
        a_var=a,
        grad_a=(ax, ay, az),
    )


def poisson_3d_neumann() -> Problem3D:
    """-Lap u = 3 pi^2 sin sin sin with a Neumann x-hi face:
    du/dn|_{x=1} = -pi sin(pi y) sin(pi z); Dirichlet (g = 0) elsewhere.
    Exact u = sin(pi x) sin(pi y) sin(pi z)."""
    pi = jnp.pi
    return Problem3D(
        name="poisson_3d_neumann",
        f=lambda x, y, z: 3.0 * pi**2 * jnp.sin(pi * x) * jnp.sin(pi * y)
        * jnp.sin(pi * z),
        g=lambda x, y, z: jnp.zeros_like(x + y + z),
        bc_faces=("dirichlet", "neumann", "dirichlet", "dirichlet",
                  "dirichlet", "dirichlet"),
        g_natural=lambda x, y, z: -pi * jnp.sin(pi * y) * jnp.sin(pi * z)
        * jnp.ones_like(x),
        exact=lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y)
        * jnp.sin(pi * z),
    )


def robin_3d(alpha: float = 1.0) -> Problem3D:
    """-Lap u + u = (3 pi^2 + 1) cos cos cos with Robin x-hi and z-hi
    faces (du/dn = 0 there, so g_natural = alpha·u_exact), Dirichlet on
    the other four.  Exact u = cos cos cos: nonzero boundary values
    including the free edge where the two Robin faces meet."""
    pi = jnp.pi

    def u(x, y, z):
        return jnp.cos(pi * x) * jnp.cos(pi * y) * jnp.cos(pi * z)

    return Problem3D(
        name=f"robin_3d_alpha{alpha:g}",
        f=lambda x, y, z: (3.0 * pi**2 + 1.0) * u(x, y, z),
        g=u,
        c=1.0,
        bc_faces=("dirichlet", "robin", "dirichlet", "dirichlet",
                  "dirichlet", "robin"),
        g_natural=lambda x, y, z: alpha * u(x, y, z),
        robin_alpha=alpha,
        exact=u,
    )


_PROBLEMS_3D = {
    "poisson_3d": poisson_3d,
    "poisson_3d_inhomogeneous": poisson_3d_inhomogeneous,
    "helmholtz_3d": helmholtz_3d,
    "advection_diffusion_3d": advection_diffusion_3d,
    "variable_coeff_elliptic_3d": variable_coeff_elliptic_3d,
    "poisson_3d_neumann": poisson_3d_neumann,
    "robin_3d": robin_3d,
}


def get_problem_3d(name: str, **kwargs) -> Problem3D:
    """Registry lookup mirroring ``get_problem_2d`` for the 3D families."""
    try:
        return _PROBLEMS_3D[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown 3D problem {name!r}; available: "
            f"{sorted(_PROBLEMS_3D)}"
        ) from None


@dataclasses.dataclass(frozen=True)
class Solver3DConfig:
    nx: int = 8  # elements per dimension
    ny: int = 8
    nz: int = 8
    M: int = 4  # Legendre basis size per dimension (M^3 coefficients)
    gamma: float = 1.0e4  # kept for API parity; the LSE path is gamma-free
    n_colloc: int = 4  # collocation grid per dimension (C^3 PDE rows)
    cg_tol: Optional[float] = None  # None -> 100 * dtype eps (relative)
    cg_maxiter: int = 2000
    precond: str = "auto"  # 'auto' | 'jacobi' | 'mg' | 'shifted'
    backend: str = "auto"  # 'auto' | 'xla' | 'pallas' (enhancement stage)
    formulation: str = "primal"  # 'primal' | 'dual' (same QP; the dual
    # precompute factorises the augmented quasi-definite kernel system —
    # the 3D lift of Solver2DConfig.formulation; note the 3D dual system
    # is C^3+S = 120 > M^3 = 64 at the defaults, so unlike 1D it is never
    # the cheaper algebra — offered for API parity and as an independent
    # derivation of the same affine map)
    diagnostics: bool = True
    dtype: Optional[str] = None
    fem_dtype: Optional[str] = None  # 'float64': coarse stage in
    # (TPU-emulated) f64 — elementwise/reduction ops only, TPU-legal
    coarse: str = "q1"  # 'q1' (O(h^2) nodal) | 'compact' (tensor-Numerov
    # 27-point scheme A u = M f_nodal, O(h^4) nodal — constant
    # coefficients, b == 0, all-Dirichlet faces, uniform mesh; the 3D
    # analog of Solver2DConfig.coarse)
    trace_lift: int = 0  # 0: trilinear FEM element trace.  >= 2: tensor-
    # Lagrange interpolation of each surface point's grid PLANE with this
    # stencil width per axis (6 typical) — with coarse='compact' the
    # O(h^4) nodal values carry to an O(h^4) hybrid solution (3D analog
    # of the 2D ``trace_lift``; forces the XLA enhancement backend)

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


class Solution3D(NamedTuple):
    xs: jnp.ndarray  # [nx+1]
    ys: jnp.ndarray  # [ny+1]
    zs: jnp.ndarray  # [nz+1]
    fem_values: jnp.ndarray  # [nz+1, ny+1, nx+1]
    coeffs: jnp.ndarray  # [nz, ny, nx, M, M, M]  (kz, ky, kx ordering)
    cg_iters: jnp.ndarray
    cg_residual: jnp.ndarray
    max_slack: jnp.ndarray  # [nz, ny, nx]
    bc_violation: jnp.ndarray  # [nz, ny, nx]
    solve_ok: jnp.ndarray  # [nz, ny, nx]
    cond_estimate: jnp.ndarray = None


def _surface_coords(M: int):
    """Surface points of the M^3 tensor grid on [-1, 1]^3: exactly
    M^3 - (M-2)^3 points = dim of the tensor-polynomial trace space (see
    module docstring), ordered (tz, ty, tx) lexicographically."""
    tb = np.linspace(-1.0, 1.0, M)
    pts = []
    for iz, tz in enumerate(tb):
        for iy, ty in enumerate(tb):
            for ix, tx in enumerate(tb):
                on_surf = (
                    iz in (0, M - 1) or iy in (0, M - 1)
                    or ix in (0, M - 1)
                )
                if on_surf:
                    pts.append((tz, ty, tx))
    return np.array(pts)  # [M^3 - (M-2)^3, 3]


def _surface_indices(M: int):
    """(iz, iy, ix) integer indices of ``_surface_coords`` in the SAME
    order (lexicographic over the M^3 tensor grid, surface points only)."""
    idx = []
    for iz in range(M):
        for iy in range(M):
            for ix in range(M):
                if iz in (0, M - 1) or iy in (0, M - 1) or ix in (0, M - 1):
                    idx.append((iz, iy, ix))
    return idx


def _lifted_trace_3d(fem, M: int, nx: int, ny: int, nz: int,
                     stencil: int = 6):
    """[E, S] element surface-trace values from tensor-Lagrange
    interpolation of the nodal grid within each surface point's grid
    PLANE — replaces the O(h^2) trilinear trace that caps the 3D
    enhancement floor (the 3D lift of ``hybrid2d._lifted_trace_2d``;
    valid whenever the nodal values are high-order, e.g. the
    ``coarse='compact'`` scheme).

    Every surface point of the M^3 tensor grid lies in at least one grid
    plane of its element (z-faces first, then y-, then x- for shared
    edge/corner points — all equally O(h^stencil)-consistent choices);
    in-plane values come from two successive 1D lifts.  Row order matches
    ``_surface_coords``.
    """
    from .hybrid2d import _lift_weights

    dtype = fem.dtype
    tb = np.linspace(-1.0, 1.0, M)
    idxx, wx_np = _lift_weights(nx + 1, tb, stencil)
    idxy, wy_np = _lift_weights(ny + 1, tb, stencil)
    idxz, wz_np = _lift_weights(nz + 1, tb, stencil)
    wx = jnp.asarray(wx_np, dtype)
    wy = jnp.asarray(wy_np, dtype)
    wz = jnp.asarray(wz_np, dtype)
    # HIGHEST: bf16 MXU passes would put ~4e-4 on the trace (the 2D
    # lesson, RESULTS.md compact section).
    hi = jax.lax.Precision.HIGHEST
    # x-lift: [nz+1, ny+1, nx+1] -> Ax [nz+1, ny+1, nx, Mx]
    Ux = fem[:, :, idxx]
    Ax = jnp.einsum("bmj,cabj->cabm", wx, Ux, precision=hi)
    # y-lift of Ax -> Axy [nz+1, ny, nx, My, Mx] (z-face planes)
    Uxy = Ax[:, idxy]  # [nz+1, ny, S, nx, Mx]
    Axy = jnp.einsum("amj,cajbn->cabmn", wy, Uxy, precision=hi)
    # z-lift of Ax -> Axz [nz, ny+1, nx, Mz, Mx] (y-face planes)
    Uxz = Ax[idxz]  # [nz, S, ny+1, nx, Mx]
    Axz = jnp.einsum("cmj,cjabn->cabmn", wz, Uxz, precision=hi)
    # y-lift then z-lift of fem -> Ayz [nz, ny, nx+1, Mz, My] (x-faces)
    Uy = fem[:, idxy]  # [nz+1, ny, S, nx+1]
    Ay = jnp.einsum("amj,cajb->cabm", wy, Uy, precision=hi)
    Uyz = Ay[idxz]  # [nz, S, ny, nx+1, My]
    Ayz = jnp.einsum("cmj,cjabn->cabmn", wz, Uyz, precision=hi)
    lo_hi = (slice(0, -1), slice(1, None))
    cols = []
    for iz, iy, ix in _surface_indices(M):
        if iz in (0, M - 1):
            cols.append(Axy[lo_hi[iz == M - 1], :, :, iy, ix])
        elif iy in (0, M - 1):
            cols.append(Axz[:, lo_hi[iy == M - 1], :, iz, ix])
        else:
            cols.append(Ayz[:, :, lo_hi[ix == M - 1], iz, iy])
    rows = jnp.stack(cols, axis=-1)  # [nz, ny, nx, S]
    return rows.reshape(nz * ny * nx, -1)


class VarCoeff3DOperators(NamedTuple):
    """Shared host-f64 operator PARTS for 3D variable diffusion: the
    per-element collocation operator is the pointwise-weighted combination
    D_e = -a_e Lap - ax_e Gx - ay_e Gy - az_e Gz (+ Dconst), with the
    coefficient fields sampled per element (3D analog of
    ``VarCoeff2DOperators``)."""

    Lap: jnp.ndarray  # [C^3, M^3] positive: sx^2 V0V0V2 + sy^2 V0V2V0 + ...
    Gx: jnp.ndarray  # [C^3, M^3]  sx V0 (x) V0 (x) V1
    Gy: jnp.ndarray  # [C^3, M^3]  sy V0 (x) V1 (x) V0
    Gz: jnp.ndarray  # [C^3, M^3]  sz V1 (x) V0 (x) V0
    Dconst: jnp.ndarray  # [C^3, M^3]  bx Gx + by Gy + bz Gz + c Mass
    B: jnp.ndarray  # [S, M^3] shared trace rows
    Z: jnp.ndarray  # [M^3, (M-2)^3] null basis of B
    Pbc: jnp.ndarray  # [M^3, S] min-norm particular map


def prepare_shared_3d(problem: Problem3D, cfg: Solver3DConfig):
    """Host float64 precompute of the shared 3D operators -> the affine
    map (f, bc) -> w via the null-space LSE algebra; for
    variable-coefficient problems (``problem.a_var``), the shared operator
    PARTS + null-space basis instead (``VarCoeff3DOperators``).

    PDE collocation uses INTERIOR points only (3D analog of the 2D rule:
    on faces/edges/corners some second-derivative terms carry vanishing
    trace factors, polluting the least-squares fit)."""
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    hz = (z1 - z0) / cfg.nz
    M, C = cfg.M, cfg.n_colloc
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = legendre.vandermonde_host(t_int, M)
    sx, sy, sz = 2.0 / hx, 2.0 / hy, 2.0 / hz

    def t3(Az, Ay, Ax):
        # rows (iz, iy, ix) x cols (kz, ky, kx), both row-major
        return np.einsum("zk,yl,xm->zyxklm", Az, Ay, Ax).reshape(
            C * C * C, M * M * M
        )

    spts = _surface_coords(M)
    Vz_b = legendre.vandermonde_host(spts[:, 0], M)[0]  # [S, M]
    Vy_b = legendre.vandermonde_host(spts[:, 1], M)[0]
    Vx_b = legendre.vandermonde_host(spts[:, 2], M)[0]
    B = np.einsum("pk,pl,pm->pklm", Vz_b, Vy_b, Vx_b).reshape(
        -1, M * M * M
    )
    bx, by, bz = problem.b

    if problem.a_var is not None:
        dtype = cfg.jnp_dtype()
        Lap = (
            sx * sx * t3(V0, V0, V2)
            + sy * sy * t3(V0, V2, V0)
            + sz * sz * t3(V2, V0, V0)
        )
        Gx = sx * t3(V0, V0, V1)
        Gy = sy * t3(V0, V1, V0)
        Gz = sz * t3(V1, V0, V0)
        Mass = t3(V0, V0, V0)
        Dconst = bx * Gx + by * Gy + bz * Gz + problem.c * Mass
        Z, Pbc = kkt.nullspace_host(B)
        shared = VarCoeff3DOperators(
            Lap=jnp.asarray(Lap, dtype), Gx=jnp.asarray(Gx, dtype),
            Gy=jnp.asarray(Gy, dtype), Gz=jnp.asarray(Gz, dtype),
            Dconst=jnp.asarray(Dconst, dtype), B=jnp.asarray(B, dtype),
            Z=jnp.asarray(Z, dtype), Pbc=jnp.asarray(Pbc, dtype),
        )
        return shared, (jnp.asarray(t_int), jnp.asarray(spts))

    Dt = -problem.a0 * (
        sx * sx * t3(V0, V0, V2)
        + sy * sy * t3(V0, V2, V0)
        + sz * sz * t3(V2, V0, V0)
    )
    if bx != 0.0:
        Dt = Dt + bx * sx * t3(V0, V0, V1)
    if by != 0.0:
        Dt = Dt + by * sy * t3(V0, V1, V0)
    if bz != 0.0:
        Dt = Dt + bz * sz * t3(V1, V0, V0)
    if problem.c != 0.0:
        Dt = Dt + problem.c * t3(V0, V0, V0)

    if cfg.formulation == "dual":
        # Genuine dual algebra (the augmented quasi-definite kernel
        # system, factorised once in host f64) — same affine map, derived
        # independently; primal==dual asserted in tests/test_poisson3d.py.
        shared = kkt.precompute_shared_dual_host(Dt, B, cfg.gamma,
                                                 cfg.jnp_dtype())
    else:
        shared = kkt.precompute_shared_lse_host(Dt, B, cfg.jnp_dtype())
    return shared, (jnp.asarray(t_int), jnp.asarray(spts))


def _varcoeff_mg_levels_3d(problem: Problem3D, hx: float, hy: float,
                           hz: float, dtype, lvl_offset: int = 0,
                           c_override: float = None):
    """``apply_diag_for_level(lvl, shape)`` factory for
    ``multigrid.make_vcycle_3d`` with variable diffusion: exact per-level
    rediscretisation by re-sampling the coefficient callable at each
    level's own quadrature points (3D analog of
    ``hybrid2d._varcoeff_mg_levels``)."""
    x0d, y0d, z0d = (problem.domain[0], problem.domain[2],
                     problem.domain[4])
    bx, by, bz = problem.b
    c_eff = problem.c if c_override is None else c_override
    has_const = c_eff != 0.0 or bx != 0.0 or by != 0.0 or bz != 0.0

    def apply_diag_for_level(lvl, shape):
        s = float(2 ** (lvl + lvl_offset))
        Sq_l, dxq, dyq, dzq = assembly3d.q1_varcoeff_parts_3d(
            hx * s, hy * s, hz * s
        )
        Sq_l = jnp.asarray(Sq_l, dtype)
        xs_l = x0d + hx * s * jnp.arange(shape[2], dtype=dtype)
        ys_l = y0d + hy * s * jnp.arange(shape[1], dtype=dtype)
        zs_l = z0d + hz * s * jnp.arange(shape[0], dtype=dtype)
        am = assembly3d.coeff_maps_3d(xs_l, ys_l, zs_l, problem.a_var,
                                      dxq, dyq, dzq)
        Kc = None
        if has_const:
            Kc = jnp.asarray(
                assembly3d.q1_local_operator_3d(
                    hx * s, hy * s, hz * s, 0.0, c_eff, bx, by, bz
                ),
                dtype,
            )

        def apply_l(v):
            y = assembly3d.apply_stiffness_var_3d(v, Sq_l, am)
            if Kc is not None:
                y = y + assembly3d.apply_stiffness_3d(v, Kc)
            return y

        d = assembly3d.stiffness_var_diag_3d(shape, Sq_l, am, dtype)
        if Kc is not None:
            d = d + assembly3d.stiffness_diag_3d(shape, Kc, dtype)
        return apply_l, d

    return apply_diag_for_level


def _mass1d_apply(g, h):
    """Consistent P1 mass product along axis 0 of a 2D array (uniform
    spacing h): interior h/6·(g_{i-1} + 4 g_i + g_{i+1}), half-hat ends."""
    core = (g[:-2] + 4.0 * g[1:-1] + g[2:]) * (h / 6.0)
    e0 = ((2.0 * g[0] + g[1]) * (h / 6.0))[None]
    e1 = ((g[-2] + 2.0 * g[-1]) * (h / 6.0))[None]
    return jnp.concatenate([e0, core, e1], axis=0)


def _face_mass_apply(G, h0, h1):
    """Q1 face mass M(h0) ⊗ M(h1) applied to a [n0, n1] face field —
    the consistent integral of (Q1 interpolant of G)·hat along the face."""
    return _mass1d_apply(_mass1d_apply(G, h0).T, h1).T


def _mass1d_diag(n, h, dtype):
    d = jnp.full((n,), 4.0 * h / 6.0, dtype)
    return d.at[0].set(2.0 * h / 6.0).at[-1].set(2.0 * h / 6.0)


# Face slicing helpers, bc_faces order (xlo, xhi, ylo, yhi, zlo, zhi).
def _face_get(v, fc):
    return [v[:, :, 0], v[:, :, -1], v[:, 0, :], v[:, -1, :],
            v[0, :, :], v[-1, :, :]][fc]


def _face_add(arr, fc, vals):
    return [lambda: arr.at[:, :, 0].add(vals),
            lambda: arr.at[:, :, -1].add(vals),
            lambda: arr.at[:, 0, :].add(vals),
            lambda: arr.at[:, -1, :].add(vals),
            lambda: arr.at[0, :, :].add(vals),
            lambda: arr.at[-1, :, :].add(vals)][fc]()


def _face_set(arr, fc, vals):
    return [lambda: arr.at[:, :, 0].set(vals),
            lambda: arr.at[:, :, -1].set(vals),
            lambda: arr.at[:, 0, :].set(vals),
            lambda: arr.at[:, -1, :].set(vals),
            lambda: arr.at[0, :, :].set(vals),
            lambda: arr.at[-1, :, :].set(vals)][fc]()


def fem_solve_3d(problem: Problem3D, cfg: Solver3DConfig, xs, ys, zs):
    """Coarse Q1 nodal values on the hex grid via preconditioned CG
    (SPD) or BiCGStab (advection / indefinite Helmholtz)."""
    dtype = xs.dtype
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    hz = float((problem.domain[5] - problem.domain[4]) / cfg.nz)
    bx, by, bz = problem.b
    var = problem.a_var is not None
    compact = cfg.coarse == "compact"
    if compact:
        if var:
            raise ValueError(
                "coarse='compact' needs constant diffusion (a_var is "
                "set); use coarse='q1'")
        if bx != 0.0 or by != 0.0 or bz != 0.0:
            raise ValueError("coarse='compact' requires b == (0, 0, 0)")
        if any(t != "dirichlet" for t in problem.bc_faces):
            raise ValueError(
                "coarse='compact' requires all-Dirichlet faces (the "
                "Numerov rhs weighting assumes value-pinned boundaries)")

    def _local_op_np(hx_, hy_, hz_, c_):
        """Shared local 8x8 at spacing (hx_, hy_, hz_) — Q1 weak form or
        the tensor-Numerov compact operator (same 27-point sparsity, so
        the matrix-free/MG machinery below is scheme-agnostic)."""
        if compact:
            return assembly3d.q1_numerov_locals_3d(
                hx_, hy_, hz_, problem.a0, c_)[0]
        return assembly3d.q1_local_operator_3d(
            hx_, hy_, hz_, problem.a0, c_, bx, by, bz)

    if var:
        # Per-element stiffness K_e = sum_q a(x_q) S_q; constant
        # reaction/advection terms compose additively.
        Sq_np, dxq, dyq, dzq = assembly3d.q1_varcoeff_parts_3d(hx, hy, hz)
        Sq = jnp.asarray(Sq_np, dtype)
        a_maps = assembly3d.coeff_maps_3d(xs, ys, zs, problem.a_var,
                                          dxq, dyq, dzq)
        K_const = None
        if problem.c != 0.0 or bx != 0.0 or by != 0.0 or bz != 0.0:
            K_const = jnp.asarray(
                assembly3d.q1_local_operator_3d(hx, hy, hz, 0.0,
                                                problem.c, bx, by, bz),
                dtype,
            )

        def apply_op(v):
            y = assembly3d.apply_stiffness_var_3d(v, Sq, a_maps)
            if K_const is not None:
                y = y + assembly3d.apply_stiffness_3d(v, K_const)
            return y
    else:
        K_loc = jnp.asarray(_local_op_np(hx, hy, hz, problem.c), dtype)

        def apply_op(v):
            return assembly3d.apply_stiffness_3d(v, K_loc)

    spd = bx == 0.0 and by == 0.0 and bz == 0.0 and problem.c >= 0.0

    if compact:
        # Numerov-weighted load M f_nodal (nodal samples, not quadrature)
        # — the pair (A, M f) is what makes the scheme O(h^4).
        K_M = jnp.asarray(
            assembly3d.q1_numerov_locals_3d(hx, hy, hz, problem.a0,
                                            problem.c)[1], dtype)
        F_nodes = problem.f(xs[None, None, :], ys[None, :, None],
                            zs[:, None, None])
        F_nodes = F_nodes * jnp.ones(
            (zs.shape[0], ys.shape[0], xs.shape[0]), dtype)
        b = assembly3d.apply_stiffness_3d(F_nodes, K_M)
    else:
        b = assembly3d.assemble_load_3d(xs, ys, zs, problem.f)
    nz1, ny1, nx1 = zs.shape[0], ys.shape[0], xs.shape[0]
    bcs = problem.bc_faces
    mixed = any(t != "dirichlet" for t in bcs)
    robin_faces = []
    # per-face (h0, h1) spacings and node lengths of the [n0, n1] face grid
    face_h = ((hz, hy), (hz, hy), (hz, hx), (hz, hx), (hy, hx), (hy, hx))
    face_n = ((nz1, ny1), (nz1, ny1), (nz1, nx1), (nz1, nx1),
              (ny1, nx1), (ny1, nx1))
    if not mixed:
        interior = jnp.zeros((nz1, ny1, nx1), bool
                             ).at[1:-1, 1:-1, 1:-1].set(True)
    else:
        # Natural (Neumann/Robin) faces keep their boundary nodes as
        # unknowns; only Dirichlet faces are eliminated (edges/corners
        # shared with a Dirichlet face are Dirichlet).
        interior = jnp.ones((nz1, ny1, nx1), bool)
        for fc, t in enumerate(bcs):
            if t == "dirichlet":
                interior = _face_set(
                    interior, fc,
                    jnp.zeros(face_n[fc], bool))
        # Weak boundary term of -(a0 Lap u) on natural faces:
        # [a0 du/dn] v = (g_natural - robin_alpha u) v over the face.
        face_xyz = (
            (jnp.full((nz1, ny1), xs[0]), ys[None, :], zs[:, None]),
            (jnp.full((nz1, ny1), xs[-1]), ys[None, :], zs[:, None]),
            (xs[None, :], jnp.full((nz1, nx1), ys[0]), zs[:, None]),
            (xs[None, :], jnp.full((nz1, nx1), ys[-1]), zs[:, None]),
            (xs[None, :], ys[:, None], jnp.full((ny1, nx1), zs[0])),
            (xs[None, :], ys[:, None], jnp.full((ny1, nx1), zs[-1])),
        )
        for fc, t in enumerate(bcs):
            if t == "dirichlet":
                continue
            gx, gy, gz = face_xyz[fc]
            gv = problem.g_natural(gx, gy, gz) * jnp.ones(face_n[fc],
                                                          dtype)
            b = _face_add(b, fc, _face_mass_apply(gv, *face_h[fc]))
            if t == "robin":
                robin_faces.append(fc)
        if robin_faces:
            alpha = problem.robin_alpha
            base_apply = apply_op

            def apply_op(v):
                y = base_apply(v)
                for fc in robin_faces:
                    y = _face_add(
                        y, fc,
                        alpha * _face_mass_apply(_face_get(v, fc),
                                                 *face_h[fc]))
                return y
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    g_grid = problem.g(X, Y, Z) * jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, g_grid)

    def apply_free(v):
        return jnp.where(interior, apply_op(v * interior), 0.0)

    rhs = jnp.where(interior, b - apply_op(u_bc), 0.0)

    precond = cfg.precond
    if mixed:
        if precond == "shifted":
            raise ValueError(
                "precond='shifted' assumes all-Dirichlet faces; mixed-BC "
                "problems run with precond='mg'|'jacobi' (or 'auto')"
            )
        mg_ok3 = (cfg.nx % 2 == 0 and cfg.ny % 2 == 0 and cfg.nz % 2 == 0
                  and min(cfg.nx, cfg.ny, cfg.nz) >= 8
                  and problem.c >= 0.0 and not var)
        if precond == "auto":
            precond = "mg" if mg_ok3 else "jacobi"
        if precond == "mg":
            if not mg_ok3:
                raise ValueError(
                    "mixed-BC 'mg' needs even >= 8 grids, c >= 0 and "
                    "constant coefficients; use precond='jacobi'"
                )
            # Composite preconditioner: all-Dirichlet V-cycle on the
            # inner subspace + Jacobi on natural-face unknowns (the 3D
            # analog of the 2D mixed-BC 'mg' route).
            from ..ops import multigrid

            inner = jnp.zeros((nz1, ny1, nx1), bool
                              ).at[1:-1, 1:-1, 1:-1].set(True)
            diag_m = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K_loc,
                                                  dtype)
            for fc in robin_faces:
                n0, n1 = face_n[fc]
                h0, h1 = face_h[fc]
                diag_m = _face_add(
                    diag_m, fc,
                    problem.robin_alpha * jnp.outer(
                        _mass1d_diag(n0, h0, dtype),
                        _mass1d_diag(n1, h1, dtype)))
            vcyc = multigrid.make_vcycle_3d(nz1, ny1, nx1, K_loc, dtype)

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
        mg_ok = (
            cfg.nx % 2 == 0 and cfg.ny % 2 == 0 and cfg.nz % 2 == 0
            and min(cfg.nx, cfg.ny, cfg.nz) >= 8
        )
        if mg_ok:
            precond = "mg" if problem.c >= 0.0 else "shifted"
        else:
            precond = "jacobi"
    if precond in ("mg", "shifted"):
        from ..ops import multigrid

        c_eff = abs(problem.c) if precond == "shifted" else problem.c

        if var:
            # Exact rediscretisation per level: re-sample the coefficient
            # callable at each level's own quadrature points (ignoring
            # a_var here would silently degrade preconditioner quality
            # for heterogeneous media — the 2D lesson, ADVICE.md r2).
            M_inv = multigrid.make_vcycle_3d(
                nz1, ny1, nx1, None, dtype,
                apply_diag_for_level=_varcoeff_mg_levels_3d(
                    problem, hx, hy, hz, dtype,
                    c_override=(abs(problem.c) if precond == "shifted"
                                else None),
                ),
            )
        else:
            def loc_for_level(lvl):
                s = float(2 ** lvl)
                return jnp.asarray(
                    _local_op_np(hx * s, hy * s, hz * s, c_eff), dtype)

            M_inv = multigrid.make_vcycle_3d(
                nz1, ny1, nx1, loc_for_level(0), dtype,
                loc_for_level=loc_for_level,
            )
    else:
        if var:
            diag = assembly3d.stiffness_var_diag_3d(
                (nz1, ny1, nx1), Sq, a_maps, dtype
            )
            if K_const is not None:
                diag = diag + assembly3d.stiffness_diag_3d(
                    (nz1, ny1, nx1), K_const, dtype
                )
        else:
            diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K_loc,
                                                dtype)
        for fc in robin_faces:
            n0, n1 = face_n[fc]
            h0, h1 = face_h[fc]
            diag = _face_add(
                diag, fc,
                problem.robin_alpha * jnp.outer(
                    _mass1d_diag(n0, h0, dtype),
                    _mass1d_diag(n1, h1, dtype)))
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter)
    u = u_bc + jnp.where(interior, res.x, 0.0)
    return u, res


def _element_data_3d(problem: Problem3D, cfg: Solver3DConfig, xs, ys, zs,
                     fem_values, t_int, spts, layer_offset=0,
                     row_offset=0, trace_lift: int = 0,
                     skip_f: bool = False, trace_rows=None):
    """Per-element collocation rhs [E, C^3] and boundary-trace values
    [E, S]: the FEM trilinear trace at the surface points, overridden by g
    on domain-boundary faces (the 3D lift of ``_element_data_2d``).

    ``zs``/``fem_values`` may be a local z-slab (``parallel/sharded3d``);
    ``layer_offset`` is then the slab's global first element layer
    (possibly traced), used for the domain-boundary face masks.  For
    2-axis (z, y) block sharding ``ys`` is likewise a local slice and
    ``row_offset`` its global first element row.

    ``trace_lift >= 2`` replaces the trilinear trace with the tensor-
    Lagrange plane lift (``_lifted_trace_3d``; full-grid callers only —
    the lift windows need whole grid planes).  Sharded slab callers pass
    ``trace_rows`` instead: precomputed [nz_loc, ny, nx, S] trace values
    (computed on the gathered full grid so the lift windows are global,
    then sliced per slab — ``parallel.sharded3d``).  Domain-boundary
    points still take g exactly in all cases."""
    dtype = xs.dtype
    C = cfg.n_colloc
    nx, ny = xs.shape[0] - 1, ys.shape[0] - 1
    nz = zs.shape[0] - 1
    E = nx * ny * nz
    t = jnp.asarray(t_int, dtype)
    # Per-element spacings [n]: identical values on a uniform mesh, and
    # the same expressions serve the graded path (``hybrid3d_graded``).
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    xq = xs[:-1][:, None] + 0.5 * hx[:, None] * (t[None, :] + 1.0)
    yq = ys[:-1][:, None] + 0.5 * hy[:, None] * (t[None, :] + 1.0)
    zq = zs[:-1][:, None] + 0.5 * hz[:, None] * (t[None, :] + 1.0)
    # f built DIRECTLY on [nz, ny, nx, Cz, Cy, Cx] — rows (iz, iy, ix)
    # row-major, cols (cz, cy, cx) row-major, matching prepare_shared_3d's
    # t3 order.  (An earlier [nz, Cz, ny, Cy, nx, Cx] layout + 6-D
    # transpose cost ~0.4 ms of the 1.0 ms enhancement step at 64^3 —
    # the transpose is a full relayout pass over the [E, C^3] array.)
    if skip_f:
        # Trace-only callers (the elastodynamics marches' per-step
        # ``traces()``) skip the body-force collocation rows.
        f_rows = None
    else:
        F = problem.f(
            xq[None, None, :, None, None, :],
            yq[None, :, None, None, :, None],
            zq[:, None, None, :, None, None],
        )
        F = F * jnp.ones((nz, ny, nx, C, C, C), dtype)
        f_rows = F.reshape(E, C * C * C)

    # 8 corner values, a = 4cz + 2cy + cx (assembly3d order)
    cs = assembly3d._corners_3d(fem_values)
    tzp = jnp.asarray(spts[:, 0], dtype)  # [S]
    typ = jnp.asarray(spts[:, 1], dtype)
    txp = jnp.asarray(spts[:, 2], dtype)
    w1 = ((1 - txp), (1 + txp))
    w2 = ((1 - typ), (1 + typ))
    w3 = ((1 - tzp), (1 + tzp))
    if trace_rows is not None:
        trace = trace_rows  # [nz, ny, nx, S] precomputed (global windows)
    elif trace_lift >= 2:
        trace = _lifted_trace_3d(
            fem_values, cfg.M, nx, ny, nz, stencil=trace_lift
        ).reshape(nz, ny, nx, -1)  # [nz, ny, nx, S] (spts order)
    else:
        trace = 0.0
        a = 0
        for cz in range(2):
            for cy in range(2):
                for cx in range(2):
                    N = 0.125 * w3[cz] * w2[cy] * w1[cx]  # [S]
                    trace = trace + cs[a][..., None] * N
                    a += 1
        # trace: [nz, ny, nx, S]

    # Domain-boundary override: surface points on faces of boundary
    # elements take g exactly.
    ex = jnp.arange(nx)
    ey = row_offset + jnp.arange(ny)  # GLOBAL element rows
    ez = layer_offset + jnp.arange(nz)  # GLOBAL element layers
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    zm = 0.5 * (zs[1:] + zs[:-1])
    xp = (xm[:, None] + 0.5 * hx[:, None] * txp[None, :])[None, None, :, :]
    yp = (ym[:, None] + 0.5 * hy[:, None] * typ[None, :])[None, :, None, :]
    zp = (zm[:, None] + 0.5 * hz[:, None] * tzp[None, :])[:, None, None, :]
    # Natural (Neumann/Robin) faces keep the FEM trilinear trace — no
    # exact boundary VALUE exists there (bc types are static strings).
    on_face = (
        (ex[None, None, :, None] == 0) & (txp == -1.0),
        (ex[None, None, :, None] == cfg.nx - 1) & (txp == 1.0),
        (ey[None, :, None, None] == 0) & (typ == -1.0),
        (ey[None, :, None, None] == cfg.ny - 1) & (typ == 1.0),
        (ez[:, None, None, None] == 0) & (tzp == -1.0),
        (ez[:, None, None, None] == cfg.nz - 1) & (tzp == 1.0),
    )
    on_bdry = functools.reduce(
        jnp.logical_or,
        [m for m, t in zip(on_face, problem.bc_faces) if t == "dirichlet"],
        jnp.zeros_like(on_face[0]),
    )
    gvals = problem.g(xp, yp, zp) * jnp.ones_like(trace)
    bc_rows = jnp.where(on_bdry, gvals, trace)
    return f_rows, bc_rows.reshape(E, -1), cs


def _pallas_solve_ok_3d(slack, bcv, corners):
    """Per-element acceptance gate for the fused-kernel path: tolerance
    scales with the boundary-data magnitude (the 8 corner values bound the
    trilinear trace), NOT with the violation itself — same rationale as
    ``hybrid2d._pallas_solve_ok``."""
    finite = jnp.isfinite(slack) & jnp.isfinite(bcv)
    mags = [jnp.abs(c).reshape(bcv.shape) for c in corners]
    scale = 1.0 + functools.reduce(jnp.maximum, mags)
    return finite & (bcv <= 1e-2 * scale)


def _varcoeff_element_operators_3d(problem: Problem3D,
                                   cfg: Solver3DConfig, xs, ys, zs,
                                   vb: VarCoeff3DOperators, t_int):
    """Batched per-element collocation operators D [E, C^3, M^3]: sample
    the coefficient fields (a, da/dx, da/dy, da/dz) at each element's
    collocation grid and combine the shared host-f64 parts (3D analog of
    ``hybrid2d._varcoeff_element_operators``).  grad_a analytic when
    supplied, else derived by ``jax.grad``.  Element counts come from the
    node arrays, so a sharded caller can pass its local z-slab."""
    dtype = xs.dtype
    nx_l = xs.shape[0] - 1
    ny_l = ys.shape[0] - 1
    nz_l = zs.shape[0] - 1
    E = nx_l * ny_l * nz_l
    C = cfg.n_colloc
    t = jnp.asarray(t_int, dtype)
    hx = xs[1:] - xs[:-1]
    hy = ys[1:] - ys[:-1]
    hz = zs[1:] - zs[:-1]
    xq = xs[:-1][:, None] + 0.5 * hx[:, None] * (t[None, :] + 1.0)
    yq = ys[:-1][:, None] + 0.5 * hy[:, None] * (t[None, :] + 1.0)
    zq = zs[:-1][:, None] + 0.5 * hz[:, None] * (t[None, :] + 1.0)

    def samp(fn):
        # [nz, ny, nx, Cz, Cy, Cx] -> rows (iz, iy, ix), cols (cz, cy,
        # cx), both row-major, matching prepare_shared_3d's t3 order.
        v = fn(
            xq[None, None, :, None, None, :],
            yq[None, :, None, None, :, None],
            zq[:, None, None, :, None, None],
        )
        v = v * jnp.ones((nz_l, ny_l, nx_l, C, C, C), dtype)
        return v.reshape(E, C * C * C)

    if problem.grad_a is not None:
        ax_fn, ay_fn, az_fn = problem.grad_a
    else:  # derive the chain-rule coefficients by AD
        ax_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=0))
        ay_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=1))
        az_fn = jnp.vectorize(jax.grad(problem.a_var, argnums=2))
    a_e = samp(problem.a_var)
    ax_e = samp(ax_fn)
    ay_e = samp(ay_fn)
    az_e = samp(az_fn)
    return (
        -a_e[..., None] * vb.Lap
        - ax_e[..., None] * vb.Gx
        - ay_e[..., None] * vb.Gy
        - az_e[..., None] * vb.Gz
        + vb.Dconst
    )


def _trilinear_fallback_coeffs(cs, M):
    """Tensor-Legendre coefficients of the Q1 trilinear interpolant — the
    3D analog of the reference's linear fallback (``:171-176``).  Corner
    order a = 4cz + 2cy + cx; P0 = 1, P1 = t, so the interpolant expands
    over products of (1 +/- t)/2 per axis."""
    nz, ny, nx = cs[0].shape
    c = jnp.zeros((nz, ny, nx, M, M, M), cs[0].dtype)
    # u = sum_a u_a prod_axis (1 + s_axis t_axis)/2, s = -1 or +1
    for a in range(8):
        szn = 1.0 if (a >> 2) & 1 else -1.0
        syn = 1.0 if (a >> 1) & 1 else -1.0
        sxn = 1.0 if a & 1 else -1.0
        ua = 0.125 * cs[a]
        c = c.at[:, :, :, 0, 0, 0].add(ua)
        c = c.at[:, :, :, 0, 0, 1].add(ua * sxn)
        c = c.at[:, :, :, 0, 1, 0].add(ua * syn)
        c = c.at[:, :, :, 1, 0, 0].add(ua * szn)
        c = c.at[:, :, :, 0, 1, 1].add(ua * syn * sxn)
        c = c.at[:, :, :, 1, 0, 1].add(ua * szn * sxn)
        c = c.at[:, :, :, 1, 1, 0].add(ua * szn * syn)
        c = c.at[:, :, :, 1, 1, 1].add(ua * szn * syn * sxn)
    return c


def enhance_3d(problem: Problem3D, cfg: Solver3DConfig, xs, ys, zs,
               fem_values, shared_bundle, bc_rows_override=None):
    """Enhancement stage in isolation: per-element tensor-Legendre fit of
    the operator against arbitrary nodal trace data (the second half of
    ``hybrid_solve_3d``, reusable by the eigenvalue family where the trace
    is a FEM eigenvector rather than a source-problem solve — the 3D
    mirror of ``hybrid2d.enhance_2d``).

    ``bc_rows_override``: [E, S] surface-trace values replacing the FEM
    trilinear trace (e.g. the eigen family's plane-lifted traces,
    ``_lifted_trace_3d``); forces the XLA path."""
    shared, (t_int, spts) = shared_bundle
    dtype = cfg.jnp_dtype()
    E = cfg.nx * cfg.ny * cfg.nz
    # Lifted traces are computed on the host-XLA path; the fused Pallas
    # kernel builds the trilinear trace in-kernel.
    use_lift = bc_rows_override is None and cfg.trace_lift >= 2
    backend = (cfg.backend
               if bc_rows_override is None and not use_lift else "xla")
    if backend == "auto":
        from ..ops import pallas_kernels as pk

        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and problem.a_var is None
            and pk.pick_tile(E, 8192) >= 128
            and dtype == jnp.float32
            else "xla"
        )
    if backend == "pallas" and problem.a_var is None:
        from ..ops import pallas_kernels as pk

        x0f, x1f, y0f, y1f, z0f, z1f = problem.domain
        hx = (x1f - x0f) / cfg.nx
        hy = (y1f - y0f) / cfg.ny
        hz = (z1f - z0f) / cfg.nz
        w, slack, bcv = pk.fused_enhance_stacked_3d(
            fem_values, shared, problem.f, problem.g,
            (x0f, hx, y0f, hy, z0f, hz), cfg.nx, cfg.ny, cfg.nz,
            t_int, spts, tile=pk.pick_tile(E, 8192),
            with_diagnostics=cfg.diagnostics,
            f_shifted_fn=problem.f_shifted,
        )
        cs = assembly3d._corners_3d(fem_values)
        if cfg.diagnostics:
            ok_flat = _pallas_solve_ok_3d(slack, bcv, cs)
            diags = kkt.KKTDiagnostics(slack, bcv, ok_flat)
        else:
            zeros = jnp.zeros((E,), w.dtype)
            diags = kkt.KKTDiagnostics(
                zeros, zeros, jnp.all(jnp.isfinite(w), axis=-1)
            )
    else:
        f_rows, bc_rows, cs = _element_data_3d(
            problem, cfg, xs, ys, zs, fem_values, t_int, spts,
            trace_lift=cfg.trace_lift if use_lift else 0,
        )
        if bc_rows_override is not None:
            bc_rows = bc_rows_override
        if problem.a_var is not None:
            # Per-element operators from the shared parts + batched
            # null-space QR (the 2D variable-coefficient route lifted).
            vb: VarCoeff3DOperators = shared
            D = _varcoeff_element_operators_3d(problem, cfg, xs, ys, zs,
                                               vb, t_int)
            w, diags = kkt.solve_batched(
                D, vb.B, f_rows, bc_rows, cfg.gamma,
                formulation=cfg.formulation, ZP=(vb.Z, vb.Pbc),
            )
        else:
            w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
    M = cfg.M
    shp = (cfg.nz, cfg.ny, cfg.nx)
    coeffs = w.reshape(*shp, M, M, M)
    fb = _trilinear_fallback_coeffs(cs, M)
    ok = diags.solve_ok.reshape(shp)
    coeffs = jnp.where(
        ok[..., None, None, None],
        jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
    )
    cond = (diags.cond_estimate if problem.a_var is not None
            else shared.cond)
    return coeffs, kkt.KKTDiagnostics(
        diags.max_slack, diags.bc_violation, ok.reshape(-1)), cond


@functools.partial(jax.jit, static_argnums=(0, 1))
def hybrid_solve_3d(problem: Problem3D, cfg: Solver3DConfig,
                    shared_bundle) -> Solution3D:
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)

    if cfg.fem_dtype is not None:
        from ..utils.checks import require_x64

        require_x64(cfg.fem_dtype, "Solver3DConfig.fem_dtype")
        fd = jnp.dtype(cfg.fem_dtype)
        fem_values, cg_res = fem_solve_3d(
            problem, cfg, xs.astype(fd), ys.astype(fd), zs.astype(fd)
        )
        fem_values = fem_values.astype(dtype)
    else:
        fem_values, cg_res = fem_solve_3d(problem, cfg, xs, ys, zs)

    coeffs, diags, cond = enhance_3d(problem, cfg, xs, ys, zs, fem_values,
                                     shared_bundle)
    shp = (cfg.nz, cfg.ny, cfg.nx)
    return Solution3D(
        xs=xs, ys=ys, zs=zs, fem_values=fem_values, coeffs=coeffs,
        cg_iters=cg_res.iters, cg_residual=cg_res.residual,
        max_slack=diags.max_slack.reshape(shp),
        bc_violation=diags.bc_violation.reshape(shp),
        solve_ok=diags.solve_ok.reshape(shp),
        cond_estimate=cond,
    )


def evaluate_3d(sol: Solution3D, x, y, z):
    """u(x, y, z) at query points [P] — O(1) uniform-grid lookup + batched
    tensor-Legendre contraction (3D analog of ``evaluate_2d``; clamps
    outside the domain like the reference ``:198-209``)."""
    xs, ys, zs = sol.xs, sol.ys, sol.zs
    nx, ny, nz = xs.shape[0] - 1, ys.shape[0] - 1, zs.shape[0] - 1
    hx, hy, hz = xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]
    ix = jnp.clip(jnp.floor((x - xs[0]) / hx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(jnp.floor((y - ys[0]) / hy).astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(jnp.floor((z - zs[0]) / hz).astype(jnp.int32), 0, nz - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy
    tz = (2.0 * z - zs[iz] - zs[iz + 1]) / hz
    M = sol.coeffs.shape[-1]
    (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)  # [P, M]
    (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
    (Vz,) = legendre.legendre_vandermonde(tz, M, num_derivs=0)
    W = sol.coeffs[iz, iy, ix]  # [P, M(kz), M(ky), M(kx)]
    return jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx,
                      precision=jax.lax.Precision.HIGHEST)


def evaluate_3d_gradient(sol: Solution3D, x, y, z):
    """(du/dx, du/dy, du/dz) at query points [P] — derivative Vandermonde
    per axis with chain factors 2/h."""
    xs, ys, zs = sol.xs, sol.ys, sol.zs
    nx, ny, nz = xs.shape[0] - 1, ys.shape[0] - 1, zs.shape[0] - 1
    hx, hy, hz = xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]
    ix = jnp.clip(jnp.floor((x - xs[0]) / hx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(jnp.floor((y - ys[0]) / hy).astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(jnp.floor((z - zs[0]) / hz).astype(jnp.int32), 0, nz - 1)
    tx = (2.0 * x - xs[ix] - xs[ix + 1]) / hx
    ty = (2.0 * y - ys[iy] - ys[iy + 1]) / hy
    tz = (2.0 * z - zs[iz] - zs[iz + 1]) / hz
    M = sol.coeffs.shape[-1]
    Vx, Vx1 = legendre.legendre_vandermonde(tx, M, num_derivs=1)
    Vy, Vy1 = legendre.legendre_vandermonde(ty, M, num_derivs=1)
    Vz, Vz1 = legendre.legendre_vandermonde(tz, M, num_derivs=1)
    W = sol.coeffs[iz, iy, ix]
    hi = jax.lax.Precision.HIGHEST
    ux = (2.0 / hx) * jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx1,
                                 precision=hi)
    uy = (2.0 / hy) * jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy1, Vx,
                                 precision=hi)
    uz = (2.0 / hz) * jnp.einsum("pk,pklm,pl,pm->p", Vz1, W, Vy, Vx,
                                 precision=hi)
    return ux, uy, uz


class HybridSolver3D:
    """Facade mirroring the 1D/2D API for structured-hex 3D problems."""

    def __init__(self, problem: Problem3D,
                 config: Solver3DConfig = Solver3DConfig()):
        self.problem = problem
        self.config = config
        self._shared = prepare_shared_3d(problem, config)
        self.solution: Optional[Solution3D] = None

    def solve(self) -> Solution3D:
        self.solution = hybrid_solve_3d(self.problem, self.config,
                                        self._shared)
        return self.solution

    def evaluate_solution(self, x, y, z):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_3d(self.solution, jnp.asarray(x, dtype),
                           jnp.asarray(y, dtype), jnp.asarray(z, dtype))

    def evaluate_gradient(self, x, y, z):
        assert self.solution is not None
        dtype = self.solution.xs.dtype
        return evaluate_3d_gradient(
            self.solution, jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype),
        )

    def errors(self, x, y, z):
        from ..utils import metrics

        u = self.evaluate_solution(x, y, z)
        dtype = u.dtype
        ue = self.problem.exact(
            jnp.asarray(x, dtype), jnp.asarray(y, dtype),
            jnp.asarray(z, dtype),
        )
        return metrics.linf_error(u, ue), metrics.l2_error(u, ue)
