"""Fourth-order (biharmonic) 1D problems by hybrid-solver composition.

u'''' = f on (x0, x1) with simply-supported ends (u = u'' = 0) splits
EXACTLY into two Poisson problems: v = u'' solves -v'' = -f with
v(ends) = 0, then -u'' = -v with u(ends) = 0.  The framework's
composability makes the second solve spectral in the first: its rhs is
the ENHANCED v (per-element Legendre polynomials evaluated inside the
traced pipeline), not a nodal interpolant — so the final u rides the
hybrid floor of the v-solve instead of an O(h^2) rhs-interpolation
floor.  This extends the operator coverage beyond second order with
zero new kernels (reference scope: second-order 1D only,
``Hybrid-FEM-LSSVR.py:8-18``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from ..ops import eval as ev
from .hybrid import HybridSolver, Solution, SolverConfig
from .problem import Problem1D


@dataclasses.dataclass(frozen=True)
class BiharmonicProblem1D:
    """u'''' = f, simply supported (u = u'' = 0 at both ends)."""

    name: str
    f: Callable
    domain: tuple = (-1.0, 1.0)
    exact: Optional[Callable] = None
    exact_d2: Optional[Callable] = None  # u'' (the v-solve oracle)


def sin_biharmonic_1d() -> BiharmonicProblem1D:
    """u'''' = pi^4 sin(pi x), exact u = sin(pi x)."""
    pi = jnp.pi
    return BiharmonicProblem1D(
        name="sin_biharmonic_1d",
        f=lambda x: pi ** 4 * jnp.sin(pi * x),
        exact=lambda x: jnp.sin(pi * x),
        exact_d2=lambda x: -pi ** 2 * jnp.sin(pi * x),
    )


class BiharmonicSolution(NamedTuple):
    u: Solution  # displacement hybrid solution
    v: Solution  # moment (u'') hybrid solution


def solve_biharmonic_1d(problem: BiharmonicProblem1D,
                        cfg: SolverConfig) -> BiharmonicSolution:
    """Two chained hybrid solves (docstring above); evaluate the
    displacement with ``ops.eval.evaluate(sol.u.nodes, sol.u.coeffs, x)``
    and the moment from ``sol.v`` likewise."""
    f = problem.f
    pv = Problem1D(
        name=f"{problem.name}:moment",
        f=lambda x: -f(x),
        domain=problem.domain,
        exact=problem.exact_d2,
    )
    sv = HybridSolver(pv, cfg)
    sol_v = sv.solve()
    nodes, wv = sol_v.nodes, sol_v.coeffs

    pu = Problem1D(
        name=f"{problem.name}:displacement",
        # rhs = -v_h read from the enhanced polynomials (traced
        # searchsorted + Legendre eval — spectral, not a nodal
        # interpolant)
        f=lambda x: -ev.evaluate(nodes, wv, x),
        domain=problem.domain,
        exact=problem.exact,
    )
    sol_u = HybridSolver(pu, cfg).solve()
    return BiharmonicSolution(u=sol_u, v=sol_v)


# --------------------------------------------------------------------- 2D
#
# Simply-supported plate: Lap^2 u = f on a rectangle with u = Lap u = 0
# on the boundary splits exactly the same way (v = Lap u: -Lap v = -f,
# v = 0; then -Lap u = -v).  The second solve's rhs reads the first's
# tensor-Legendre polynomials pointwise; with
# Solver2DConfig(coarse="compact", trace_lift=6) BOTH stages run at
# O(h^4), giving a fourth-order fourth-ORDER-equation solver on the
# second-order machinery.  The u-stage forces backend="xla": its rhs is
# a traced searchsorted evaluation, which cannot run inside the fused
# Pallas kernels.

from .hybrid2d import (HybridSolver2D, Problem2D,  # noqa: E402
                       Solution2D, Solver2DConfig, evaluate_2d)


@dataclasses.dataclass(frozen=True)
class BiharmonicProblem2D:
    """Lap^2 u = f, simply supported (u = Lap u = 0 on the boundary)."""

    name: str
    f: Callable
    domain: tuple = (-1.0, 1.0, -1.0, 1.0)
    exact: Optional[Callable] = None
    exact_lap: Optional[Callable] = None


def sin_biharmonic_2d() -> BiharmonicProblem2D:
    """Lap^2 u = 4 pi^4 sin sin, exact u = sin(pi x) sin(pi y)."""
    pi = jnp.pi
    ss = lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y)  # noqa: E731
    return BiharmonicProblem2D(
        name="sin_biharmonic_2d",
        f=lambda x, y: 4.0 * pi ** 4 * ss(x, y),
        exact=ss,
        exact_lap=lambda x, y: -2.0 * pi ** 2 * ss(x, y),
    )


class BiharmonicSolution2D(NamedTuple):
    u: Solution2D
    v: Solution2D


def solve_biharmonic_2d(problem: BiharmonicProblem2D,
                        cfg: Solver2DConfig) -> BiharmonicSolution2D:
    """Two chained 2D hybrid solves (section comment above)."""
    f = problem.f
    zero = lambda x, y: jnp.zeros_like(x + y)  # noqa: E731
    pv = Problem2D(
        name=f"{problem.name}:moment",
        f=lambda x, y: -f(x, y),
        g=zero,
        domain=problem.domain,
        exact=problem.exact_lap,
    )
    sol_v = HybridSolver2D(pv, cfg).solve()

    pu = Problem2D(
        name=f"{problem.name}:displacement",
        f=lambda x, y: -evaluate_2d(sol_v, jnp.ravel(x * jnp.ones_like(
            x + y)), jnp.ravel(y * jnp.ones_like(x + y))).reshape(
                jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))),
        g=zero,
        domain=problem.domain,
        exact=problem.exact,
    )
    cfg_u = dataclasses.replace(cfg, backend="xla")
    sol_u = HybridSolver2D(pu, cfg_u).solve()
    return BiharmonicSolution2D(u=sol_u, v=sol_v)


# --------------------------------------------------------------------- 3D
#
# Same exact splitting on a box: v = Lap u solves -Lap v = -f with v = 0
# on the boundary, then -Lap u = -v with u = 0 (simply-supported box,
# u = Lap u = 0).  The u-stage rhs reads the v-stage tensor-Legendre
# polynomials through ``evaluate_3d``; with
# Solver3DConfig(coarse="compact", trace_lift=6) both stages run at
# O(h^4) — the tensor lift of the 2D plate chain above.

from .hybrid3d import (HybridSolver3D, Problem3D,  # noqa: E402
                       Solution3D, Solver3DConfig, evaluate_3d)


@dataclasses.dataclass(frozen=True)
class BiharmonicProblem3D:
    """Lap^2 u = f on a box, simply supported (u = Lap u = 0)."""

    name: str
    f: Callable
    domain: tuple = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
    exact: Optional[Callable] = None
    exact_lap: Optional[Callable] = None


def sin_biharmonic_3d() -> BiharmonicProblem3D:
    """Lap^2 u = 9 pi^4 sin sin sin, exact u = prod sin(pi .)."""
    pi = jnp.pi
    sss = lambda x, y, z: (jnp.sin(pi * x) * jnp.sin(pi * y)  # noqa: E731
                           * jnp.sin(pi * z))
    return BiharmonicProblem3D(
        name="sin_biharmonic_3d",
        f=lambda x, y, z: 9.0 * pi ** 4 * sss(x, y, z),
        exact=sss,
        exact_lap=lambda x, y, z: -3.0 * pi ** 2 * sss(x, y, z),
    )


class BiharmonicSolution3D(NamedTuple):
    u: Solution3D
    v: Solution3D


def solve_biharmonic_3d(problem: BiharmonicProblem3D,
                        cfg: Solver3DConfig) -> BiharmonicSolution3D:
    """Two chained 3D hybrid solves (section comment above)."""
    f = problem.f
    zero = lambda x, y, z: jnp.zeros_like(x + y + z)  # noqa: E731
    pv = Problem3D(
        name=f"{problem.name}:moment",
        f=lambda x, y, z: -f(x, y, z),
        g=zero,
        domain=problem.domain,
        exact=problem.exact_lap,
    )
    sol_v = HybridSolver3D(pv, cfg).solve()

    def rhs_u(x, y, z):
        shp = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y),
                                   jnp.shape(z))
        ones = jnp.ones(shp, dtype=sol_v.xs.dtype)
        vals = evaluate_3d(sol_v, jnp.ravel(x * ones),
                           jnp.ravel(y * ones), jnp.ravel(z * ones))
        return -vals.reshape(shp)

    pu = Problem3D(
        name=f"{problem.name}:displacement",
        f=rhs_u,
        g=zero,
        domain=problem.domain,
        exact=problem.exact,
    )
    cfg_u = dataclasses.replace(cfg, backend="xla")
    sol_u = HybridSolver3D(pu, cfg_u).solve()
    return BiharmonicSolution3D(u=sol_u, v=sol_v)


# ------------------------------------------------------------- clamped 1D
#
# The Poisson-Poisson splitting above requires u = Lap u = 0 (simply
# supported) and CANNOT represent the clamped beam u = u' = 0 — the
# standard hard case for fourth-order problems.  The clamped solver is
# DIRECT: a C^1 Hermite-cubic FEM coarse stage (2 dofs per node: value +
# slope, block-tridiagonal 2x2 system solved by
# ``ops.tridiag.block_thomas_2x2``) followed by the ordinary null-space
# LSE enhancement with a fourth-derivative collocation operator
# D = (2/h)^4 V4 and FOUR boundary rows per element (values AND slopes at
# both ends) — B gains derivative rows; the LSE algebra is unchanged.
#
# Why this hits the hybrid floor: the 1D biharmonic Green's function
# G(x_i, .) at a NODE is itself a C^1 piecewise cubic, i.e. a member of
# the Hermite trial space — so (exact quadrature) the Hermite FEM nodal
# values AND slopes are exact, the same superconvergence that makes the
# P1 coarse stage exact for the second-order family.  The enhanced
# element polynomials then fit u'''' = f against exact C^1 trace data:
# the error is pure collocation-fit truncation, spectral in M (measured
# M=10 f64: 2.2e-10 at E=8, 2.9e-13 at E=16, 1.6e-13 at E=24, with nodal
# values 1e-12..1e-15 — the fourth-order analog of the second-order
# family's floor).

import numpy as np  # noqa: E402

import jax  # noqa: E402

from ..ops import kkt, tridiag  # noqa: E402


@dataclasses.dataclass(frozen=True)
class ClampedBiharmonicProblem1D:
    """u'''' = f on (x0, x1), clamped: u = g, u' = gp at both ends."""

    name: str
    f: Callable
    g: tuple = (0.0, 0.0)  # (u(x0), u(x1))
    gp: tuple = (0.0, 0.0)  # (u'(x0), u'(x1))
    domain: tuple = (-1.0, 1.0)
    exact: Optional[Callable] = None
    exact_d1: Optional[Callable] = None


def clamped_sin2_1d() -> ClampedBiharmonicProblem1D:
    """u = sin^2(pi x) = (1 - cos(2 pi x))/2: homogeneous clamped data
    (u = u' = 0 at both ends of [-1, 1]); u'''' = -(2 pi)^4 cos(2 pi x)/2."""
    pi = jnp.pi
    return ClampedBiharmonicProblem1D(
        name="clamped_sin2_1d",
        f=lambda x: -0.5 * (2 * pi) ** 4 * jnp.cos(2 * pi * x),
        exact=lambda x: jnp.sin(pi * x) ** 2,
        exact_d1=lambda x: pi * jnp.sin(2 * pi * x),
    )


def clamped_sin_slope_1d() -> ClampedBiharmonicProblem1D:
    """u = sin(pi x): zero end VALUES but nonzero end SLOPES
    (u'(+-1) = -pi) — exercises the inhomogeneous gp rows."""
    pi = jnp.pi
    return ClampedBiharmonicProblem1D(
        name="clamped_sin_slope_1d",
        f=lambda x: pi ** 4 * jnp.sin(pi * x),
        g=(0.0, 0.0),
        gp=(float(-np.pi), float(-np.pi)),
        exact=lambda x: jnp.sin(pi * x),
        exact_d1=lambda x: pi * jnp.cos(pi * x),
    )


def _hermite_blocks(h: float):
    """Host-f64 Euler-Bernoulli element blocks: K_e = int H_a'' H_b'' on a
    length-h element, dof order (u_l, u'_l, u_r, u'_r); partitioned into
    (A, B, C) with A = K[:2, :2], B = K[:2, 2:], C = K[2:, 2:]."""
    K = np.array([
        [12.0, 6.0 * h, -12.0, 6.0 * h],
        [6.0 * h, 4.0 * h * h, -6.0 * h, 2.0 * h * h],
        [-12.0, -6.0 * h, 12.0, -6.0 * h],
        [6.0 * h, 2.0 * h * h, -6.0 * h, 4.0 * h * h],
    ]) / h ** 3
    return K[:2, :2], K[:2, 2:], K[2:, 2:]


def _hermite_load(problem, nodes, n_gauss: int = 6):
    """Per-node consistent load [N+1, 2] via Gauss quadrature of the four
    cubic Hermite shape functions against f."""
    dtype = nodes.dtype
    tg, wg = np.polynomial.legendre.leggauss(n_gauss)
    xi = 0.5 * (tg + 1.0)  # [0, 1] element coordinate
    H1 = 1.0 - 3.0 * xi ** 2 + 2.0 * xi ** 3
    H2 = xi - 2.0 * xi ** 2 + xi ** 3  # times h below
    H3 = 3.0 * xi ** 2 - 2.0 * xi ** 3
    H4 = -xi ** 2 + xi ** 3  # times h
    xl, xr = nodes[:-1], nodes[1:]
    h = xr - xl  # [E]
    xq = xl[:, None] + h[:, None] * jnp.asarray(xi, dtype)[None, :]
    fq = problem.f(xq) * jnp.ones_like(xq)  # [E, G]
    wj = jnp.asarray(wg, dtype)[None, :] * (0.5 * h[:, None])
    Hs = [jnp.asarray(v, dtype)[None, :] for v in (H1, H2, H3, H4)]
    le = jnp.stack([
        jnp.sum(wj * fq * Hs[0], axis=1),
        jnp.sum(wj * fq * Hs[1] * h[:, None], axis=1),
        jnp.sum(wj * fq * Hs[2], axis=1),
        jnp.sum(wj * fq * Hs[3] * h[:, None], axis=1),
    ], axis=-1)  # [E, 4]
    load = jnp.zeros((nodes.shape[0], 2), dtype)
    load = load.at[:-1].add(le[:, :2])
    load = load.at[1:].add(le[:, 2:])
    return load


def hermite_fem_solve_1d(problem: ClampedBiharmonicProblem1D, nodes):
    """C^1 Hermite-cubic coarse stage: (u, u') nodal arrays [N+1] each.

    Uniform mesh assumed (shared element blocks); clamped dofs at both
    ends are eliminated exactly (moved to the rhs)."""
    dtype = nodes.dtype
    N1 = nodes.shape[0]
    E = N1 - 1
    h = float(nodes[1] - nodes[0])
    A, B, C = _hermite_blocks(h)
    A = jnp.asarray(A, dtype)
    B = jnp.asarray(B, dtype)
    C = jnp.asarray(C, dtype)
    load = _hermite_load(problem, nodes)

    n_int = N1 - 2  # interior nodes carry (u, u') unknowns
    q0 = jnp.asarray([problem.g[0], problem.gp[0]], dtype)
    qN = jnp.asarray([problem.g[1], problem.gp[1]], dtype)
    rhs = load[1:-1]
    rhs = rhs.at[0].add(-(B.T @ q0))
    rhs = rhs.at[-1].add(-(B @ qN))
    D = jnp.broadcast_to(A + C, (n_int, 2, 2))
    L = jnp.broadcast_to(B.T, (n_int, 2, 2))
    U = jnp.broadcast_to(B, (n_int, 2, 2))
    x = tridiag.block_thomas_2x2(L, D, U, rhs)  # [n_int, 2]
    full = jnp.concatenate([q0[None], x, qN[None]])
    return full[:, 0], full[:, 1]


class ClampedBiharmonicSolution(NamedTuple):
    nodes: jnp.ndarray  # [N+1]
    u_nodal: jnp.ndarray  # [N+1] Hermite values
    up_nodal: jnp.ndarray  # [N+1] Hermite slopes
    coeffs: jnp.ndarray  # [E, M] enhanced element polynomials
    solve_ok: jnp.ndarray
    max_slack: jnp.ndarray


def prepare_shared_clamped(problem: ClampedBiharmonicProblem1D,
                           cfg: SolverConfig):
    """Host-f64 shared LSE precompute for the fourth-order enhancement:
    D = (2/h)^4 V4 (interior collocation points — V4 of a zero-trace,
    zero-slope polynomial does not vanish at endpoints, but interior
    points match the second-order families' convention), B = 4 rows
    (values at t = -1, +1 and slopes (2/h) V1 at t = -1, +1)."""
    import numpy.polynomial.legendre as NL

    M, C = cfg.M, cfg.n_colloc
    if M < 6:
        raise ValueError("clamped biharmonic needs M >= 6 (a quintic at "
                         "least: 4 boundary rows + nontrivial u'''')")
    if jnp.dtype(cfg.jnp_dtype()) != jnp.float64:
        # Loud gate, not a silent downgrade: the fourth-derivative
        # collocation scaling (2/h)^4 puts ~1e5-1e6 dynamic range into
        # the element algebra and the Hermite stiffness conditions as
        # h^-4 — measured on-chip f32 Linf 4.8 (garbage) vs f64 1e-13.
        # TPU-emulated f64 compiles for every op this path uses
        # (scan + closed-form 2x2 solves + dots; CLAUDE.md f64 probe).
        raise ValueError(
            "clamped biharmonic requires dtype='float64' (with "
            "jax_enable_x64): the (2/h)^4 fourth-derivative scaling is "
            "beyond f32 — measured f32 Linf ~4.8 vs f64 ~1e-13"
        )
    x0, x1 = problem.domain
    h = (x1 - x0) / (cfg.num_nodes - 1)
    s = 2.0 / h
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V4 = np.zeros((C, M))
    for k in range(4, M):
        c = np.zeros(k + 1)
        c[k] = 1.0
        V4[:, k] = NL.legval(t_int, NL.legder(c, 4))
    D = (s ** 4) * V4
    from ..ops import legendre as leg

    V0b, V1b, _ = leg.vandermonde_host(np.array([-1.0, 1.0]), M)
    B = np.concatenate([V0b, s * V1b])  # rows: u(-1), u(1), u'(-1), u'(1)
    shared = kkt.precompute_shared_lse_host(D, B, cfg.jnp_dtype())
    return shared, jnp.asarray(t_int)


def solve_clamped_biharmonic_1d(problem: ClampedBiharmonicProblem1D,
                                cfg: SolverConfig,
                                shared_bundle=None
                                ) -> ClampedBiharmonicSolution:
    """Direct clamped-beam hybrid solve (section comment above)."""
    if shared_bundle is None:
        shared_bundle = prepare_shared_clamped(problem, cfg)
    shared, t_int = shared_bundle
    dtype = cfg.jnp_dtype()
    x0, x1 = problem.domain
    nodes = jnp.linspace(x0, x1, cfg.num_nodes, dtype=dtype)
    u, up = hermite_fem_solve_1d(problem, nodes)
    xl, xr = nodes[:-1], nodes[1:]
    h = xr - xl
    xq = 0.5 * (xl + xr)[:, None] + 0.5 * h[:, None] * t_int[None, :]
    f_rows = problem.f(xq) * jnp.ones_like(xq)  # [E, C]
    bc = jnp.stack([u[:-1], u[1:], up[:-1], up[1:]], axis=-1)  # [E, 4]
    w, diags = kkt.solve_primal_shared(shared, f_rows, bc)
    return ClampedBiharmonicSolution(
        nodes=nodes, u_nodal=u, up_nodal=up, coeffs=w,
        solve_ok=diags.solve_ok, max_slack=diags.max_slack,
    )


# ------------------------------------------------------------- clamped 2D
#
# The clamped PLATE Lap^2 u = f, u = du/dn = 0: the Poisson-Poisson
# splitting cannot represent it (round-3 NUMERICS.md 29), and the round-4
# VERDICT (Missing #5) pointed at the missing ingredient — the
# Bogner-Fox-Schmit rectangle (Hermite-cubic TENSOR product, 4 dofs per
# node: u, u_x, u_y, u_xy) supplies exactly the corner cross-derivatives a
# C^1 tensor trace space needs on rectangles.  Architecture mirrors the 1D
# clamped beam, tensorised:
#
#   coarse : C^1 BFS FEM — the plate form  a(u, v) = int u_xx v_xx
#            + 2 u_xy v_xy + u_yy v_yy  (== int Lap u Lap v on H^2_0)
#            separates into Kronecker products of the 1D Hermite matrices
#            K16 = S2x(x)S0y + 2 S1x(x)S1y + S0x(x)S2y, so assembly is the
#            same matrix-free local-stiffness gather/scatter as Q1 with a
#            16-wide local dof axis; Jacobi-CG solve (SPD; kappa ~ h^-4,
#            f64-gated like the beam).  Unlike the 1D beam the 2D
#            biharmonic Green's function is NOT in the trial space, so
#            nodal dofs are O(h^4)-accurate rather than exact.
#   enhance: per-element tensor-Legendre fit of Lap^2 p = f (collocation
#            rows D = sx^4 V4(x)V0 + 2 sx^2 sy^2 V2(x)V2 + sy^4 V0(x)V4)
#            against the BFS element trace — VALUE rows at the 4M-4
#            boundary points plus NORMAL-SLOPE rows at M points per edge
#            (the 1D beam's 4-row recipe per edge direction); one shared
#            null-space LSE solve (kkt.precompute_shared_lse_host).
#
# Floor: the enhanced solution inherits the BFS trace accuracy — measured
# f64 h-sweep in tests/test_biharmonic.py (O(h^4): the hybrid error is
# trace-limited, the collocation fit itself is spectral in M).


@dataclasses.dataclass(frozen=True)
class ClampedBiharmonicProblem2D:
    """Lap^2 u = f on a rectangle, clamped: u = du/dn = 0 (homogeneous)."""

    name: str
    f: Callable
    domain: tuple = (-1.0, 1.0, -1.0, 1.0)
    exact: Optional[Callable] = None


def clamped_sin2_2d() -> ClampedBiharmonicProblem2D:
    """u = sin^2(pi x) sin^2(pi y): u = u_n = 0 on all four edges of
    [-1, 1]^2; f = a''''(x) a(y) + 2 a''(x) a''(y) + a(x) a''''(y) with
    a(t) = sin^2(pi t)."""
    pi = jnp.pi

    def a(t):
        return jnp.sin(pi * t) ** 2

    def a2(t):
        return 2.0 * pi ** 2 * jnp.cos(2.0 * pi * t)

    def a4(t):
        return -8.0 * pi ** 4 * jnp.cos(2.0 * pi * t)

    return ClampedBiharmonicProblem2D(
        name="clamped_sin2_2d",
        f=lambda x, y: (a4(x) * a(y) + 2.0 * a2(x) * a2(y)
                        + a(x) * a4(y)),
        exact=lambda x, y: a(x) * a(y),
    )


def _hermite_1d_mats_host(h: float):
    """Host-f64 1D Hermite-cubic element matrices on a length-h element,
    dof order (val_l, slope_l, val_r, slope_r), slope dofs carrying their
    h factor (physical-derivative dofs): S0 = int phi phi, S1 = int
    phi' phi', S2 = int phi'' phi'' (S2 == _hermite_blocks' K)."""
    tg, wg = np.polynomial.legendre.leggauss(6)
    xi = 0.5 * (tg + 1.0)  # [0, 1]
    w = 0.5 * wg * h  # physical quadrature weights
    H = np.stack([
        1.0 - 3.0 * xi ** 2 + 2.0 * xi ** 3,
        h * (xi - 2.0 * xi ** 2 + xi ** 3),
        3.0 * xi ** 2 - 2.0 * xi ** 3,
        h * (-(xi ** 2) + xi ** 3),
    ])  # [4, G] values
    d1 = np.stack([
        (-6.0 * xi + 6.0 * xi ** 2) / h,
        1.0 - 4.0 * xi + 3.0 * xi ** 2,
        (6.0 * xi - 6.0 * xi ** 2) / h,
        -2.0 * xi + 3.0 * xi ** 2,
    ])  # physical first derivatives
    d2 = np.stack([
        (-6.0 + 12.0 * xi) / h ** 2,
        (-4.0 + 6.0 * xi) / h,
        (6.0 - 12.0 * xi) / h ** 2,
        (-2.0 + 6.0 * xi) / h,
    ])  # physical second derivatives
    S0 = np.einsum("ag,bg,g->ab", H, H, w)
    S1 = np.einsum("ag,bg,g->ab", d1, d1, w)
    S2 = np.einsum("ag,bg,g->ab", d2, d2, w)
    return S0, S1, S2


def _bfs_maps(hx: float, hy: float):
    """Index maps for the 16-dof BFS element: local dof
    l = 4 * corner + dtype with corner = cx + 2 cy and
    dtype = tx + 2 ty (tx/ty: 0 = value, 1 = slope); the tensor factors
    are 1D Hermite dofs a = 2 cx + tx (x) and b = 2 cy + ty (y)."""
    amap = np.zeros(16, np.int64)
    bmap = np.zeros(16, np.int64)
    for c in range(4):
        cx, cy = c % 2, c // 2
        for d in range(4):
            tx, ty = d % 2, d // 2
            amap[4 * c + d] = 2 * cx + tx
            bmap[4 * c + d] = 2 * cy + ty
    return amap, bmap


def _bfs_local_stiffness_host(hx: float, hy: float):
    """[16, 16] BFS plate stiffness K16 = S2x*S0y + 2 S1x*S1y + S0x*S2y
    (module section comment)."""
    S0x, S1x, S2x = _hermite_1d_mats_host(hx)
    S0y, S1y, S2y = _hermite_1d_mats_host(hy)
    amap, bmap = _bfs_maps(hx, hy)
    A, B = amap[:, None], bmap[:, None]
    A2, B2 = amap[None, :], bmap[None, :]
    return (S2x[A, A2] * S0y[B, B2] + 2.0 * S1x[A, A2] * S1y[B, B2]
            + S0x[A, A2] * S2y[B, B2])


def _bfs_gather(v):
    """BFS element local dof vectors: v [ny+1, nx+1, 4] -> [ny, nx, 16]
    in the l = 4 * corner + dtype layout."""
    ny, nx = v.shape[0] - 1, v.shape[1] - 1
    parts = []
    for c in range(4):
        cx, cy = c % 2, c // 2
        parts.append(v[cy:cy + ny, cx:cx + nx, :])
    return jnp.concatenate(parts, axis=-1)


def _bfs_scatter_add(e, shape):
    """Transpose of ``_bfs_gather``: e [ny, nx, 16] -> grid [*shape, 4]."""
    ny, nx = e.shape[0], e.shape[1]
    out = jnp.zeros(shape + (4,), e.dtype)
    for c in range(4):
        cx, cy = c % 2, c // 2
        out = out.at[cy:cy + ny, cx:cx + nx, :].add(
            e[..., 4 * c:4 * c + 4])
    return out


def _bfs_apply(v, K16):
    """Matrix-free BFS stiffness apply (the 4-dof-per-node analog of
    ``assembly2d.apply_stiffness``)."""
    loc = _bfs_gather(v)
    e = jnp.einsum("yxl,ml->yxm", loc, K16,
                   precision=jax.lax.Precision.HIGHEST)
    return _bfs_scatter_add(e, (v.shape[0], v.shape[1]))


def _bfs_basis_host(hx: float, hy: float, xi_x, xi_y, dx: int = 0,
                    dy: int = 0):
    """BFS basis (physical (dx, dy)-derivatives) at reference points
    (xi_x[p], xi_y[p]) in [0, 1]^2 -> [P, 16]."""
    def h1d(h, xi, d):
        if d == 0:
            return np.stack([
                1.0 - 3.0 * xi ** 2 + 2.0 * xi ** 3,
                h * (xi - 2.0 * xi ** 2 + xi ** 3),
                3.0 * xi ** 2 - 2.0 * xi ** 3,
                h * (-(xi ** 2) + xi ** 3),
            ], axis=-1)  # [P, 4]
        return np.stack([
            (-6.0 * xi + 6.0 * xi ** 2) / h,
            1.0 - 4.0 * xi + 3.0 * xi ** 2,
            (6.0 * xi - 6.0 * xi ** 2) / h,
            -2.0 * xi + 3.0 * xi ** 2,
        ], axis=-1)

    X = h1d(hx, np.asarray(xi_x, float), dx)  # [P, 4]
    Y = h1d(hy, np.asarray(xi_y, float), dy)
    amap, bmap = _bfs_maps(hx, hy)
    return X[:, amap] * Y[:, bmap]  # [P, 16]


def bfs_fem_solve_2d(problem: ClampedBiharmonicProblem2D,
                     cfg: Solver2DConfig):
    """C^1 BFS coarse stage: nodal dof grid [ny+1, nx+1, 4]
    (u, u_x, u_y, u_xy) by matrix-free Jacobi-CG on the SPD plate form;
    all four dofs of every boundary node are eliminated exactly (u = 0
    along the edge forces the tangential derivative and the edge-
    tangential derivative of u_n too — homogeneous clamped data)."""
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    nx, ny = cfg.nx, cfg.ny
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    xs = jnp.linspace(x0, x1, nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, ny + 1, dtype=dtype)
    K16 = jnp.asarray(_bfs_local_stiffness_host(hx, hy), dtype)

    # Consistent load: Gauss quadrature of f against the 16 bicubics.
    q = 6
    tg, wg = np.polynomial.legendre.leggauss(q)
    xi = 0.5 * (tg + 1.0)
    XI_x, XI_y = np.meshgrid(xi, xi)  # [q(y), q(x)]
    Phi = _bfs_basis_host(hx, hy, XI_x.ravel(), XI_y.ravel())  # [q*q, 16]
    wq = np.outer(wg, wg).ravel() * 0.25 * hx * hy  # physical weights
    Phi_w = jnp.asarray(Phi * wq[:, None], dtype)  # [q*q, 16]
    xq = xs[:-1][:, None] + hx * jnp.asarray(xi, dtype)[None, :]  # [nx, q]
    yq = ys[:-1][:, None] + hy * jnp.asarray(xi, dtype)[None, :]
    F = problem.f(xq[None, :, None, :], yq[:, None, :, None])
    F = (F * jnp.ones((ny, nx, q, q), dtype)).reshape(ny, nx, q * q)
    le = jnp.einsum("yxp,pl->yxl", F, Phi_w,
                    precision=jax.lax.Precision.HIGHEST)
    b = _bfs_scatter_add(le, (ny + 1, nx + 1))

    interior = (jnp.zeros((ny + 1, nx + 1), bool)
                .at[1:-1, 1:-1].set(True))[..., None]

    def apply_free(v):
        return jnp.where(interior, _bfs_apply(v * interior, K16), 0.0)

    # Jacobi diagonal via scatter-add of diag(K16).
    dloc = jnp.broadcast_to(jnp.diag(K16), (ny, nx, 16))
    diag = _bfs_scatter_add(dloc, (ny + 1, nx + 1))
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    rhs = jnp.where(interior, b, 0.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    maxiter = cfg.cg_maxiter if cfg.cg_maxiter else 20000
    from ..ops import cg as cgmod

    res = cgmod.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                   maxiter=maxiter)
    u = jnp.where(interior, res.x, 0.0)
    return xs, ys, u, res


class ClampedBiharmonicSolution2D(NamedTuple):
    xs: jnp.ndarray  # [nx+1]
    ys: jnp.ndarray  # [ny+1]
    u_nodal: jnp.ndarray  # [ny+1, nx+1, 4] BFS dofs (u, ux, uy, uxy)
    coeffs: jnp.ndarray  # [ny, nx, M, M] enhanced element polynomials
    solve_ok: jnp.ndarray  # [ny, nx]
    max_slack: jnp.ndarray
    cg_iters: jnp.ndarray
    cg_residual: jnp.ndarray


def prepare_shared_clamped_2d(problem: ClampedBiharmonicProblem2D,
                              cfg: Solver2DConfig):
    """Host-f64 shared LSE precompute for the fourth-order 2D enhancement
    (module section comment): D = Lap^2 collocation rows [C^2, M^2];
    B = value rows at the 4M-4 boundary points + physical normal-slope
    rows at M points per edge [4M-4 + 4M, M^2]."""
    import numpy.polynomial.legendre as NL

    from ..ops import legendre as leg
    from .hybrid2d import _boundary_coords

    M, C = cfg.M, cfg.n_colloc
    if M < 6:
        raise ValueError("clamped biharmonic needs M >= 6 (4 boundary-row "
                         "kinds per direction + nontrivial Lap^2)")
    if jnp.dtype(cfg.jnp_dtype()) != jnp.float64:
        raise ValueError(
            "clamped plate requires dtype='float64' (with "
            "jax_enable_x64): the (2/h)^4 fourth-derivative scaling is "
            "beyond f32 (same gate as the clamped beam)"
        )
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    sx, sy = 2.0 / hx, 2.0 / hy
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0h, V1h, V2h = leg.vandermonde_host(t_int, M)
    V4 = np.zeros((C, M))
    for k in range(4, M):
        c = np.zeros(k + 1)
        c[k] = 1.0
        V4[:, k] = NL.legval(t_int, NL.legder(c, 4))

    def t2(Ay, Ax):
        return np.einsum("yk,xl->yxkl", Ay, Ax).reshape(C * C, M * M)

    D = (sx ** 4 * t2(V0h, V4) + 2.0 * sx ** 2 * sy ** 2 * t2(V2h, V2h)
         + sy ** 4 * t2(V4, V0h))

    # Value rows at the shared 4M-4 boundary points.
    bpts = _boundary_coords(M)  # [(ty, tx)]
    V0y_b = leg.vandermonde_host(bpts[:, 0], M)[0]
    V0x_b = leg.vandermonde_host(bpts[:, 1], M)[0]
    B_val = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M * M)
    # Normal-slope rows: M points per edge, corners included (both
    # normal components are clamped data there).
    tb = np.linspace(-1.0, 1.0, M)
    V0t, V1t, _ = leg.vandermonde_host(tb, M)
    V0m1, V1m1, _ = leg.vandermonde_host(np.array([-1.0, 1.0]), M)

    def rows_x(side):  # d/dx rows along edge tx = side
        Vx1 = V1m1[1 if side > 0 else 0][None, :]  # [1, M]
        return (sx * np.einsum("pk,pl->pkl", V0t,
                               np.broadcast_to(Vx1, (M, M)))
                ).reshape(M, M * M)

    def rows_y(side):  # d/dy rows along edge ty = side
        Vy1 = V1m1[1 if side > 0 else 0][None, :]
        return (sy * np.einsum("pk,pl->pkl",
                               np.broadcast_to(Vy1, (M, M)), V0t)
                ).reshape(M, M * M)

    B = np.concatenate([B_val, rows_x(-1.0), rows_x(+1.0),
                        rows_y(-1.0), rows_y(+1.0)])
    # rcond: B is rank-deficient BY CONSTRUCTION (rank 8M - 16 of 8M - 4
    # rows — the corner normal-derivative rows are tangential derivatives
    # of the value trace); the SVD route keeps the full (M-4)^2 bubble
    # null space and the pseudoinverse particular map.  The BFS trace
    # data satisfies the same dependencies exactly (it is the trace of a
    # C^1 bicubic), so the pinv solution interpolates it.
    shared = kkt.precompute_shared_lse_host(D, B, cfg.jnp_dtype(),
                                            rcond=1e-10)

    # Data-side BFS trace matrices at the SAME points (physical units on
    # both sides: operator rows carry sx/sy, data rows are physical
    # derivatives of the bicubic).
    def ref(t):
        return 0.5 * (np.asarray(t) + 1.0)

    T_val = _bfs_basis_host(hx, hy, ref(bpts[:, 1]), ref(bpts[:, 0]))
    T_xl = _bfs_basis_host(hx, hy, np.zeros(M), ref(tb), dx=1)
    T_xr = _bfs_basis_host(hx, hy, np.ones(M), ref(tb), dx=1)
    T_yb = _bfs_basis_host(hx, hy, ref(tb), np.zeros(M), dy=1)
    T_yt = _bfs_basis_host(hx, hy, ref(tb), np.ones(M), dy=1)
    T_all = jnp.asarray(np.concatenate([T_val, T_xl, T_xr, T_yb, T_yt]),
                        cfg.jnp_dtype())  # [4M-4 + 4M, 16]
    return shared, jnp.asarray(t_int), T_all


def solve_clamped_biharmonic_2d(problem: ClampedBiharmonicProblem2D,
                                cfg: Solver2DConfig,
                                shared_bundle=None
                                ) -> ClampedBiharmonicSolution2D:
    """Direct clamped-plate hybrid solve (module section comment): BFS
    coarse stage + fourth-order shared-LSE enhancement against the C^1
    element traces."""
    if shared_bundle is None:
        shared_bundle = prepare_shared_clamped_2d(problem, cfg)
    shared, t_int, T_all = shared_bundle
    dtype = cfg.jnp_dtype()
    xs, ys, u, res = bfs_fem_solve_2d(problem, cfg)
    nx, ny = cfg.nx, cfg.ny
    hx = float(xs[1] - xs[0])
    hy = float(ys[1] - ys[0])
    C = cfg.n_colloc
    t_j = jnp.asarray(t_int, dtype)
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    xq = xm[:, None] + 0.5 * hx * t_j[None, :]
    yq = ym[:, None] + 0.5 * hy * t_j[None, :]
    F = problem.f(xq[None, :, None, :], yq[:, None, :, None])
    f_rows = (F * jnp.ones((ny, nx, C, C), dtype)).reshape(
        ny * nx, C * C)
    loc = _bfs_gather(u)  # [ny, nx, 16]
    bc = jnp.einsum("yxl,pl->yxp", loc, T_all,
                    precision=jax.lax.Precision.HIGHEST
                    ).reshape(ny * nx, -1)
    w, diags = kkt.solve_primal_shared(shared, f_rows, bc)
    M = cfg.M
    return ClampedBiharmonicSolution2D(
        xs=xs, ys=ys, u_nodal=u,
        coeffs=w.reshape(ny, nx, M, M),
        solve_ok=diags.solve_ok.reshape(ny, nx),
        max_slack=diags.max_slack.reshape(ny, nx),
        cg_iters=res.iters, cg_residual=res.residual,
    )


def evaluate_clamped_2d(sol: ClampedBiharmonicSolution2D, x, y):
    """u(x, y) through the standard tensor-Legendre read path."""
    stub = Solution2D(sol.xs, sol.ys, None, sol.coeffs, sol.cg_iters,
                      sol.cg_residual, None, None, sol.solve_ok)
    return evaluate_2d(stub, x, y)
