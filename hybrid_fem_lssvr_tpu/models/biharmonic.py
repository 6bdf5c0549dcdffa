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
