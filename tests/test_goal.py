"""Goal-oriented (DWR) adaptivity: estimate exactness and the refine loop.

The DWR identity (models/goal.py docstring) is exact up to the
adjoint-enhancement error z ~ z_h, so the measured effectivity
est/true should sit at 1 to a few percent — that exactness, not a loose
"same order of magnitude", is the property under test.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import problems
from hybrid_fem_lssvr_tpu.models.goal import (
    adjoint_problem, dwr_estimate, goal_adaptive_solve, goal_value,
)
from hybrid_fem_lssvr_tpu.models.hybrid import HybridSolver, SolverConfig
from hybrid_fem_lssvr_tpu.models.problem import Problem1D

_X0, _S = 0.3, 0.15


def _j(x):
    return jnp.exp(-0.5 * ((x - _X0) / _S) ** 2)


def _exact_goal(exact):
    tq, wq = np.polynomial.legendre.leggauss(400)
    ue = np.asarray(exact(jnp.asarray(tq)))
    return float(np.sum(wq * ue * np.exp(-0.5 * ((tq - _X0) / _S) ** 2)))


def _effectivity(problem, cfg, num_nodes):
    nodes = jnp.linspace(*problem.domain, num_nodes, dtype=jnp.float64)
    psol = HybridSolver(problem, cfg, nodes=nodes).solve()
    asol = HybridSolver(adjoint_problem(problem, _j), cfg,
                        nodes=nodes).solve()
    est = dwr_estimate(problem, psol, asol)
    true = _exact_goal(problem.exact) - float(
        goal_value(nodes, psol.coeffs, _j))
    return float(est.total) / true, true


@pytest.mark.parametrize("make,eff_tol", [
    (problems.poisson_1d, 0.01),  # self-adjoint: eff 1.000 measured
    (problems.advection_diffusion_1d, 0.05),  # constant-b adjoint flip
])
def test_dwr_effectivity_near_one(make, eff_tol):
    cfg = SolverConfig(num_nodes=9, M=8, gamma=1e4, dtype="float64")
    eff, true = _effectivity(make(), cfg, 9)
    assert abs(true) > 1e-9  # error is resolvable, not roundoff
    assert abs(eff - 1.0) < eff_tol, (eff, true)


def test_dwr_variable_b_adjoint_via_ad():
    """Non-constant advection: c_adj = c - b' comes from jax.grad."""
    p = Problem1D(
        name="varb",
        f=lambda x: (np.pi ** 2 * jnp.sin(np.pi * x)
                     + x * np.pi * jnp.cos(np.pi * x)),
        b=lambda x: x,
        exact=lambda x: jnp.sin(np.pi * x),
    )
    cfg = SolverConfig(num_nodes=9, M=8, gamma=1e4, dtype="float64")
    eff, true = _effectivity(p, cfg, 9)
    assert abs(true) > 1e-6
    assert abs(eff - 1.0) < 0.05, (eff, true)


def test_dwr_estimate_tracks_true_error_across_meshes():
    p = problems.poisson_1d()
    Jex = _exact_goal(p.exact)
    cfg = SolverConfig(M=8, gamma=1e4, dtype="float64")
    for n in (9, 17):
        nodes = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float64)
        psol = HybridSolver(p, cfg, nodes=nodes).solve()
        asol = HybridSolver(adjoint_problem(p, _j), cfg,
                            nodes=nodes).solve()
        est = float(dwr_estimate(p, psol, asol).total)
        true = Jex - float(goal_value(nodes, psol.coeffs, _j))
        assert abs(est - true) < 5e-3 * abs(true), (n, est, true)


def test_goal_adaptive_solve_converges():
    p = problems.poisson_1d()
    Jex = _exact_goal(p.exact)
    cfg = SolverConfig(num_nodes=9, M=8, gamma=1e4, dtype="float64")
    res = goal_adaptive_solve(p, _j, cfg, rounds=4, refine_frac=0.3,
                              exact_goal=Jex)
    errs = [abs(r["true_error"]) for r in res.history]
    # per-round records carry goal + signed estimate + true error
    assert all("goal" in r and "est_error" in r for r in res.history)
    assert errs[-1] < 0.02 * errs[0], errs  # measured: 1.55e-7 -> 1.6e-9
    # the estimate stays sharp on the refined (graded) meshes too
    last = res.history[-1]
    assert abs(last["est_error"] - last["true_error"]) \
        < 5e-3 * abs(last["true_error"])


def test_adjoint_problem_rejects_non_dirichlet():
    with pytest.raises(ValueError, match="Dirichlet"):
        adjoint_problem(problems.poisson_neumann(), _j)


# ------------------------------------------------------------------- 2D

def _j2(x, y):
    return jnp.exp(-0.5 * (((x - 0.55) / 0.08) ** 2
                           + ((y - 0.55) / 0.08) ** 2))


def _exact_goal_2d(exact):
    tq, wq = np.polynomial.legendre.leggauss(200)
    X, Y = np.meshgrid(tq, tq)
    W = np.outer(wq, wq)
    return float(np.sum(W * np.asarray(exact(jnp.asarray(X), jnp.asarray(Y)))
                        * np.asarray(_j2(X, Y))))


def _effectivity_2d(problem, n, zoom):
    from hybrid_fem_lssvr_tpu.models.goal import (
        _bisect, adjoint_problem_2d, dwr_estimate_2d, goal_value_2d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig
    from hybrid_fem_lssvr_tpu.models.hybrid2d_graded import (
        HybridSolver2DGraded,
    )

    cfg = Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6, dtype="float64",
                         precond="jacobi")
    xs = np.linspace(-1.0, 1.0, n + 1)
    ys = np.linspace(-1.0, 1.0, n + 1)
    psol = HybridSolver2DGraded(problem, cfg, xs, ys).solve()
    adj = adjoint_problem_2d(problem, _j2)
    asol = HybridSolver2DGraded(adj, cfg, _bisect(xs, zoom),
                                _bisect(ys, zoom)).solve()
    est = float(dwr_estimate_2d(problem, psol, asol).total)
    true = _exact_goal_2d(problem.exact) - float(goal_value_2d(psol, _j2))
    return est / true, true


def test_dwr_2d_effectivity_zoom_levels():
    """The bisected-adjoint design (goal.py section comment): zoom 1
    recovers ~0.9 of the true goal error, zoom 2 ~0.98 — and an
    equal-mesh adjoint would sit near ZERO (measured -0.05), so the
    lower bounds here are the real property under test."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import poisson_2d

    eff1, true1 = _effectivity_2d(poisson_2d(), 8, zoom=1)
    assert abs(true1) > 1e-6
    assert 0.80 < eff1 < 1.02, (eff1, true1)
    eff2, _ = _effectivity_2d(poisson_2d(), 8, zoom=2)
    assert 0.93 < eff2 < 1.03, eff2


def test_dwr_2d_advection_adjoint():
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d

    p = get_problem_2d("advection_diffusion_2d")
    eff, true = _effectivity_2d(p, 8, zoom=1)
    assert abs(true) > 1e-8
    assert 0.7 < eff < 1.15, (eff, true)


def test_goal_adaptive_solve_2d_converges_and_tracks():
    from hybrid_fem_lssvr_tpu.models.goal import goal_adaptive_solve_2d
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        Solver2DConfig, poisson_2d,
    )

    p = poisson_2d()
    Jex = _exact_goal_2d(p.exact)
    cfg = Solver2DConfig(nx=8, ny=8, M=6, n_colloc=6, dtype="float64",
                         precond="jacobi")
    res = goal_adaptive_solve_2d(p, _j2, cfg, rounds=3, refine_frac=0.3,
                                 exact_goal=Jex)
    errs = [abs(r["true_error"]) for r in res.history]
    assert errs[-1] < 0.2 * errs[0], errs  # measured 2.7e-4 -> 3.8e-5
    # estimate stays ~0.9-effective on every (graded) round
    for r in res.history:
        assert abs(r["est_error"] - r["true_error"]) \
            < 0.35 * abs(r["true_error"]), r


def test_adjoint_problem_2d_rejects_non_dirichlet():
    from hybrid_fem_lssvr_tpu.models.goal import adjoint_problem_2d
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d

    p = get_problem_2d("robin_2d")
    with pytest.raises(ValueError, match="Dirichlet"):
        adjoint_problem_2d(p, _j2)


# ------------------------------------------------------------------- 3D

def _j3(x, y, z):
    return jnp.exp(-0.5 * (((x - 0.45) ** 2 + (y - 0.45) ** 2
                            + (z - 0.45) ** 2) / 0.15 ** 2))


def _exact_goal_3d(exact):
    tq, wq = np.polynomial.legendre.leggauss(80)
    X, Y, Z = np.meshgrid(tq, tq, tq, indexing="ij")
    W = wq[:, None, None] * wq[None, :, None] * wq[None, None, :]
    ue = np.asarray(exact(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)))
    return float(np.sum(W * ue * np.asarray(_j3(X, Y, Z))))


def test_dwr_3d_effectivity():
    """Bisected-adjoint 3D DWR: measured eff 0.86 (zoom 1) at 6^3."""
    from hybrid_fem_lssvr_tpu.models.goal import (
        _bisect, adjoint_problem_3d, dwr_estimate_3d, goal_value_3d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid3d import (
        Solver3DConfig, get_problem_3d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid3d_graded import (
        HybridSolver3DGraded,
    )

    p = get_problem_3d("poisson_3d")
    cfg = Solver3DConfig(nx=6, ny=6, nz=6, M=4, n_colloc=4,
                         precond="jacobi", dtype="float64", backend="xla")
    xs = np.linspace(-1.0, 1.0, 7)
    psol = HybridSolver3DGraded(p, cfg, xs, xs, xs).solve()
    adj = adjoint_problem_3d(p, _j3)
    bs = _bisect(xs, 1)
    asol = HybridSolver3DGraded(adj, cfg, bs, bs, bs).solve()
    est = float(dwr_estimate_3d(p, psol, asol).total)
    true = _exact_goal_3d(p.exact) - float(goal_value_3d(psol, _j3))
    assert abs(true) > 1e-4
    assert 0.75 < est / true < 1.05, (est, true)


def test_goal_adaptive_solve_3d_converges():
    from hybrid_fem_lssvr_tpu.models.goal import goal_adaptive_solve_3d
    from hybrid_fem_lssvr_tpu.models.hybrid3d import (
        Solver3DConfig, get_problem_3d,
    )

    p = get_problem_3d("poisson_3d")
    Jex = _exact_goal_3d(p.exact)
    cfg = Solver3DConfig(nx=6, ny=6, nz=6, M=4, n_colloc=4,
                         precond="jacobi", dtype="float64", backend="xla")
    res = goal_adaptive_solve_3d(p, _j3, cfg, rounds=2, exact_goal=Jex)
    errs = [abs(r["true_error"]) for r in res.history]
    assert errs[-1] < 0.05 * errs[0], errs  # measured 1.27e-3 -> 2.7e-5
    # the estimate tracks while the error is resolved (the last round can
    # sit at the sign-crossing where the RELATIVE gap blows up)
    for r in res.history[:2]:
        assert abs(r["est_error"] - r["true_error"]) \
            < 0.35 * abs(r["true_error"]), r


def test_adjoint_problem_3d_rejects_non_dirichlet():
    from hybrid_fem_lssvr_tpu.models.goal import adjoint_problem_3d
    from hybrid_fem_lssvr_tpu.models.hybrid3d import get_problem_3d

    with pytest.raises(ValueError, match="Dirichlet"):
        adjoint_problem_3d(get_problem_3d("robin_3d"), _j3)


# ------------------------------------------------- semilinear (1D)

def test_dwr_semilinear_effectivity():
    """Linearized-adjoint DWR for -u'' + u^3 = f: effectivity 1.007 /
    1.002 at 9/17 nodes measured (second-order remainder ~ s''.e^2 is
    negligible at the hybrid error level)."""
    from hybrid_fem_lssvr_tpu.models.goal import goal_error_semilinear
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_1d, hybrid_solve_semilinear,
    )

    p = cubic_1d()
    Jex = _exact_goal(p.exact)
    for n, tol in ((9, 0.02), (17, 0.01)):
        cfg = SolverConfig(num_nodes=n, M=8, gamma=1e4, dtype="float64")
        sol = hybrid_solve_semilinear(p, cfg)
        Jh, est, _ = goal_error_semilinear(p, sol, cfg, _j)
        true = Jex - float(Jh)
        assert abs(true) > 1e-5
        assert abs(float(est.total) / true - 1.0) < tol, (n, est.total,
                                                          true)
