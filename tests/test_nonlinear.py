"""Semilinear elliptic solves (models/nonlinear.py): Newton at the FEM
level AND at the element-polynomial level.  Theory encoded: FEM Newton is
quadratic; the hybrid Linf floor equals the Newton iterate's NODAL error
(O(h^2) for P1 — the s(u) mass term breaks linear-Poisson nodal
exactness — and O(h^4) for the compact Numerov rows)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig
from hybrid_fem_lssvr_tpu.models.nonlinear import (
    bratu_1d, cubic_1d, evaluate_semilinear, hybrid_solve_semilinear,
)

X = np.linspace(-1, 1, 401)
UE = np.sin(np.pi * X)


def _solve(prob, E, **kw):
    sol = hybrid_solve_semilinear(
        prob, SolverConfig(num_nodes=E + 1, M=8, gamma=1e4), **kw)
    u = evaluate_semilinear(sol, jnp.asarray(X))
    return sol, float(np.abs(np.asarray(u) - UE).max())


@pytest.mark.parametrize("prob", [cubic_1d(), bratu_1d()])
def test_newton_quadratic_and_h2_floor(prob):
    sol, linf = _solve(prob, 16)
    r = np.asarray(sol.newton_residuals)
    # quadratic contraction until roundoff
    assert r[1] < 0.3 * r[0] and r[2] < 0.1 * r[1] and r[3] < 1e-5
    assert r[-1] < 1e-12
    assert bool(np.asarray(sol.solve_ok).all())
    assert float(sol.colloc_residual) < 1e-6
    # hybrid == nodal floor
    nodal = float(np.abs(np.asarray(sol.fem_values)
                         - np.sin(np.pi * np.asarray(sol.nodes))).max())
    assert linf < 1.5 * nodal + 1e-12
    _, linf32 = _solve(prob, 32)
    assert 1.6 < np.log2(linf / linf32) < 2.4  # O(h^2)


@pytest.mark.parametrize("prob", [cubic_1d(), bratu_1d()])
def test_numerov_newton_h4(prob):
    """Compact Numerov rows: O(h^4) nodal, the hybrid rides it (measured
    16.3x per h-halving; 122x better than P1 at E=32)."""
    _, e16 = _solve(prob, 16, scheme="numerov")
    _, e32 = _solve(prob, 32, scheme="numerov")
    assert 3.4 < np.log2(e16 / e32) < 4.6, (e16, e32)
    assert e32 < 1e-5


def test_semilinear_reduces_to_linear():
    """s == 0 must reproduce the linear Poisson hybrid solve."""
    import dataclasses

    from hybrid_fem_lssvr_tpu import HybridSolver, problems
    from hybrid_fem_lssvr_tpu.models.nonlinear import SemilinearProblem1D

    pi = jnp.pi
    prob = SemilinearProblem1D(
        name="poisson_as_semilinear",
        s=lambda u: 0.0 * u,
        ds=lambda u: 0.0 * u,
        f=lambda x: pi**2 * jnp.sin(pi * x),
        exact=lambda x: jnp.sin(pi * x),
    )
    sol, linf = _solve(prob, 24)
    lin = HybridSolver(problems.poisson_1d(),
                       SolverConfig(num_nodes=25, M=8, gamma=1e4))
    lin.solve()
    linf_lin, _ = lin.errors(X)
    assert abs(linf - float(linf_lin)) < 1e-9


def test_cli_nonlinear(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["nonlinear", "--problem", "bratu_1d", "--num-nodes", "17",
              "--scheme", "numerov"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "semilinear_solve"
    assert rec["linf_error"] < 2e-4
    assert rec["newton_residual"] < 1e-12
    assert rec["n_fallback"] == 0


def test_semilinear_2d_converges():
    """2D two-level Newton (cubic nonlinearity): quadratic FEM Newton,
    O(h^2) hybrid convergence (the lumped-nonlinearity Q1 scheme's nodal
    floor; the element-level colloc residual is an LSQ floor scaling
    with (2/h)^2, not a convergence certificate)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_2d, evaluate_semilinear_2d, hybrid_solve_semilinear_2d,
    )

    p = cubic_2d()
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    uex = np.asarray(p.exact(xq, yq))
    errs = {}
    for n in (8, 16):
        sol = hybrid_solve_semilinear_2d(
            p, Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6))
        u = evaluate_semilinear_2d(sol, xq, yq)
        errs[n] = float(np.abs(np.asarray(u) - uex).max())
        r = np.asarray(sol.newton_residuals)
        assert r[3] < 1e-6 and r[-1] < 1e-12  # quadratic contraction
        assert bool(np.asarray(sol.solve_ok).all())
    order = np.log2(errs[8] / errs[16])
    assert 1.6 < order < 2.6, (errs, order)


def test_semilinear_3d_converges():
    """3D two-level Newton (cubic nonlinearity): quadratic FEM Newton,
    O(h^2) hybrid convergence (lumped-nonlinearity Q1 hex nodal floor)."""
    from hybrid_fem_lssvr_tpu.models.hybrid3d import Solver3DConfig
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_3d, evaluate_semilinear_3d, hybrid_solve_semilinear_3d,
    )

    p = cubic_3d()
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    zq = jnp.asarray(rng.uniform(-1, 1, 2000))
    uex = np.asarray(p.exact(xq, yq, zq))
    errs = {}
    for n in (8, 16):
        sol = hybrid_solve_semilinear_3d(
            p, Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4))
        u = evaluate_semilinear_3d(sol, xq, yq, zq)
        errs[n] = float(np.abs(np.asarray(u) - uex).max())
        r = np.asarray(sol.newton_residuals)
        assert r[3] < 1e-6 and r[-1] < 1e-12  # quadratic contraction
        assert bool(np.asarray(sol.solve_ok).all())
    order = np.log2(errs[8] / errs[16])
    assert 1.6 < order < 2.6, (errs, order)


def test_semilinear_2d_numerov_lift_fourth_order():
    """scheme='numerov' + trace_lift=6: the compact pair carries O(h^4)
    through the semilinear two-level Newton (4.3e-3 / 8.4e-5 / 5.5e-6 at
    8/16/32^2 — 1350x below the p1 floor at 32^2)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_2d, evaluate_semilinear_2d, hybrid_solve_semilinear_2d,
    )

    p = cubic_2d()
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    uex = np.asarray(p.exact(xq, yq))
    errs = {}
    for n in (8, 16):
        sol = hybrid_solve_semilinear_2d(
            p, Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6),
            scheme="numerov", trace_lift=6)
        u = evaluate_semilinear_2d(sol, xq, yq)
        errs[n] = float(np.abs(np.asarray(u) - uex).max())
        assert float(sol.newton_residuals[-1]) < 1e-12
        assert bool(np.asarray(sol.solve_ok).all())
    assert errs[8] / errs[16] > 11.0, errs
    assert errs[16] < 2e-4


def test_semilinear_3d_numerov_lift_fourth_order():
    from hybrid_fem_lssvr_tpu.models.hybrid3d import Solver3DConfig
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_3d, evaluate_semilinear_3d, hybrid_solve_semilinear_3d,
    )

    p = cubic_3d()
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    zq = jnp.asarray(rng.uniform(-1, 1, 2000))
    uex = np.asarray(p.exact(xq, yq, zq))
    errs = {}
    for n in (8, 16):
        sol = hybrid_solve_semilinear_3d(
            p, Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4),
            scheme="numerov", trace_lift=6)
        u = evaluate_semilinear_3d(sol, xq, yq, zq)
        errs[n] = float(np.abs(np.asarray(u) - uex).max())
        assert bool(np.asarray(sol.solve_ok).all())
    assert errs[8] / errs[16] > 11.0, errs
    assert errs[16] < 5e-4
