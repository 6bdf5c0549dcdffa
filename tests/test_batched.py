"""Grouped/vmapped family solves (expert-parallel analog, SURVEY.md 2.3)."""

import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
from hybrid_fem_lssvr_tpu.models import batched


def test_helmholtz_family_matches_individual_solves():
    ks = jnp.asarray([1.3, 2.3, 3.1])
    cfg = SolverConfig(num_nodes=41)
    sol = batched.solve_family(batched.helmholtz_family(), cfg, ks)
    assert sol.coeffs.shape == (3, 40, 8)
    for i, k in enumerate([1.3, 2.3, 3.1]):
        s = HybridSolver(problems.helmholtz_1d(k=float(k)), cfg)
        s.solve()
        np.testing.assert_allclose(
            np.asarray(sol.coeffs[i]), np.asarray(s.solution.coeffs),
            atol=1e-8,
        )
    assert bool(jnp.all(sol.solve_ok))


def test_advdiff_family_vector_theta():
    thetas = jnp.asarray([[1.0, 3.0], [0.5, 1.0], [2.0, 0.0]])
    cfg = SolverConfig(num_nodes=65)
    sol = batched.solve_family(batched.advdiff_family(), cfg, thetas)
    # all instances hit the analytic solution at the nodal floor
    x = jnp.linspace(-1, 1, 101)
    from hybrid_fem_lssvr_tpu.ops import eval as ops_eval

    for i in range(3):
        u = ops_eval.evaluate(sol.nodes[i], sol.coeffs[i], x)
        err = float(jnp.max(jnp.abs(u - jnp.sin(jnp.pi * x))))
        assert err < 5e-3, (i, err)


def test_solve_groups_static_routing():
    groups = [
        (batched.helmholtz_family(), SolverConfig(num_nodes=33),
         jnp.asarray([1.0, 2.0])),
        (batched.advdiff_family(), SolverConfig(num_nodes=33),
         jnp.asarray([[1.0, 2.0]])),
    ]
    out = batched.solve_groups(groups)
    assert [g.family_name for g in out] == ["helmholtz_family",
                                           "advdiff_family"]
    assert out[0].solution.coeffs.shape[0] == 2
    assert out[1].solution.coeffs.shape[0] == 1
