"""Multi-chip tests on 8 virtual CPU devices (SURVEY.md section 4 #5).

The same shard_map code runs unmodified on real TPU slices; here the
collectives (ppermute halo, all_gather reduced system) execute against
XLA's CPU backend with --xla_force_host_platform_device_count=8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.sharded import make_sharded_solve


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_matches_single_device(n_dev):
    """Grid-independence: sharded == single-device coefficients."""
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=33, M=8, gamma=1e4)
    single = HybridSolver(problem, cfg)
    single.solve()

    m = pmesh.element_mesh(n_dev)
    run = make_sharded_solve(problem, cfg, m)
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(single.solution.coeffs),
        atol=1e-9,
    )
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("prob_name", ["poisson_1d", "helmholtz_1d",
                                       "advection_diffusion_1d",
                                       "variable_coeff_elliptic"])
def test_sharded_all_problems(prob_name):
    """Every problem family solves correctly under sharding, including the
    nonsymmetric and variable-coefficient paths."""
    problem = problems.get(prob_name)
    cfg = SolverConfig(num_nodes=41, M=8, gamma=1e4)
    single = HybridSolver(problem, cfg)
    single.solve()
    run = make_sharded_solve(problem, cfg, pmesh.element_mesh(4))
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(single.solution.coeffs),
        atol=1e-8,
    )


def test_sharded_fem_values_match():
    """Per-device nodal values agree with the global FEM solve."""
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=33)
    single = HybridSolver(problem, cfg)
    single.solve()
    fem = np.asarray(single.solution.fem_values)
    run = make_sharded_solve(problem, cfg, pmesh.element_mesh(4))
    out = run()
    fl = np.asarray(out.fem_local)  # [4, E_loc+1]
    E_loc = 32 // 4
    for d in range(4):
        np.testing.assert_allclose(
            fl[d], fem[d * E_loc:(d + 1) * E_loc + 1], atol=1e-10
        )


def test_sharded_dual_formulation():
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=33, formulation="dual")
    single = HybridSolver(problem, cfg)
    single.solve()
    run = make_sharded_solve(problem, cfg, pmesh.element_mesh(4))
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(single.solution.coeffs),
        atol=1e-8,
    )


@pytest.mark.parametrize("E", [32, 31])
def test_sharded_evaluate_matches_single_device(E):
    """Distributed read path (local shard eval + psum) == single-device
    evaluation, including out-of-domain clamped points and padded shards."""
    from hybrid_fem_lssvr_tpu.parallel.sharded import make_sharded_evaluate

    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=E + 1)
    single = HybridSolver(problem, cfg)
    single.solve()
    x = np.linspace(-1.2, 1.2, 301)
    u_ref = np.asarray(single.evaluate_solution(x))

    m = pmesh.element_mesh(4)
    run = make_sharded_solve(problem, cfg, m)
    out = run()
    ev = make_sharded_evaluate(problem, cfg, m)
    u = np.asarray(ev(out.coeffs, x))
    np.testing.assert_allclose(u, u_ref, atol=1e-11)


@pytest.mark.parametrize("E", [31, 29, 9])
def test_indivisible_element_count_padded(E):
    """Non-divisible element counts run with masked dummy padding (SURVEY.md
    section 4 #6) — including E=9 on 8 devices where whole tail slabs are
    dummy — and match the single-device solve exactly after slicing."""
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=E + 1)
    single = HybridSolver(problem, cfg)
    single.solve()
    run = make_sharded_solve(problem, cfg, pmesh.element_mesh(8))
    out = run()
    assert out.coeffs.shape[0] == E
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(single.solution.coeffs),
        atol=1e-9,
    )
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_pallas_enhancement_matches_xla(n_dev):
    """The fused separable kernel run PER SHARD inside shard_map (per-shard
    x0 as a traced kernel input, interpret mode on the virtual CPU mesh)
    equals the XLA shared-matmul enhancement."""
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=128 * n_dev + 1, M=8, dtype="float32")
    mesh = pmesh.element_mesh(n_dev)
    out_x = make_sharded_solve(problem, cfg, mesh,
                               enhance_backend="xla")()
    out_p = make_sharded_solve(problem, cfg, mesh,
                               enhance_backend="pallas-interpret")()
    np.testing.assert_allclose(np.asarray(out_p.coeffs),
                               np.asarray(out_x.coeffs), atol=3e-6)
    np.testing.assert_array_equal(np.asarray(out_p.solve_ok),
                                  np.asarray(out_x.solve_ok))
    np.testing.assert_allclose(np.asarray(out_p.bc_violation),
                               np.asarray(out_x.bc_violation), atol=3e-6)


def test_sharded_honors_fem_dtype():
    """cfg.fem_dtype='float64' runs the distributed assembly + SPIKE in
    f64 and casts nodal values back — without it a pure-f32 coarse solve
    is garbage past ~1e3 elements (kappa ~ N^2; measured linf 1.42 at
    E=2^20 on TPU before this was honored in the sharded path)."""
    from hybrid_fem_lssvr_tpu.parallel.sharded import make_sharded_evaluate

    E = 10000
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=E + 1, M=8, dtype="float32",
                       fem_dtype="float64")
    m = pmesh.element_mesh(8)
    out = make_sharded_solve(problem, cfg, m)()
    assert out.coeffs.dtype == jnp.float32
    ev = make_sharded_evaluate(problem, cfg, m)
    x = np.linspace(-1.0, 1.0, 5001)
    u = np.asarray(ev(jnp.asarray(out.coeffs), x))
    linf = np.abs(u - np.sin(np.pi * x)).max()
    assert linf < 5e-6, linf  # f32-coarse measures ~0.23 here


@pytest.mark.parametrize("prob_name", ["variable_coeff_elliptic",
                                       "advection_diffusion_1d"])
def test_sharded_varcoeff_pallas_matches_xla(prob_name):
    """Distributed variable-coefficient enhancement through the fused
    CGS2-QR kernel (graded mode, traced per-shard node positions) equals
    the XLA MGS-QR path — previously sharded varcoeff always fell back to
    the unfused XLA route."""
    problem = problems.get(prob_name)
    cfg = SolverConfig(num_nodes=128 * 2 + 1, M=8, dtype="float32")
    mesh = pmesh.element_mesh(2)
    out_x = make_sharded_solve(problem, cfg, mesh,
                               enhance_backend="xla")()
    out_p = make_sharded_solve(problem, cfg, mesh,
                               enhance_backend="pallas-interpret")()
    np.testing.assert_allclose(np.asarray(out_p.coeffs),
                               np.asarray(out_x.coeffs), atol=5e-5)
    np.testing.assert_array_equal(np.asarray(out_p.solve_ok),
                                  np.asarray(out_x.solve_ok))
    assert bool(jnp.all(out_p.solve_ok))
