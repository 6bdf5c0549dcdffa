"""2D sharded solve on virtual CPU devices (BASELINE config 5 multi-chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.hybrid2d import (
    HybridSolver2D, Solver2DConfig, poisson_2d,
)
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.sharded2d import make_sharded_solve_2d


@pytest.mark.parametrize("distributed_fem", [False, True])
@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_2d_matches_single_device(n_dev, distributed_fem):
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=8, ny=16, M=5, n_colloc=5, precond='jacobi')
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()

    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(n_dev),
                                distributed_fem=distributed_fem)
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=1e-9
    )
    np.testing.assert_allclose(
        out.assemble_fem_grid(total_ny=cfg.ny), np.asarray(sol.fem_values),
        atol=1e-10,
    )
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("precond", ["jacobi", "mg"])
def test_sharded_2d_compact_lift_matches_single_device(precond):
    """coarse='compact' + trace_lift rides the distributed y-slab path
    (compact local-4x4 halo apply + Numerov load; lift on the gathered
    nodal grid with GLOBAL Lagrange windows) == single-device O(h^4)."""
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, n_colloc=6, dtype="float64",
                         precond=precond, coarse="compact", trace_lift=6)
    sol = HybridSolver2D(problem, cfg).solve()
    out = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4))()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=1e-12
    )
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("shape,precond", [((2, 2), "jacobi"),
                                           ((2, 4), "mg")])
def test_grid_sharded_2d_compact_lift_matches_single_device(shape,
                                                            precond):
    """The O(h^4) compact+lift route on the 2-axis grid shards (round-5
    VERDICT task 5): Numerov block-halo apply + weighted load, lift on
    the double-all_gathered nodal grid, == single-device to ~1e-12."""
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_grid,
    )

    n_dy, n_dx = shape
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, n_colloc=6, dtype="float64",
                         precond=precond, coarse="compact", trace_lift=6)
    sol = HybridSolver2D(problem, cfg).solve()
    out = make_sharded_solve_2d_grid(problem, cfg,
                                     pmesh.grid_mesh(n_dy, n_dx))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=1e-11)
    np.testing.assert_allclose(out.assemble_fem_grid(),
                               np.asarray(sol.fem_values), atol=1e-11)
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("name", ["advection_diffusion_2d",
                                  "helmholtz_2d"])
def test_sharded_2d_nonspd_family_matches_single_device(name):
    """The generalized-operator families run the distributed BiCGStab
    coarse stage (psum inner products) — must match single-device."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d

    problem = get_problem_2d(name)
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond="jacobi")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4),
                                distributed_fem=True)
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=1e-8
    )
    assert bool(jnp.all(out.solve_ok))


def test_sharded_2d_varcoeff_matches_single_device():
    """Variable diffusion -div(a grad u): slab coefficient sampling in the
    distributed coarse stage + per-element operators in the sharded
    enhancement — must match single-device (jacobi preconditioner)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d

    problem = get_problem_2d("variable_coeff_elliptic_2d")
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond="jacobi")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4),
                                distributed_fem=True)
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=1e-8
    )
    assert bool(jnp.all(out.solve_ok))


def test_sharded_2d_varcoeff_distributed_mg_matches_single_device():
    """Distributed V-cycle with exact per-level coefficient re-sampling
    (lvl_offset=1 below the slab fine level) == single-device MG."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d

    problem = get_problem_2d("variable_coeff_elliptic_2d")
    cfg = Solver2DConfig(nx=16, ny=16, M=4, n_colloc=4, precond="mg")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4),
                                distributed_fem=True)
    out = run()
    # Slightly looser than the constant-coefficient MG test: the
    # distributed V-cycle applies the var-coeff operator in a different
    # order, so the f32 CG trajectories diverge at the e-8 level.
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=5e-8
    )
    np.testing.assert_allclose(
        out.assemble_fem_grid(total_ny=cfg.ny),
        np.asarray(sol.fem_values), atol=5e-9,
    )


def test_grid_sharded_2d_varcoeff_matches_single_device():
    """2-axis block sharding with variable diffusion: block coefficient
    sampling + per-element operators in the block enhancement."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_grid,
    )

    problem = get_problem_2d("variable_coeff_elliptic_2d")
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond="jacobi")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    out = make_sharded_solve_2d_grid(problem, cfg,
                                     pmesh.grid_mesh(2, 4))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=1e-8)
    assert bool(jnp.all(out.solve_ok))


def test_distributed_shifted_helmholtz_matches_single_device():
    """Indefinite Helmholtz on slabs: the distributed SPD-shifted V-cycle
    preconditioning distributed BiCGStab == the single-device shifted
    path ('auto' routes both)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import helmholtz_2d

    problem = helmholtz_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=4, n_colloc=4)  # auto -> shifted
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4),
                                distributed_fem=True)
    out = run()
    np.testing.assert_allclose(
        out.assemble_fem_grid(total_ny=cfg.ny),
        np.asarray(sol.fem_values), atol=5e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=5e-6
    )
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_multigrid_matches_single_device(n_dev):
    """Distributed V-cycle (slab smoothing + 2-row-halo restriction +
    gathered coarse levels) == the single-device MG solve."""
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=4, n_colloc=4, precond="mg")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(n_dev),
                                distributed_fem=True)
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=1e-10
    )
    np.testing.assert_allclose(
        out.assemble_fem_grid(total_ny=cfg.ny), np.asarray(sol.fem_values),
        atol=1e-11,
    )


@pytest.mark.parametrize("distributed_fem", [False, True])
def test_sharded_2d_indivisible_padded(distributed_fem):
    """ny=9 on 4 devices: masked tail padding, results match single-device
    after slicing (SURVEY.md section 4 #6)."""
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=8, ny=9, M=4, n_colloc=4, precond='jacobi')
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4),
                                distributed_fem=distributed_fem)
    out = run()
    assert out.coeffs.shape[0] == 9
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(sol.coeffs), atol=1e-9
    )


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_evaluate_2d_matches_single_device(n_dev):
    """Distributed 2D read path == single-device evaluate_2d (mirrors the
    1D make_sharded_evaluate contract), including clamped outside points."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import evaluate_2d
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_evaluate_2d,
    )

    problem = poisson_2d()
    cfg = Solver2DConfig(nx=8, ny=12, M=5, n_colloc=5, precond='jacobi')
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()

    mesh = pmesh.element_mesh(n_dev)
    run = make_sharded_solve_2d(problem, cfg, mesh)
    out = run()
    evaluate = make_sharded_evaluate_2d(problem, cfg, mesh)
    rng = np.random.default_rng(5)
    x = rng.uniform(-1.3, 1.3, 701)  # includes out-of-domain (clamped)
    y = rng.uniform(-1.3, 1.3, 701)
    u_dist = evaluate(out.coeffs, x, y)
    dtype = sol.xs.dtype
    u_single = evaluate_2d(sol, jnp.asarray(x, dtype), jnp.asarray(y, dtype))
    np.testing.assert_allclose(np.asarray(u_dist), np.asarray(u_single),
                               atol=1e-9)


@pytest.mark.parametrize("shape", [(2, 2), (2, 4), (4, 2), (1, 8)])
def test_grid_sharded_2d_matches_single_device(shape):
    """Fully 2-axis block sharding (SURVEY 7.1 L8): distributed coarse CG
    with row+column+corner halo exchange and block-global boundary masks
    == the single-device solve."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        poisson_2d_inhomogeneous,
    )
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_grid,
    )

    n_dy, n_dx = shape
    problem = poisson_2d_inhomogeneous()  # nonzero g: all 4 edge masks
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond='jacobi')
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()

    mesh = pmesh.grid_mesh(n_dy, n_dx)
    out = make_sharded_solve_2d_grid(problem, cfg, mesh)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=1e-9)
    assert bool(jnp.all(out.solve_ok))
    # Full observability: fem blocks stitch to the global grid; coarse
    # convergence surfaced per device.
    np.testing.assert_allclose(out.assemble_fem_grid(),
                               np.asarray(sol.fem_values), atol=1e-9)
    assert out.cg_iters.shape == (n_dy, n_dx)
    assert bool(jnp.all(out.cg_iters > 0))
    assert bool(jnp.all(jnp.isfinite(out.max_slack)))


@pytest.mark.parametrize("shape", [(2, 4), (2, 2)])
def test_grid_sharded_multigrid_matches_single_device(shape):
    """Distributed V-cycle on 2-axis blocks (block-halo restriction with
    corner-carrying column exchange + gathered serial coarse levels) ==
    the single-device MG solve, and 'auto' routes to it."""
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_grid,
    )

    n_dy, n_dx = shape
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=4, n_colloc=4, precond="mg")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    out = make_sharded_solve_2d_grid(problem, cfg,
                                     pmesh.grid_mesh(n_dy, n_dx))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=1e-9)
    np.testing.assert_allclose(out.assemble_fem_grid(),
                               np.asarray(sol.fem_values), atol=1e-10)
    assert bool(jnp.all(out.solve_ok))
    # auto routes to mg on an MG-eligible grid: same result.
    cfg_auto = Solver2DConfig(nx=16, ny=16, M=4, n_colloc=4)
    out_a = make_sharded_solve_2d_grid(problem, cfg_auto,
                                       pmesh.grid_mesh(n_dy, n_dx))()
    np.testing.assert_allclose(np.asarray(out_a.coeffs),
                               np.asarray(out.coeffs), atol=1e-12)


def test_grid_sharded_multigrid_mesh_independent_iterations():
    """CG iteration counts under the distributed block V-cycle stay flat
    as the grid refines (the defining multigrid property) — the Jacobi
    path's counts grow, so the comparison is meaningful."""
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_grid,
    )

    problem = poisson_2d()
    iters = {}
    for n in (16, 32, 64):
        cfg = Solver2DConfig(nx=n, ny=n, M=4, n_colloc=4, precond="mg")
        out = make_sharded_solve_2d_grid(problem, cfg,
                                         pmesh.grid_mesh(2, 4))()
        iters[n] = int(np.max(np.asarray(out.cg_iters)))
        assert bool(jnp.all(out.solve_ok))
    # Mesh-independence: iterations at 64^2 within 2x of 16^2 (Jacobi
    # grows ~4x per refinement level here).
    assert iters[64] <= 2 * iters[16], iters


def test_grid_sharded_shifted_helmholtz_matches_single_device():
    """Indefinite Helmholtz on 2-axis blocks: the distributed SPD-shifted
    block V-cycle preconditioning distributed BiCGStab == the
    single-device shifted path ('auto' routes both)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import helmholtz_2d
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_grid,
    )

    problem = helmholtz_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=4, n_colloc=4)  # auto -> shifted
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    out = make_sharded_solve_2d_grid(problem, cfg, pmesh.grid_mesh(2, 2))()
    np.testing.assert_allclose(out.assemble_fem_grid(),
                               np.asarray(sol.fem_values), atol=5e-7)
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=5e-6)
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("nx", [16, 13])
def test_distributed_adi_preconditioner_matches_single_device(nx):
    """precond='adi' in the slab-sharded solve: the in-shard_map
    all_to_all transpose + pad-aware Peaceman-Rachford sweeps (nx-1 not
    divisible by devices exercises the zero-pad path) == the
    single-device ADI solve."""
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=nx, ny=16, M=4, n_colloc=4, precond="adi")
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    run = make_sharded_solve_2d(problem, cfg, pmesh.element_mesh(4),
                                distributed_fem=True)
    out = run()
    np.testing.assert_allclose(
        out.assemble_fem_grid(total_ny=cfg.ny),
        np.asarray(sol.fem_values), atol=1e-11,
    )
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=2e-7)
    assert bool(jnp.all(out.solve_ok))


@pytest.mark.parametrize("prob_name", ["poisson_2d",
                                       "variable_coeff_elliptic_2d"])
def test_sharded_graded_2d_matches_single_device(prob_name):
    """Distributed graded tensor-product solve (slab node-array slicing
    through the per-element-scalar assembly) == the single-device graded
    path on a random non-uniform mesh, constant and variable
    coefficients."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d
    from hybrid_fem_lssvr_tpu.models.hybrid2d_graded import (
        HybridSolver2DGraded,
    )
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_graded,
    )

    rng = np.random.default_rng(7)

    def graded(n):
        w = rng.uniform(0.5, 2.0, n)
        t = np.concatenate([[0.0], np.cumsum(w)])
        return -1.0 + 2.0 * t / t[-1]

    xs, ys = graded(10), graded(8)
    problem = get_problem_2d(prob_name)
    cfg = Solver2DConfig(nx=10, ny=8, M=4, n_colloc=4, precond="jacobi")
    single = HybridSolver2DGraded(problem, cfg, xs, ys)
    sol = single.solve()
    out = make_sharded_solve_2d_graded(problem, cfg,
                                       pmesh.element_mesh(4), xs, ys)()
    # fem values match to ~1e-15; the enhancement's kappa (~gamma *
    # kappa(D)^2) amplifies that rounding difference into the coeffs.
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(sol.coeffs), atol=2e-7)
    np.testing.assert_allclose(out.assemble_fem_grid(),
                               np.asarray(sol.fem_values), atol=1e-12)
    assert bool(jnp.all(out.solve_ok))
    assert bool(jnp.all(out.cg_iters > 0))


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_grid_sharded_evaluate_matches_single_device(shape):
    from hybrid_fem_lssvr_tpu.models.hybrid2d import evaluate_2d
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_evaluate_2d_grid, make_sharded_solve_2d_grid,
    )

    n_dy, n_dx = shape
    problem = poisson_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond='jacobi')
    single = HybridSolver2D(problem, cfg)
    sol = single.solve()
    mesh = pmesh.grid_mesh(n_dy, n_dx)
    coeffs = make_sharded_solve_2d_grid(problem, cfg, mesh)().coeffs
    ev = make_sharded_evaluate_2d_grid(problem, cfg, mesh)
    rng = np.random.default_rng(9)
    x = rng.uniform(-1.2, 1.2, 501)
    y = rng.uniform(-1.2, 1.2, 501)
    u = ev(coeffs, x, y)
    dtype = sol.xs.dtype
    u_ref = evaluate_2d(sol, jnp.asarray(x, dtype), jnp.asarray(y, dtype))
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-9)


def test_graded_distributed_evaluate_matches_local():
    """Distributed graded read path (searchsorted on replicated node
    arrays, local-slab evaluation, psum) == the local graded evaluator,
    including out-of-domain clamps."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import get_problem_2d
    from hybrid_fem_lssvr_tpu.models.hybrid2d_graded import (
        HybridSolver2DGraded,
    )
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_evaluate_2d_graded, make_sharded_solve_2d_graded,
    )

    rng = np.random.default_rng(7)

    def graded(n):
        w = rng.uniform(0.5, 2.0, n)
        t = np.concatenate([[0.0], np.cumsum(w)])
        return -1.0 + 2.0 * t / t[-1]

    xs, ys = graded(10), graded(8)
    problem = get_problem_2d("poisson_2d")
    cfg = Solver2DConfig(nx=10, ny=8, M=4, n_colloc=4, precond="jacobi")
    m = pmesh.element_mesh(4)
    out = make_sharded_solve_2d_graded(problem, cfg, m, xs, ys)()
    single = HybridSolver2DGraded(problem, cfg, xs, ys)
    single.solve()
    xq = rng.uniform(-1.2, 1.2, 500)  # includes clamped queries
    yq = rng.uniform(-1.2, 1.2, 500)
    ev = make_sharded_evaluate_2d_graded(cfg, m, xs, ys)
    u_dist = np.asarray(ev(out.coeffs, xq, yq))
    u_loc = np.asarray(single.evaluate_solution(xq, yq))
    np.testing.assert_allclose(u_dist, u_loc, atol=5e-7)
