"""Distributed composed-family solves (parallel/sharded_families.py) ==
single-device on virtual CPU devices — biharmonic chains, eigen,
steady semilinear (the round-3 symmetry gap: every SOURCE family rode
shard_map; the composed families did not)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.biharmonic import (
    sin_biharmonic_1d, sin_biharmonic_2d, solve_biharmonic_1d,
    solve_biharmonic_2d,
)
from hybrid_fem_lssvr_tpu.models.eigen import (EigenConfig,
                                               exact_eigenvalues,
                                               hybrid_eigensolve)
from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig
from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig
from hybrid_fem_lssvr_tpu.models.nonlinear import (cubic_1d,
                                                   hybrid_solve_semilinear)
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
    make_sharded_eigensolve, make_sharded_solve_biharmonic_1d,
    make_sharded_solve_biharmonic_2d, make_sharded_solve_semilinear,
)
from hybrid_fem_lssvr_tpu import problems
from hybrid_fem_lssvr_tpu.ops import eval as ev


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_biharmonic_1d_matches_single_device(n_dev):
    p = sin_biharmonic_1d()
    cfg = SolverConfig(num_nodes=25, M=8, gamma=1e4, dtype="float64")
    single = solve_biharmonic_1d(p, cfg)
    out = make_sharded_solve_biharmonic_1d(p, cfg, pmesh.element_mesh(n_dev))()
    np.testing.assert_allclose(np.asarray(out.v.coeffs),
                               np.asarray(single.v.coeffs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.u.coeffs),
                               np.asarray(single.u.coeffs), atol=1e-9)
    assert bool(jnp.all(out.u.solve_ok)) and bool(jnp.all(out.v.solve_ok))


def test_sharded_biharmonic_1d_hits_hybrid_floor():
    """End-to-end accuracy through the distributed chain (not just
    equality): the 25-node simply-supported beam rides the hybrid floor
    (~1.6e-9 single-device, test_biharmonic.py)."""
    p = sin_biharmonic_1d()
    cfg = SolverConfig(num_nodes=25, M=8, gamma=1e4, dtype="float64")
    out = make_sharded_solve_biharmonic_1d(p, cfg, pmesh.element_mesh(4))()
    x = jnp.linspace(-1.0, 1.0, 801, dtype=jnp.float64)
    nodes = jnp.linspace(-1.0, 1.0, cfg.num_nodes, dtype=jnp.float64)
    u = ev.evaluate(nodes, out.u.coeffs, x)
    assert float(jnp.max(jnp.abs(u - p.exact(x)))) < 1e-8


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_biharmonic_2d_matches_single_device(n_dev):
    p = sin_biharmonic_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=5, n_colloc=5, dtype="float64",
                         precond="jacobi")
    single = solve_biharmonic_2d(p, cfg)
    out = make_sharded_solve_biharmonic_2d(p, cfg, pmesh.element_mesh(n_dev))()
    np.testing.assert_allclose(np.asarray(out.v.coeffs),
                               np.asarray(single.v.coeffs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.u.coeffs),
                               np.asarray(single.u.coeffs), atol=1e-9)
    assert bool(jnp.all(out.u.solve_ok)) and bool(jnp.all(out.v.solve_ok))


def test_sharded_biharmonic_2d_compact_lift_fourth_order():
    """The distributed plate chain carries the O(h^4) compact+lift route
    (round-4 fix: the sharded 2D solve used to silently ignore
    cfg.coarse/cfg.trace_lift and degrade to the Q1 floor — 8.8e-3 at
    16^2 instead of this test's ~2e-4)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solution2D, evaluate_2d

    p = sin_biharmonic_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, n_colloc=6, dtype="float64",
                         precond="jacobi", coarse="compact", trace_lift=6)
    out = make_sharded_solve_biharmonic_2d(p, cfg, pmesh.element_mesh(4))()
    rng = np.random.default_rng(4)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    grid = jnp.linspace(-1.0, 1.0, 17, dtype=jnp.float64)
    su = Solution2D(grid, grid, None, jnp.asarray(out.u.coeffs),
                    0, 0.0, None, None, out.u.solve_ok)
    u = evaluate_2d(su, xq, yq)
    err = float(jnp.max(jnp.abs(u - p.exact(xq, yq))))
    assert err < 5e-4, err  # single-device floor: 1.97e-4 at 16^2
    assert bool(jnp.all(out.u.solve_ok))


def test_sharded_2d_graded_rejects_compact_loudly():
    """The graded path must fail loudly on coarse='compact'/trace_lift
    instead of silently running Q1 (the 2-axis grid path CARRIES the
    compact route since round 5 — test_sharded2d.py)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import poisson_2d
    from hybrid_fem_lssvr_tpu.parallel.sharded2d import (
        make_sharded_solve_2d_graded,
    )

    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, dtype="float64",
                         coarse="compact", trace_lift=6)
    xs = np.linspace(-1, 1, 9)
    with pytest.raises(NotImplementedError, match="loudly"):
        make_sharded_solve_2d_graded(poisson_2d(), cfg,
                                     pmesh.element_mesh(2), xs, xs)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_eigensolve_matches_single_device(n_dev):
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float64")
    ecfg = EigenConfig(k=3, rq_iters=2)
    single = hybrid_eigensolve(p, cfg, ecfg)
    out = make_sharded_eigensolve(p, cfg, pmesh.element_mesh(n_dev), ecfg)()
    np.testing.assert_allclose(np.asarray(out.lams),
                               np.asarray(single.lams), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-9)
    assert bool(jnp.all(out.solve_ok))


def test_sharded_eigensolve_compiles_once():
    """Round-4 VERDICT Weak #1: the whole eigensolve — k pairs x
    rq_iters Rayleigh rounds — reuses ONE compiled executable (the shift
    is a traced scalar and the loops are in-program lax.scans), instead
    of k * rq_iters distinct XLA programs."""
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float64")
    run = make_sharded_eigensolve(p, cfg, pmesh.element_mesh(4),
                                  EigenConfig(k=4, rq_iters=3))
    out = run()
    assert run.jitted._cache_size() == 1
    assert bool(jnp.all(out.solve_ok))
    # and the compiled program is still correct at k=4
    ex = exact_eigenvalues(p, 4)
    assert np.max(np.abs(np.asarray(out.lams) - ex)) < 1e-9


def test_sharded_eigensolve_hits_f64_floor():
    """Distributed eigenvalues against the EXACT spectrum (not just
    equality with single-device): machine floor from a 32-element mesh."""
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float64")
    out = make_sharded_eigensolve(p, cfg, pmesh.element_mesh(4),
                                  EigenConfig(k=3, rq_iters=2))()
    ex = exact_eigenvalues(p, 3)
    assert np.max(np.abs(np.asarray(out.lams) - ex)) < 1e-10


@pytest.mark.parametrize("scheme", ["p1", "numerov"])
def test_sharded_semilinear_matches_single_device(scheme):
    p = cubic_1d()
    cfg = SolverConfig(num_nodes=33, M=8, gamma=1e4, dtype="float64")
    single = hybrid_solve_semilinear(p, cfg, scheme=scheme)
    out = make_sharded_solve_semilinear(p, cfg, pmesh.element_mesh(4),
                                        scheme=scheme)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.fem_values),
                               np.asarray(single.fem_values), atol=1e-12)
    np.testing.assert_allclose(float(out.colloc_residual),
                               float(single.colloc_residual),
                               rtol=1e-6, atol=1e-12)
    assert bool(jnp.all(out.solve_ok))


def test_sharded_families_reject_indivisible_meshes():
    """Loud errors, not silent padding, on the exact-slab paths."""
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=34, M=8, dtype="float64")  # E=33
    with pytest.raises(ValueError, match="divide"):
        make_sharded_eigensolve(p, cfg, pmesh.element_mesh(4))
    with pytest.raises(ValueError, match="divide"):
        make_sharded_solve_semilinear(cubic_1d(), cfg,
                                      pmesh.element_mesh(4))


# ------------------------------------------------ round-5 up-dimensioning
#
# The round-4 VERDICT (Missing #3): eigen, steady semilinear, and
# biharmonic were distributed only in their lowest dimensions.  Every
# factory below must equal its single-device family solver on the
# virtual mesh — and the eigen factories must do it with ONE compiled
# program across all (pair, Rayleigh-round) iterations.


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(scheme="numerov", trace_lift=4),
])
def test_sharded_semilinear_2d_matches_single_device(kwargs):
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_2d, hybrid_solve_semilinear_2d)
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_solve_semilinear_2d)

    p = cubic_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, dtype="float64")
    single = hybrid_solve_semilinear_2d(p, cfg, n_newton=6,
                                        n_newton_elem=4, **kwargs)
    out = make_sharded_solve_semilinear_2d(
        p, cfg, pmesh.element_mesh(4), n_newton=6, n_newton_elem=4,
        **kwargs)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=5e-8)
    np.testing.assert_allclose(np.asarray(out.fem_values),
                               np.asarray(single.fem_values), atol=1e-12)
    assert bool(jnp.all(out.solve_ok))


def test_sharded_semilinear_3d_matches_single_device():
    from hybrid_fem_lssvr_tpu.models.hybrid3d import Solver3DConfig
    from hybrid_fem_lssvr_tpu.models.nonlinear import (
        cubic_3d, hybrid_solve_semilinear_3d)
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_solve_semilinear_3d)

    p = cubic_3d()
    cfg = Solver3DConfig(nx=4, ny=4, nz=4, M=3, n_colloc=3,
                         dtype="float64")
    single = hybrid_solve_semilinear_3d(p, cfg, n_newton=4,
                                        n_newton_elem=3)
    out = make_sharded_solve_semilinear_3d(
        p, cfg, pmesh.element_mesh(2), n_newton=4, n_newton_elem=3)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=5e-8)
    assert bool(jnp.all(out.solve_ok))


def test_sharded_eigensolve_2d_matches_single_device_compile_once():
    from hybrid_fem_lssvr_tpu.models.eigen import hybrid_eigensolve_2d
    from hybrid_fem_lssvr_tpu.models.hybrid2d import poisson_2d
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_eigensolve_2d)

    p = poisson_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, dtype="float64")
    ecfg = EigenConfig(k=2, rq_iters=2, trace_lift=4)
    single = hybrid_eigensolve_2d(p, cfg, ecfg)
    run = make_sharded_eigensolve_2d(p, cfg, pmesh.element_mesh(4), ecfg)
    out = run()
    np.testing.assert_allclose(np.asarray(out.lams),
                               np.asarray(single.lams), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-10)
    assert bool(jnp.all(out.solve_ok))
    # k * rq_iters = 4 invocations, ONE XLA program (the shift enters
    # through the traced shared-bundle values, never the program text).
    assert run.jitted._cache_size() == 1


def test_sharded_eigensolve_3d_matches_single_device_compile_once():
    from hybrid_fem_lssvr_tpu.models.eigen import hybrid_eigensolve_3d
    from hybrid_fem_lssvr_tpu.models.hybrid3d import (Solver3DConfig,
                                                      poisson_3d)
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_eigensolve_3d)

    p = poisson_3d()
    cfg = Solver3DConfig(nx=4, ny=4, nz=4, M=3, n_colloc=3,
                         dtype="float64")
    ecfg = EigenConfig(k=2, rq_iters=1)
    single = hybrid_eigensolve_3d(p, cfg, ecfg)
    run = make_sharded_eigensolve_3d(p, cfg, pmesh.element_mesh(2), ecfg)
    out = run()
    np.testing.assert_allclose(np.asarray(out.lams),
                               np.asarray(single.lams), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-10)
    assert bool(jnp.all(out.solve_ok))
    assert run.jitted._cache_size() == 1


def test_sharded_biharmonic_3d_matches_single_device():
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        sin_biharmonic_3d, solve_biharmonic_3d)
    from hybrid_fem_lssvr_tpu.models.hybrid3d import Solver3DConfig
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_solve_biharmonic_3d)

    p = sin_biharmonic_3d()
    cfg = Solver3DConfig(nx=4, ny=4, nz=4, M=3, n_colloc=3,
                         dtype="float64", precond="jacobi")
    single = solve_biharmonic_3d(p, cfg)
    out = make_sharded_solve_biharmonic_3d(p, cfg,
                                           pmesh.element_mesh(2))()
    np.testing.assert_allclose(np.asarray(out.v.coeffs),
                               np.asarray(single.v.coeffs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.u.coeffs),
                               np.asarray(single.u.coeffs), atol=1e-9)
    assert bool(jnp.all(out.u.solve_ok)) and bool(jnp.all(out.v.solve_ok))


def test_updimensioned_families_reject_indivisible_meshes():
    from hybrid_fem_lssvr_tpu.models.hybrid3d import Solver3DConfig
    from hybrid_fem_lssvr_tpu.models.hybrid2d import poisson_2d
    from hybrid_fem_lssvr_tpu.models.nonlinear import cubic_2d, cubic_3d
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_eigensolve_2d, make_sharded_solve_semilinear_2d,
        make_sharded_solve_semilinear_3d)

    cfg = Solver2DConfig(nx=8, ny=6, M=4, n_colloc=4, dtype="float64")
    with pytest.raises(ValueError, match="divide"):
        make_sharded_eigensolve_2d(poisson_2d(), cfg,
                                   pmesh.element_mesh(4))
    with pytest.raises(ValueError, match="divide"):
        make_sharded_solve_semilinear_2d(cubic_2d(), cfg,
                                         pmesh.element_mesh(4))
    cfg3 = Solver3DConfig(nx=4, ny=4, nz=3, M=3, n_colloc=3,
                          dtype="float64")
    with pytest.raises(ValueError, match="divide"):
        make_sharded_solve_semilinear_3d(cubic_3d(), cfg3,
                                         pmesh.element_mesh(2))


def test_cli_eig_2d_slab(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["eig", "--dim", "2", "--nx", "8", "--ny", "8",
              "--M2", "4", "--k", "2", "--mesh", "slab", "--x64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "eigensolve"
    assert rec["devices"] >= 2
    assert rec["enhanced_lam_err"][0] < 1e-4


def test_cli_nonlinear_2d_slab(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["nonlinear", "--problem", "cubic_2d", "--nx", "8",
              "--ny", "8", "--M2", "6", "--mesh", "slab", "--x64",
              "--eval-points", "200"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "semilinear_solve"
    assert rec["devices"] >= 2
    assert rec["n_fallback"] == 0
    assert rec["linf_error"] < 0.2  # p1 coarse trace floor at 8^2


def test_sharded_biharmonic_rerun_reuses_stage_u(monkeypatch):
    """ADVICE r4 #4: run_v() is deterministic for a fixed factory, so
    repeated run() calls must NOT rebuild (re-jit) the stage-u program —
    asserted by counting make_sharded_solve invocations."""
    import hybrid_fem_lssvr_tpu.parallel.sharded_families as SF

    calls = {"n": 0}
    orig = SF.make_sharded_solve

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(SF, "make_sharded_solve", counting)
    p = sin_biharmonic_1d()
    cfg = SolverConfig(num_nodes=17, M=6, gamma=1e4, dtype="float64")
    run = SF.make_sharded_solve_biharmonic_1d(p, cfg,
                                              pmesh.element_mesh(2))
    n_after_factory = calls["n"]  # stage v built at factory time
    a = run()
    b = run()
    assert calls["n"] == n_after_factory + 1  # stage u built ONCE
    np.testing.assert_allclose(np.asarray(a.u.coeffs),
                               np.asarray(b.u.coeffs), rtol=0, atol=0)


def test_sharded_clamped_plate_matches_single_device():
    """Distributed clamped plate (round 5): replicated BFS coarse +
    y-slab-sharded fourth-order enhancement == single-device (probe:
    2.2e-19 at 16^2 M=10)."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        clamped_sin2_2d, solve_clamped_biharmonic_2d)
    from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
        make_sharded_solve_clamped_2d)

    p = clamped_sin2_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=10, n_colloc=10,
                         dtype="float64")
    single = solve_clamped_biharmonic_2d(p, cfg)
    out = make_sharded_solve_clamped_2d(p, cfg, pmesh.element_mesh(4))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-14)
    assert bool(jnp.all(out.solve_ok))
    with pytest.raises(ValueError, match="divide"):
        make_sharded_solve_clamped_2d(
            p, Solver2DConfig(nx=16, ny=6, M=10, n_colloc=10,
                              dtype="float64"), pmesh.element_mesh(4))


def test_sharded_eigensolve_f32_stays_at_f32_floor():
    """The 1D eigen family is NOT f32-gated; the compile-once rewrite
    moved its f32 enhancement from host-f64 shared factors to on-device
    f32 null-space QR — this gate pins the f32 route at the documented
    quotient floor (single-device gate: 5e-5,
    test_eigen.py::test_f32_pipeline_reaches_f32_floor)."""
    from hybrid_fem_lssvr_tpu.models.eigen import exact_eigenvalues

    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float32")
    out = make_sharded_eigensolve(p, cfg, pmesh.element_mesh(4),
                                  EigenConfig(k=2))()
    ex = exact_eigenvalues(p, 2)
    errs = np.abs(np.asarray(out.lams) - ex)
    assert np.all(errs < 5e-5), errs
    assert bool(jnp.all(out.solve_ok))
