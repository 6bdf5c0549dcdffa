"""Distributed VECTOR elasticity == single-device (SURVEY.md section 4 #5/#6).

The sharded block coarse stage (component-wise halo CG / distributed
V-cycle) plus the slab-sharded coupled block LSE must reproduce the
single-device ``hybrid_solve_elastic`` / ``hybrid_solve_elastic_3d``
results to solver tolerance on the 8-virtual-device CPU mesh — the vector
analog of ``test_sharded2d.py``/``test_sharded3d.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.elastic import (
    ElasticConfig2D, ElasticSolver2D, evaluate_elastic_2d,
    get_elastic_problem, hybrid_solve_elastic, prepare_shared_elastic,
)
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.sharded_elastic import (
    make_sharded_evaluate_elastic_2d, make_sharded_solve_elastic_2d,
    make_sharded_solve_elastic_3d,
)


def _single_device_2d(problem, cfg):
    shared = prepare_shared_elastic(problem, cfg)
    return hybrid_solve_elastic(problem, cfg, shared)


@pytest.mark.parametrize("n_dev,precond", [(2, "jacobi"), (8, "auto")])
def test_sharded_elastic_2d_matches_single_device(n_dev, precond):
    # n_dev=8 with ny=16 routes 'auto' -> the component-wise distributed
    # V-cycle (ny % (2*8) == 0); n_dev=2 exercises plain Jacobi halo CG.
    p = get_elastic_problem("sin_elastic_2d")
    cfg = ElasticConfig2D(nx=16, ny=16, M=4, n_colloc=4,
                          dtype="float64", precond=precond)
    ref = _single_device_2d(p, cfg)
    mesh = pmesh.element_mesh(n_devices=n_dev)
    out = make_sharded_solve_elastic_2d(p, cfg, mesh)()
    assert bool(jnp.all(out.solve_ok))
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(ref.coeffs),
                               rtol=0, atol=1e-9)
    grid = out.assemble_fem_grid(total_ny=cfg.ny)
    np.testing.assert_allclose(grid, np.asarray(ref.fem_values),
                               rtol=0, atol=1e-10)


def test_sharded_elastic_2d_inhomogeneous_dirichlet():
    # poly_elastic_2d: g != 0 on every edge exercises the slab-global
    # boundary override masks.
    p = get_elastic_problem("poly_elastic_2d")
    cfg = ElasticConfig2D(nx=8, ny=8, M=4, n_colloc=4,
                          dtype="float64", precond="jacobi")
    ref = _single_device_2d(p, cfg)
    mesh = pmesh.element_mesh(n_devices=4)
    out = make_sharded_solve_elastic_2d(p, cfg, mesh)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(ref.coeffs),
                               rtol=0, atol=1e-9)


def test_sharded_elastic_2d_pads_nondivisible_rows():
    # ny=6 over 4 devices: ceil-padded tail rows must be masked out, not
    # pollute the true element rows.
    p = get_elastic_problem("sin_elastic_2d")
    cfg = ElasticConfig2D(nx=8, ny=6, M=4, n_colloc=4,
                          dtype="float64", precond="jacobi")
    ref = _single_device_2d(p, cfg)
    mesh = pmesh.element_mesh(n_devices=4)
    out = make_sharded_solve_elastic_2d(p, cfg, mesh)()
    assert out.coeffs.shape == (2, 6, 8, 4, 4)
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(ref.coeffs),
                               rtol=0, atol=1e-9)


def test_sharded_elastic_2d_evaluate_matches_local():
    p = get_elastic_problem("sin_elastic_2d")
    cfg = ElasticConfig2D(nx=8, ny=8, M=4, n_colloc=4,
                          dtype="float64", precond="jacobi")
    mesh = pmesh.element_mesh(n_devices=4)
    out = make_sharded_solve_elastic_2d(p, cfg, mesh)()
    ev = make_sharded_evaluate_elastic_2d(p, cfg, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 200))
    y = jnp.asarray(rng.uniform(-1, 1, 200))
    u1, u2 = ev(out.coeffs, x, y)
    ref = _single_device_2d(p, cfg)
    r1, r2 = evaluate_elastic_2d(ref, x, y)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(r1),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(r2),
                               rtol=0, atol=1e-9)
    # and the distributed solve is actually accurate, not just consistent
    # (8^2 grid: the O(h^2) displacement floor is ~0.17 for this problem)
    e1 = float(jnp.max(jnp.abs(u1 - p.exact1(x, y))))
    assert e1 < 0.3


def test_sharded_elastic_2d_lift_only_matches_single_device():
    """Since round 5 the sharded path CARRIES trace_lift (gathered-grid
    per-component lift) instead of refusing it — lift without richardson
    must equal the single-device lift-only run."""
    from hybrid_fem_lssvr_tpu.models.elastic import (
        hybrid_solve_elastic, prepare_shared_elastic,
    )

    p = get_elastic_problem("sin_elastic_2d")
    cfg = ElasticConfig2D(nx=8, ny=8, M=4, n_colloc=4, dtype="float64",
                          precond="jacobi", trace_lift=4)
    single = hybrid_solve_elastic(p, cfg, prepare_shared_elastic(p, cfg))
    out = make_sharded_solve_elastic_2d(p, cfg,
                                        pmesh.element_mesh(2))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-12)


@pytest.mark.parametrize("n_dev,precond", [(2, "auto"), (4, "jacobi")])
def test_sharded_elastic_3d_matches_single_device(n_dev, precond):
    # n_dev=2 with nz=8 routes 'auto' -> the component-wise distributed
    # V-cycle (nz % (2*2) == 0); n_dev=4 exercises Jacobi plane-halo CG.
    from hybrid_fem_lssvr_tpu.models.elastic3d import (
        ElasticConfig3D, get_elastic_problem_3d, hybrid_solve_elastic_3d,
        prepare_shared_elastic_3d,
    )

    p = get_elastic_problem_3d("sin_elastic_3d")
    cfg = ElasticConfig3D(nx=8, ny=8, nz=8, M=3, n_colloc=3,
                          dtype="float64", precond=precond)
    shared = prepare_shared_elastic_3d(p, cfg)
    ref = hybrid_solve_elastic_3d(p, cfg, shared)
    mesh = pmesh.element_mesh(n_devices=n_dev)
    out = make_sharded_solve_elastic_3d(p, cfg, mesh)()
    assert bool(jnp.all(out.solve_ok))
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(ref.coeffs),
                               rtol=0, atol=1e-9)


def test_sharded_elastic_3d_evaluate_matches_local():
    from hybrid_fem_lssvr_tpu.models.elastic3d import (
        ElasticConfig3D, evaluate_elastic_3d, get_elastic_problem_3d,
        hybrid_solve_elastic_3d, prepare_shared_elastic_3d,
    )
    from hybrid_fem_lssvr_tpu.parallel.sharded_elastic import (
        make_sharded_evaluate_elastic_3d,
    )

    p = get_elastic_problem_3d("sin_elastic_3d")
    cfg = ElasticConfig3D(nx=4, ny=4, nz=4, M=3, n_colloc=3,
                          dtype="float64", precond="jacobi")
    mesh = pmesh.element_mesh(n_devices=2)
    out = make_sharded_solve_elastic_3d(p, cfg, mesh)()
    ev = make_sharded_evaluate_elastic_3d(p, cfg, mesh)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, 100))
    y = jnp.asarray(rng.uniform(-1, 1, 100))
    z = jnp.asarray(rng.uniform(-1, 1, 100))
    got = ev(out.coeffs, x, y, z)
    shared = prepare_shared_elastic_3d(p, cfg)
    ref = hybrid_solve_elastic_3d(p, cfg, shared)
    want = evaluate_elastic_3d(ref, x, y, z)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=0, atol=1e-9)


def test_sharded_elastic_3d_requires_divisible_nz():
    from hybrid_fem_lssvr_tpu.models.elastic3d import (
        ElasticConfig3D, get_elastic_problem_3d,
    )

    p = get_elastic_problem_3d("sin_elastic_3d")
    cfg = ElasticConfig3D(nx=4, ny=4, nz=6, M=3, n_colloc=3)
    mesh = pmesh.element_mesh(n_devices=4)
    with pytest.raises(ValueError):
        make_sharded_solve_elastic_3d(p, cfg, mesh)


def test_cli_elastic_mesh_slab(capsys):
    """`elastic --mesh slab` drives the distributed y-slab vector solve
    over the 8 virtual devices and emits the sharded metrics line."""
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["elastic", "--mesh", "slab", "--nx", "8", "--ny", "8",
              "--M2", "4", "--eval-points", "200", "--precond",
              "jacobi", "--dtype", "float64", "--x64"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines if r.get("stage") == "elastic_solve_sharded"]
    assert rec, lines
    assert rec[0]["devices"] == 8
    assert rec[0]["n_fallback"] == 0
    assert rec[0]["linf_error"] < 0.3


def test_cli_elastic_richardson(capsys):
    """`elastic --coarse richardson --trace-lift 6` runs the high-order
    route end-to-end."""
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["elastic", "--nx", "16", "--ny", "16", "--M2", "6",
              "--coarse", "richardson", "--trace-lift", "6",
              "--eval-points", "400", "--dtype", "float64", "--x64"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines if r.get("stage") == "elastic_solve"]
    assert rec, lines
    assert rec[0]["linf_error"] < 6e-3  # measured 4.3e-3 at 16^2


def test_sharded_elastic_2d_richardson_lift_matches_single_device():
    """The O(h^4) vector route (coarse='richardson' + lifted traces)
    rides the distributed y-slab path (round 5): two distributed block
    solves at h and h/2 with aligned slabs + gathered-grid per-component
    lift == single-device to 1e-14 (probe: 1.2e-15 at 16^2)."""
    from hybrid_fem_lssvr_tpu.models import elastic as EL
    from hybrid_fem_lssvr_tpu.parallel.sharded_elastic import (
        make_sharded_solve_elastic_2d,
    )

    p = EL.get_elastic_problem("sin_elastic_2d")
    cfg = EL.ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6,
                             dtype="float64", precond="jacobi",
                             coarse="richardson", trace_lift=6)
    single = EL.hybrid_solve_elastic(
        p, cfg, EL.prepare_shared_elastic(p, cfg))
    out = make_sharded_solve_elastic_2d(p, cfg, pmesh.element_mesh(4))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-13)
    assert bool(jnp.all(out.solve_ok))


def test_sharded_elastic_3d_richardson_lift_matches_single_device():
    from hybrid_fem_lssvr_tpu.models import elastic3d as EL3
    from hybrid_fem_lssvr_tpu.parallel.sharded_elastic import (
        make_sharded_solve_elastic_3d,
    )

    p = EL3.get_elastic_problem_3d("sin_elastic_3d")
    cfg = EL3.ElasticConfig3D(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                              dtype="float64", precond="jacobi",
                              coarse="richardson", trace_lift=4)
    single = EL3.ElasticSolver3D(p, cfg).solve()
    out = make_sharded_solve_elastic_3d(p, cfg, pmesh.element_mesh(2))()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs), atol=1e-12)
    assert bool(jnp.all(out.solve_ok))
