"""Graded (non-uniform tensor-product) 2D meshes + adaptivity
(models/hybrid2d_graded.py) — capability beyond the reference's uniform
1D meshes (Hybrid-FEM-LSSVR.py:120), 2D analog of the 1D graded path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
from hybrid_fem_lssvr_tpu.models import hybrid2d_graded as hg
from hybrid_fem_lssvr_tpu.ops import assembly2d


@pytest.fixture(scope="module")
def query():
    r = np.random.default_rng(11)
    return r.uniform(-1, 1, 1500), r.uniform(-1, 1, 1500)


def test_reference_parts_identity():
    """The tensor-product scaling of the reference 4x4 parts reproduces
    q1_local_operator exactly for every coefficient combination."""
    Cxx, Cyy, Mh, Chx, Chy = assembly2d.q1_reference_parts()
    for (hx, hy, a0, c, bx, by) in [(0.25, 0.5, 1.0, 0.0, 0.0, 0.0),
                                    (0.3, 0.2, 2.0, 5.0, 1.5, -0.7)]:
        K = (a0 * (hy / hx) * Cxx + a0 * (hx / hy) * Cyy
             + c * (hx * hy / 4) * Mh + bx * (hy / 2) * Chx
             + by * (hx / 2) * Chy)
        ref = assembly2d.q1_local_operator(hx, hy, a0, c, bx, by)
        np.testing.assert_allclose(K, ref, atol=1e-14)


@pytest.mark.parametrize("name", [
    "poisson_2d_inhomogeneous",  # nonzero g: exercises the override masks
    "advection_diffusion_2d",  # b terms + BiCGStab coarse
    "variable_coeff_elliptic_2d",  # per-element coefficient sampling
])
def test_graded_equals_uniform_on_uniform_mesh(query, name):
    """With equal spacings the graded path must reproduce the uniform
    pipeline (same operators reached through the per-element-scalar
    assembly) for every problem family."""
    xq, yq = query
    p = h2.get_problem_2d(name)
    cfg = h2.Solver2DConfig(nx=8, ny=8, M=5, n_colloc=5, precond="jacobi")
    su = h2.HybridSolver2D(p, cfg)
    solu = su.solve()
    xs = np.linspace(-1, 1, 9)
    sg = hg.HybridSolver2DGraded(p, cfg, xs, xs)
    solg = sg.solve()
    assert bool(solg.solve_ok.all())
    np.testing.assert_allclose(np.asarray(solg.coeffs),
                               np.asarray(solu.coeffs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sg.evaluate_solution(xq, yq)),
                               np.asarray(su.evaluate_solution(xq, yq)),
                               atol=2e-6)


def test_graded_mesh_solves_and_converges(query):
    """Smoothly stretched mesh (clustered toward x = 0): the solve stays
    healthy and refines at the expected second-order rate."""
    xq, yq = query
    p = h2.get_problem_2d("poisson_2d")
    errs = []
    for n in (8, 16):
        s = np.linspace(-1, 1, n + 1)
        xs = np.sign(s) * np.abs(s) ** 1.5
        ys = np.linspace(-1, 1, n + 1)
        cfg = h2.Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6,
                                precond="jacobi")
        sg = hg.HybridSolver2DGraded(p, cfg, xs, ys)
        sol = sg.solve()
        assert bool(sol.solve_ok.all())
        linf, _ = sg.errors(xq, yq)
        errs.append(float(linf))
    assert errs[1] < 3e-2, errs
    assert np.log2(errs[0] / errs[1]) > 1.5, errs


def test_mesh_larger_than_config_keeps_interior_strips():
    """Regression: the domain-boundary g-override must key off the TRUE
    mesh extents, not the config's starting nx/ny — a refined mesh once
    zeroed the trace of interior strip cfg.nx-1, blowing up the fit."""
    p = h2.get_problem_2d("poisson_2d")
    cfg = h2.Solver2DConfig(nx=6, ny=6, M=4, n_colloc=4, precond="jacobi")
    xs = np.array([-1., -2 / 3, -0.5, -1 / 3, 0., 1 / 3, 0.5, 2 / 3, 1.])
    sg = hg.HybridSolver2DGraded(p, cfg, xs, xs)  # 8x8 elements, cfg 6x6
    sol = sg.solve()
    assert bool(sol.solve_ok.all())
    # un-fixed, interior column cfg.nx-1 showed slack ~ 85
    hx = np.diff(xs)
    scale = ((2 / hx) ** 2)[None, :] + ((2 / hx) ** 2)[:, None]
    assert float((np.asarray(sol.max_slack) / scale).max()) < 0.1


def test_graded_variable_coeff_matches_uniform_assembler():
    """Graded coarse apply with a_var == the uniform variable-coefficient
    assembler on an equal-spacing mesh (independent code paths)."""
    p = h2.get_problem_2d("variable_coeff_elliptic_2d")
    cfg = h2.Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond="jacobi",
                            cg_tol=1e-6)
    xs = jnp.linspace(-1, 1, 9)
    fu, _ = h2.fem_solve_2d(p, cfg, xs, xs)
    fg, _ = hg.fem_solve_2d_graded(p, cfg, xs, xs)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fu), atol=1e-5)


def test_adaptive_2d_reduces_error(query):
    xq, yq = query
    res = hg.adaptive_solve_2d(
        h2.get_problem_2d("poisson_2d"),
        h2.Solver2DConfig(nx=6, ny=6, M=4, n_colloc=4, precond="jacobi"),
        rounds=3, refine_frac=0.3, eval_points=(xq, yq),
    )
    assert len(res.history) == 4
    assert res.history[-1]["elements"] > res.history[0]["elements"]
    # normalised slack and error both improve over the run
    assert res.history[-1]["max_slack"] < 0.5 * res.history[0]["max_slack"]
    assert res.history[-1]["linf"] < 0.5 * res.history[0]["linf"]
    assert bool(res.solution.solve_ok.all())


def test_refine_axis_bisects_worst():
    nodes = np.array([0.0, 1.0, 3.0, 6.0])
    ind = np.array([0.1, 5.0, 0.2])
    out = hg.refine_axis(nodes, ind, refine_frac=0.3)  # ceil(0.9) = 1
    np.testing.assert_allclose(out, [0.0, 1.0, 2.0, 3.0, 6.0])


def test_graded_gradient_matches_exact(query):
    """Graded gradient evaluation (per-element chain factors) vs the exact
    grad of sin(pi x) sin(pi y) on a stretched mesh."""
    xq, yq = query
    p = h2.get_problem_2d("poisson_2d")
    n = 16
    s = np.linspace(-1, 1, n + 1)
    xs = np.sign(s) * np.abs(s) ** 1.5
    cfg = h2.Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6, precond="jacobi")
    sg = hg.HybridSolver2DGraded(p, cfg, xs, s)
    sg.solve()
    ux, uy = sg.evaluate_gradient(xq, yq)
    pi = np.pi
    ex = pi * np.cos(pi * xq) * np.sin(pi * yq)
    ey = pi * np.sin(pi * xq) * np.cos(pi * yq)
    # worst error sits on the coarsest boundary elements (the x^1.5
    # stretch clusters nodes at 0 and coarsens toward +-1 where |u'| is
    # largest): O(h_max) derivative rate, measured 0.53
    assert np.abs(np.asarray(ux) - ex).max() < 1.0
    assert np.abs(np.asarray(uy) - ey).max() < 1.0
    # interior median error far tighter than the worst-element bound
    assert np.median(np.abs(np.asarray(ux) - ex)) < 0.05


def test_graded_dual_equals_primal(query):
    """Graded-mesh dual formulation == primal (same QP through the
    augmented quasi-definite algebra; exercises cfg.formulation routing
    on the per-element graded operators)."""
    xq, yq = query
    p = h2.get_problem_2d("poisson_2d")
    n = 8
    s = np.linspace(-1, 1, n + 1)
    xs = np.sign(s) * np.abs(s) ** 1.3
    sols = []
    for form in ("primal", "dual"):
        cfg = h2.Solver2DConfig(nx=n, ny=n, M=5, n_colloc=5,
                                precond="jacobi", formulation=form)
        sg = hg.HybridSolver2DGraded(p, cfg, xs, s)
        sol = sg.solve()
        assert bool(sol.solve_ok.all())
        sols.append(np.asarray(sg.evaluate_solution(xq, yq)))
    np.testing.assert_allclose(sols[1], sols[0], atol=1e-8)
