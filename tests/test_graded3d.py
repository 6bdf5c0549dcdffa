"""Graded (non-uniform tensor-product) 3D hex meshes + adaptivity
(models/hybrid3d_graded.py) — 3D lift of the graded 2D path; capability
beyond the reference's uniform 1D meshes (Hybrid-FEM-LSSVR.py:120)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import hybrid3d as h3
from hybrid_fem_lssvr_tpu.models import hybrid3d_graded as hg
from hybrid_fem_lssvr_tpu.ops import assembly3d


@pytest.fixture(scope="module")
def query():
    r = np.random.default_rng(13)
    return (r.uniform(-1, 1, 800), r.uniform(-1, 1, 800),
            r.uniform(-1, 1, 800))


def test_reference_parts_identity_3d():
    """The tensor-product scaling of the reference 8x8 parts reproduces
    q1_local_operator_3d exactly for every coefficient combination."""
    Cxx, Cyy, Czz, Mh, Chx, Chy, Chz = assembly3d.q1_reference_parts_3d()
    for (hx, hy, hz, a0, c, bx, by, bz) in [
        (0.25, 0.5, 0.75, 1.0, 0.0, 0.0, 0.0, 0.0),
        (0.3, 0.2, 0.6, 2.0, 5.0, 1.5, -0.7, 0.4),
    ]:
        K = (a0 * (hy * hz / (2 * hx)) * Cxx
             + a0 * (hx * hz / (2 * hy)) * Cyy
             + a0 * (hx * hy / (2 * hz)) * Czz
             + c * (hx * hy * hz / 8) * Mh
             + bx * (hy * hz / 4) * Chx
             + by * (hx * hz / 4) * Chy
             + bz * (hx * hy / 4) * Chz)
        ref = assembly3d.q1_local_operator_3d(hx, hy, hz, a0, c,
                                              bx, by, bz)
        np.testing.assert_allclose(K, ref, atol=1e-14)


@pytest.mark.parametrize("name", [
    "poisson_3d_inhomogeneous",  # nonzero g: exercises the face masks
    "advection_diffusion_3d",  # b terms + BiCGStab coarse
    "variable_coeff_elliptic_3d",  # per-element coefficient sampling
])
def test_graded_equals_uniform_on_uniform_mesh(query, name):
    """With equal spacings the graded path must reproduce the uniform
    pipeline (same operators reached through the per-element-scalar
    assembly) for every problem family."""
    xq, yq, zq = query
    p = h3.get_problem_3d(name)
    cfg = h3.Solver3DConfig(nx=6, ny=6, nz=6, M=4, n_colloc=4,
                            precond="jacobi", backend="xla")
    su = h3.HybridSolver3D(p, cfg)
    solu = su.solve()
    xs = np.linspace(-1, 1, 7)
    sg = hg.HybridSolver3DGraded(p, cfg, xs, xs, xs)
    solg = sg.solve()
    assert bool(solg.solve_ok.all())
    np.testing.assert_allclose(np.asarray(solg.coeffs),
                               np.asarray(solu.coeffs), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(sg.evaluate_solution(xq, yq, zq)),
        np.asarray(su.evaluate_solution(xq, yq, zq)), atol=4e-6)


def test_graded_mesh_solves_and_converges(query):
    """Smoothly stretched mesh (clustered toward the origin): the solve
    stays healthy and refines at the expected rate."""
    xq, yq, zq = query
    p = h3.get_problem_3d("poisson_3d")
    errs = []
    for n in (6, 12):
        s = np.linspace(-1, 1, n + 1)
        xs = np.sign(s) * np.abs(s) ** 1.5
        cfg = h3.Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                                precond="jacobi", backend="xla")
        sg = hg.HybridSolver3DGraded(p, cfg, xs, s, s)
        sol = sg.solve()
        assert bool(sol.solve_ok.all())
        linf, _ = sg.errors(xq, yq, zq)
        errs.append(float(linf))
    assert errs[1] < 0.1, errs
    assert np.log2(errs[0] / errs[1]) > 1.2, errs


def test_mesh_larger_than_config_keeps_interior_slabs():
    """The domain-boundary g-override must key off the TRUE mesh extents,
    not the config's starting nx/ny/nz (the 2D regression, lifted)."""
    p = h3.get_problem_3d("poisson_3d")
    cfg = h3.Solver3DConfig(nx=4, ny=4, nz=4, M=4, n_colloc=4,
                            precond="jacobi", backend="xla")
    xs = np.array([-1.0, -2 / 3, -0.4, 0.0, 0.4, 2 / 3, 1.0])
    sg = hg.HybridSolver3DGraded(p, cfg, xs, xs, xs)  # 6^3, cfg 4^3
    sol = sg.solve()
    assert bool(sol.solve_ok.all())
    hx = np.diff(xs)
    scale = (((2 / hx) ** 2)[None, None, :]
             + ((2 / hx) ** 2)[None, :, None]
             + ((2 / hx) ** 2)[:, None, None])
    assert float((np.asarray(sol.max_slack) / scale).max()) < 0.2


def test_graded_variable_coeff_matches_uniform_assembler():
    """Graded coarse apply with a_var == the uniform variable-coefficient
    assembler on an equal-spacing mesh (independent code paths)."""
    p = h3.get_problem_3d("variable_coeff_elliptic_3d")
    cfg = h3.Solver3DConfig(nx=6, ny=6, nz=6, M=4, n_colloc=4,
                            precond="jacobi", cg_tol=1e-6)
    xs = jnp.linspace(-1, 1, 7)
    fu, _ = h3.fem_solve_3d(p, cfg, xs, xs, xs)
    fg, _ = hg.fem_solve_3d_graded(p, cfg, xs, xs, xs)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fu), atol=1e-5)


def test_adaptive_3d_reduces_error(query):
    xq, yq, zq = query
    res = hg.adaptive_solve_3d(
        h3.get_problem_3d("poisson_3d"),
        h3.Solver3DConfig(nx=6, ny=6, nz=6, M=4, n_colloc=4,
                          precond="jacobi", backend="xla"),
        rounds=2, refine_frac=0.3, eval_points=(xq, yq, zq),
    )
    assert len(res.history) == 3
    assert res.history[-1]["elements"] > res.history[0]["elements"]
    # normalised slack and error both improve over the run
    assert res.history[-1]["max_slack"] < res.history[0]["max_slack"]
    assert res.history[-1]["linf"] < res.history[0]["linf"]
    assert bool(res.solution.solve_ok.all())


def test_graded_gradient_matches_exact(query):
    """Graded gradient evaluation (per-element chain factors) vs the
    exact grad of sin(pi x) sin(pi y) sin(pi z) on a stretched mesh."""
    xq, yq, zq = query
    p = h3.get_problem_3d("poisson_3d")
    n = 10
    s = np.linspace(-1, 1, n + 1)
    xs = np.sign(s) * np.abs(s) ** 1.5
    cfg = h3.Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                            precond="jacobi", backend="xla")
    sg = hg.HybridSolver3DGraded(p, cfg, xs, s, s)
    sg.solve()
    ux, uy, uz = sg.evaluate_gradient(xq, yq, zq)
    pi = np.pi
    ex = pi * np.cos(pi * xq) * np.sin(pi * yq) * np.sin(pi * zq)
    ey = pi * np.sin(pi * xq) * np.cos(pi * yq) * np.sin(pi * zq)
    ez = pi * np.sin(pi * xq) * np.sin(pi * yq) * np.cos(pi * zq)
    # worst error sits on the coarsest boundary elements (the x^1.5
    # stretch coarsens toward +-1 where |u'| is largest): O(h_max)
    # derivative rate, as in the 2D graded test
    assert np.abs(np.asarray(ux) - ex).max() < 1.2
    assert np.abs(np.asarray(uy) - ey).max() < 1.2
    assert np.abs(np.asarray(uz) - ez).max() < 1.2


def test_graded_dual_equals_primal_3d(query):
    """Graded-hex dual formulation == primal (3D lift of the graded 2D
    dual equality; same QP, independent algebra)."""
    xq, yq, zq = query
    p = h3.get_problem_3d("poisson_3d")
    n = 6
    s = np.linspace(-1, 1, n + 1)
    xs = np.sign(s) * np.abs(s) ** 1.3
    sols = []
    for form in ("primal", "dual"):
        cfg = h3.Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                                precond="jacobi", backend="xla",
                                formulation=form)
        sg = hg.HybridSolver3DGraded(p, cfg, xs, s, s)
        sol = sg.solve()
        assert bool(sol.solve_ok.all())
        sols.append(np.asarray(sg.evaluate_solution(xq, yq, zq)))
    # finite gamma vs the LSE limit (O(1/gamma)) + augmented-inverse
    # extraction accuracy, as in the uniform 3D dual test — the M=4
    # collocation slack is O(1) against row scales ~(2/h)^2, so the
    # 1/gamma term sits at ~1e-5 here (measured 5e-6..2e-5)
    np.testing.assert_allclose(sols[1], sols[0], atol=2e-5)
