"""2D Poisson on structured quads (BASELINE.json config 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.hybrid2d import (
    HybridSolver2D, Solver2DConfig, evaluate_2d, poisson_2d,
    poisson_2d_inhomogeneous,
)
from hybrid_fem_lssvr_tpu.ops import assembly2d, cg
from hybrid_fem_lssvr_tpu.utils import metrics


def exact(x, y):
    return np.sin(np.pi * x) * np.sin(np.pi * y)


@pytest.fixture(scope="module")
def query(rng=None):
    r = np.random.default_rng(7)
    return r.uniform(-1, 1, 3000), r.uniform(-1, 1, 3000)


def test_q1_local_stiffness_properties():
    K = assembly2d.q1_local_stiffness(0.5, 0.25)
    np.testing.assert_allclose(K, K.T, atol=1e-14)  # symmetric
    np.testing.assert_allclose(K.sum(axis=1), 0.0, atol=1e-14)  # constants
    w = np.linalg.eigvalsh(K)
    assert w[0] > -1e-12 and w[1] > 1e-12  # PSD, rank 3


def test_apply_stiffness_matches_dense():
    """Matrix-free apply == dense assembly on a small grid."""
    ny1 = nx1 = 5
    K_loc = jnp.asarray(assembly2d.q1_local_stiffness(0.5, 0.5))
    rng = np.random.default_rng(0)
    # build dense A by applying to unit vectors
    A = np.zeros((ny1 * nx1, ny1 * nx1))
    for j in range(ny1 * nx1):
        e = np.zeros(ny1 * nx1)
        e[j] = 1.0
        A[:, j] = np.asarray(
            assembly2d.apply_stiffness(jnp.asarray(e.reshape(ny1, nx1)),
                                       K_loc)
        ).ravel()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    d = np.asarray(assembly2d.stiffness_diag((ny1, nx1), K_loc, jnp.float64))
    np.testing.assert_allclose(np.diag(A), d.ravel(), atol=1e-12)


def test_cg_solves_spd_system():
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.normal(size=(40, 40)))[0]
    A = Q @ np.diag(rng.uniform(1, 100, 40)) @ Q.T
    b = rng.normal(size=40)
    res = cg.cg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-13)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               atol=1e-9)


def test_fem_convergence_order2(query):
    xq, yq = query
    errs, hs = [], []
    for n in (8, 16, 32):
        s = HybridSolver2D(poisson_2d(),
                           Solver2DConfig(nx=n, ny=n, precond='jacobi'))
        sol = s.solve()
        nodal = np.abs(
            np.asarray(sol.fem_values)
            - exact(np.asarray(sol.xs)[None, :], np.asarray(sol.ys)[:, None])
        ).max()
        errs.append(nodal)
        hs.append(2.0 / n)
    order = metrics.convergence_order(hs, errs)
    assert 1.8 < order < 2.4, (order, errs)


def test_hybrid_2d_beats_nodal_floor(query):
    xq, yq = query
    s = HybridSolver2D(poisson_2d(), Solver2DConfig(nx=16, ny=16, M=6))
    sol = s.solve()
    linf, l2 = s.errors(xq, yq)
    nodal = np.abs(
        np.asarray(sol.fem_values)
        - exact(np.asarray(sol.xs)[None, :], np.asarray(sol.ys)[:, None])
    ).max()
    assert float(linf) < nodal  # enhancement helps
    assert float(sol.bc_violation.max()) < 1e-10  # trace pinned exactly
    assert bool(sol.solve_ok.all())


def test_hybrid_2d_convergence(query):
    xq, yq = query
    errs, hs = [], []
    for n in (8, 16, 32):
        s = HybridSolver2D(
            poisson_2d(),
            Solver2DConfig(nx=n, ny=n, M=6, precond='jacobi'),
        )
        s.solve()
        linf, _ = s.errors(xq, yq)
        errs.append(float(linf))
        hs.append(2.0 / n)
    order = metrics.convergence_order(hs, errs)
    assert order > 2.0, (order, errs)
    assert errs[-1] < 2.5e-3


def test_continuity_across_element_edges():
    """The pinned trace makes the enhanced solution globally continuous:
    evaluate on both sides of an interior element edge."""
    s = HybridSolver2D(poisson_2d(), Solver2DConfig(nx=8, ny=8))
    sol = s.solve()
    x_edge = float(sol.xs[3])
    ys_q = np.linspace(-0.9, 0.9, 17)
    eps = 1e-9
    ul = s.evaluate_solution(np.full_like(ys_q, x_edge - eps), ys_q)
    ur = s.evaluate_solution(np.full_like(ys_q, x_edge + eps), ys_q)
    np.testing.assert_allclose(np.asarray(ul), np.asarray(ur), atol=1e-6)


def test_evaluation_clamps_outside_domain():
    s = HybridSolver2D(poisson_2d(), Solver2DConfig(nx=4, ny=4))
    s.solve()
    u = s.evaluate_solution(np.array([-1.5, 1.5]), np.array([0.1, 0.1]))
    assert np.isfinite(np.asarray(u)).all()


def test_inhomogeneous_dirichlet_2d(query):
    """Nonzero g exercises the domain-boundary override masks end-to-end:
    the enhanced trace must match g exactly on boundary edges and the
    boundary-magnitude solve_ok gate must keep accurate elements."""
    xq, yq = query
    prob = poisson_2d_inhomogeneous()
    s = HybridSolver2D(prob, Solver2DConfig(nx=16, ny=16, M=6))
    sol = s.solve()
    linf, _ = s.errors(xq, yq)
    nodal = np.abs(
        np.asarray(sol.fem_values)
        - np.cos(np.pi * np.asarray(sol.xs))[None, :]
        * np.cos(np.pi * np.asarray(sol.ys))[:, None]
    ).max()
    assert float(linf) < nodal, (float(linf), nodal)
    assert bool(sol.solve_ok.all())
    # Enhanced solution reproduces g on the domain boundary.
    yb = np.linspace(-1.0, 1.0, 33)
    ub = s.evaluate_solution(np.full_like(yb, 1.0), yb)
    np.testing.assert_allclose(
        np.asarray(ub), np.cos(np.pi) * np.cos(np.pi * yb), atol=1e-8
    )


def test_pallas_solve_ok_gate_scales_with_boundary_data():
    """Regression for the self-referential gate (round-1 bug: the threshold
    scaled with the violation itself, so bcv=1e3 passed against its own
    inflated tolerance).  The gate must reject large violations at O(1)
    boundary data, accept small ones, scale with corner magnitude, and
    reject non-finite diagnostics."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import _pallas_solve_ok

    corners = tuple(jnp.full((1, 3), c) for c in (0.5, -1.0, 0.25, 0.75))
    slack = jnp.zeros(3)
    bcv = jnp.array([1e-6, 1e3, np.nan])
    ok = np.asarray(_pallas_solve_ok(slack, bcv, corners))
    assert ok.tolist() == [True, False, False]
    # scale = 1 + max|corner|: bcv just under 1e-2 * 2 passes, above fails
    bcv2 = jnp.array([0.019, 0.021, 0.019])
    ok2 = np.asarray(_pallas_solve_ok(slack, bcv2, corners))
    assert ok2.tolist() == [True, False, True]


def test_dual_formulation_2d_matches_primal(query):
    """2D dual (augmented quasi-definite kernel algebra) solves the same QP
    as the primal LSE path: solutions agree to solver tolerance (finite
    gamma makes them differ by O(1/gamma)) — BASELINE config 2's 'both
    formulations behind one API' applied to 2D."""
    xq, yq = query
    for prob in (poisson_2d(), poisson_2d_inhomogeneous()):
        base = dict(nx=12, ny=12, M=5, n_colloc=5)
        sp = HybridSolver2D(prob, Solver2DConfig(**base))
        sd = HybridSolver2D(prob, Solver2DConfig(formulation="dual",
                                                 **base))
        solp, sold = sp.solve(), sd.solve()
        assert bool(sold.solve_ok.all())
        up = np.asarray(sp.evaluate_solution(xq, yq))
        ud = np.asarray(sd.evaluate_solution(xq, yq))
        # Two effects bound the gap: finite gamma vs the LSE (gamma -> inf)
        # limit, O(1/gamma); and the augmented-inverse extraction accuracy
        # (~1e-3 relative on the operator, same cap as the 1D dual map —
        # see prepare_shared_host's dual note).  Both are far below the
        # coarse-stage discretisation error (~1e-3 here).
        np.testing.assert_allclose(ud, up, atol=2e-5)
    with pytest.raises(ValueError, match="formulation"):
        Solver2DConfig(formulation="primel")


def test_evaluate_2d_gradient(query):
    """Gradient evaluation vs exact grad(u) = pi (cos sin, sin cos)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import evaluate_2d_gradient

    xq, yq = np.asarray(query[0])[:500], np.asarray(query[1])[:500]
    s = HybridSolver2D(poisson_2d(), Solver2DConfig(nx=16, ny=16, M=6))
    s.solve()
    ux, uy = s.evaluate_gradient(xq, yq)
    ux_e = np.pi * np.cos(np.pi * xq) * np.sin(np.pi * yq)
    uy_e = np.pi * np.sin(np.pi * xq) * np.cos(np.pi * yq)
    # The trace is pinned to the BILINEAR FEM trace, so the tangential
    # derivative near element edges carries an O(h) max-norm error
    # (measured 0.76/0.41/0.17 at n=8/16/32) — the gradient is consistent,
    # first-order in max norm, much better in the element interiors.
    e16 = np.max(np.abs(np.asarray(ux) - ux_e))
    assert e16 < 0.6, e16
    assert np.max(np.abs(np.asarray(uy) - uy_e)) < 0.6
    s2 = HybridSolver2D(poisson_2d(), Solver2DConfig(nx=32, ny=32, M=6,
                                                     precond='jacobi'))
    s2.solve()
    ux2, _ = s2.evaluate_gradient(xq, yq)
    assert np.max(np.abs(np.asarray(ux2) - ux_e)) < 0.65 * e16


def test_rectangular_anisotropic_mesh(query):
    """nx != ny and hx != hy exercise the per-axis chain factors."""
    xq, yq = query
    s = HybridSolver2D(poisson_2d(), Solver2DConfig(nx=24, ny=12, M=6))
    sol = s.solve()
    linf, _ = s.errors(xq, yq)
    assert float(linf) < 5e-2
    assert bool(sol.solve_ok.all())
