"""Steady compact (tensor-Numerov) coarse scheme + spectral trace lift:
``Solver2DConfig(coarse='compact', trace_lift=6)`` lifts the 2D hybrid
floor from the Q1 bilinear O(h^2) to O(h^4) — beyond the reference's scope
(1D P1 only, Hybrid-FEM-LSSVR.py:117-145); the O(h^4) target mirrors the
reference's own 1D superconvergence floor (BASELINE.md h-sweep).

The operator pair is ``ops.assembly2d.q1_numerov_locals`` (shared with
TransientConfig.mass='numerov'); the lift is the eigen family's
``_lifted_trace_2d`` wired through ``Solver2DConfig.trace_lift``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import hybrid2d as H
from hybrid_fem_lssvr_tpu.ops import assembly2d


def _hybrid_linf(prob, cfg, n_query=151):
    bundle = H.prepare_shared_2d(prob, cfg)
    sol = H.hybrid_solve_2d(prob, cfg, bundle)
    xs = jnp.linspace(prob.domain[0], prob.domain[1], n_query)
    ys = jnp.linspace(prob.domain[2], prob.domain[3], n_query)
    XX, YY = jnp.meshgrid(xs, ys)
    u = H.evaluate_2d(sol, XX.ravel(), YY.ravel())
    err = float(jnp.max(jnp.abs(u - prob.exact(XX.ravel(), YY.ravel()))))
    return err, sol


def _nodal_linf(prob, sol):
    X, Y = jnp.meshgrid(sol.xs, sol.ys)
    return float(jnp.max(jnp.abs(sol.fem_values - prob.exact(X, Y))))


# ------------------------------------------------------------ local matrices


def test_numerov_locals_structure():
    hx, hy = 0.5, 0.25
    K_A, K_M = assembly2d.q1_numerov_locals(hx, hy, a0=2.0, c=3.0)
    # both symmetric; mass SPD; operator = a0*(KxMy + MxKy) + c*M
    np.testing.assert_allclose(K_A, K_A.T, atol=1e-14)
    np.testing.assert_allclose(K_M, K_M.T, atol=1e-14)
    assert np.linalg.eigvalsh(K_M)[0] > 0
    K_A0, _ = assembly2d.q1_numerov_locals(hx, hy, a0=2.0, c=0.0)
    np.testing.assert_allclose(K_A, K_A0 + 3.0 * K_M, atol=1e-13)
    # operator annihilates constants up to the reaction term: K_A0 @ 1 = 0
    np.testing.assert_allclose(K_A0.sum(axis=1), 0.0, atol=1e-13)
    # Numerov mass integrates constants exactly: sum = element area
    np.testing.assert_allclose(K_M.sum(), hx * hy, rtol=1e-14)


def test_numerov_mass_differs_from_consistent():
    # the compact scheme is NOT the consistent-mass Q1 scheme
    _, K_M = assembly2d.q1_numerov_locals(0.5, 0.5)
    Mc = assembly2d.q1_local_mass(0.5, 0.5)
    assert np.abs(np.asarray(K_M) - Mc).max() > 1e-3


# ------------------------------------------------------------------- orders


def test_compact_nodal_fourth_order():
    prob = H.poisson_2d()
    errs = []
    for n in (8, 16, 32):
        cfg = H.Solver2DConfig(nx=n, ny=n, M=6, coarse="compact")
        _, sol = _hybrid_linf(prob, cfg)
        errs.append(_nodal_linf(prob, sol))
    r1 = errs[0] / errs[1]
    r2 = errs[1] / errs[2]
    assert r1 > 11.0 and r2 > 11.0, (errs, r1, r2)  # O(h^4): ratio ~16
    assert errs[2] < 1e-5


def test_compact_lift_hybrid_fourth_order_poisson():
    prob = H.poisson_2d()
    errs = []
    for n in (16, 32):
        cfg = H.Solver2DConfig(nx=n, ny=n, M=6, coarse="compact",
                               trace_lift=6)
        e, sol = _hybrid_linf(prob, cfg)
        assert bool(sol.solve_ok.all())
        errs.append(e)
    assert errs[0] / errs[1] > 11.0, errs
    assert errs[1] < 1e-5  # measured 6.2e-6 (vs 3.2e-3 for q1)


@pytest.mark.parametrize("mk", [H.poisson_2d_inhomogeneous, H.helmholtz_2d,
                                H.reaction_diffusion_2d])
def test_compact_lift_other_families(mk):
    # inhomogeneous Dirichlet data, indefinite Helmholtz (shifted V-cycle
    # built from the compact locals), and reaction all keep O(h^4)
    prob = mk()
    e16, _ = _hybrid_linf(prob, H.Solver2DConfig(
        nx=16, ny=16, M=6, coarse="compact", trace_lift=6))
    e32, sol = _hybrid_linf(prob, H.Solver2DConfig(
        nx=32, ny=32, M=6, coarse="compact", trace_lift=6))
    assert e16 / e32 > 11.0, (e16, e32)
    assert e32 < 2e-5
    assert bool(sol.solve_ok.all())


def test_compact_mg_iterations_mesh_independent():
    prob = H.poisson_2d()
    iters = []
    for n in (16, 32, 64):
        cfg = H.Solver2DConfig(nx=n, ny=n, M=6, coarse="compact")
        _, sol = _hybrid_linf(prob, cfg)
        iters.append(int(sol.cg_iters))
    assert max(iters) <= iters[0] + 4, iters  # V-cycle stays flat (~8-10)


def test_lift_without_compact_stays_at_nodal_floor():
    # the lift interpolates the NODAL values; with the q1 coarse those are
    # O(h^2), so lifting buys nothing — documents why the pair matters
    prob = H.poisson_2d()
    e_lift, _ = _hybrid_linf(prob, H.Solver2DConfig(
        nx=32, ny=32, M=6, trace_lift=6))
    e_q1, _ = _hybrid_linf(prob, H.Solver2DConfig(nx=32, ny=32, M=6))
    assert e_lift > 0.3 * e_q1  # same O(h^2) class


# -------------------------------------------------------------------- gates


def test_compact_rejects_advection():
    prob = H.advection_diffusion_2d()
    cfg = H.Solver2DConfig(nx=16, ny=16, M=6, coarse="compact")
    with pytest.raises(ValueError, match="b == "):
        H.hybrid_solve_2d(prob, cfg, H.prepare_shared_2d(prob, cfg))


def test_compact_rejects_varcoeff():
    prob = H.variable_coeff_elliptic_2d()
    cfg = H.Solver2DConfig(nx=16, ny=16, M=6, coarse="compact")
    with pytest.raises(ValueError, match="constant diffusion"):
        H.hybrid_solve_2d(prob, cfg, H.prepare_shared_2d(prob, cfg))


def test_compact_rejects_natural_edges():
    prob = H.robin_2d()
    cfg = H.Solver2DConfig(nx=16, ny=16, M=6, coarse="compact")
    with pytest.raises(ValueError, match="all-Dirichlet"):
        H.hybrid_solve_2d(prob, cfg, H.prepare_shared_2d(prob, cfg))


def test_config_validation():
    with pytest.raises(ValueError, match="coarse"):
        H.Solver2DConfig(coarse="bogus")
    with pytest.raises(ValueError, match="trace_lift"):
        H.Solver2DConfig(trace_lift=1)
    with pytest.raises(ValueError, match="trace_lift"):
        H.Solver2DConfig(trace_lift=-2)
