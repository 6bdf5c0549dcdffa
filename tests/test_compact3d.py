"""Steady compact (tensor-Numerov) coarse scheme + plane trace lift in 3D:
``Solver3DConfig(coarse='compact', trace_lift=6)`` lifts the 3D hybrid
floor from the Q1 trilinear O(h^2) to O(h^4) — beyond the reference's
scope (1D P1 only, Hybrid-FEM-LSSVR.py:117-145); the tensor extension of
the 2D pair in test_compact2d.py.

The operator pair is ``ops.assembly3d.q1_numerov_locals_3d`` (shared with
TransientConfig(mass='numerov') in 3D); the trace comes from
``hybrid3d._lifted_trace_3d`` (tensor-Lagrange interpolation within each
surface point's grid plane).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import hybrid3d as H
from hybrid_fem_lssvr_tpu.ops import assembly3d


def _hybrid_linf(prob, cfg, n_query=41):
    sol = H.hybrid_solve_3d(prob, cfg, H.prepare_shared_3d(prob, cfg))
    qs = jnp.linspace(prob.domain[0], prob.domain[1], n_query)
    X, Y, Z = jnp.meshgrid(qs, qs, qs)
    u = H.evaluate_3d(sol, X.ravel(), Y.ravel(), Z.ravel())
    err = float(jnp.max(jnp.abs(
        u - prob.exact(X.ravel(), Y.ravel(), Z.ravel()))))
    return err, sol


def _nodal_linf(prob, sol):
    # fem_values layout is [nz+1, ny+1, nx+1]
    X = sol.xs[None, None, :]
    Y = sol.ys[None, :, None]
    Z = sol.zs[:, None, None]
    return float(jnp.max(jnp.abs(sol.fem_values - prob.exact(X, Y, Z))))


# ------------------------------------------------------------ local matrices


def test_numerov_locals_structure_3d():
    hx, hy, hz = 0.5, 0.25, 0.4
    K_A, K_M = assembly3d.q1_numerov_locals_3d(hx, hy, hz, a0=2.0, c=3.0)
    np.testing.assert_allclose(K_A, K_A.T, atol=1e-14)
    np.testing.assert_allclose(K_M, K_M.T, atol=1e-14)
    assert np.linalg.eigvalsh(K_M)[0] > 0
    K_A0, _ = assembly3d.q1_numerov_locals_3d(hx, hy, hz, a0=2.0, c=0.0)
    np.testing.assert_allclose(K_A, K_A0 + 3.0 * K_M, atol=1e-13)
    # pure-diffusion operator annihilates constants
    np.testing.assert_allclose(K_A0.sum(axis=1), 0.0, atol=1e-13)
    # Numerov mass integrates constants exactly: sum = element volume
    np.testing.assert_allclose(K_M.sum(), hx * hy * hz, rtol=1e-14)


def test_numerov_mass_differs_from_consistent_3d():
    _, K_M = assembly3d.q1_numerov_locals_3d(0.5, 0.5, 0.5)
    m1c = (0.5 / 6.0) * np.array([[2.0, 1.0], [1.0, 2.0]])
    Mc = np.kron(m1c, np.kron(m1c, m1c))
    assert np.abs(np.asarray(K_M) - Mc).max() > 1e-3


# ------------------------------------------------------------------- orders


def test_compact_nodal_fourth_order_3d():
    prob = H.poisson_3d()
    errs = []
    for n in (8, 16):
        cfg = H.Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                               coarse="compact", dtype="float64")
        _, sol = _hybrid_linf(prob, cfg)
        errs.append(_nodal_linf(prob, sol))
    assert errs[0] / errs[1] > 13.0, errs  # O(h^4): ratio ~16
    assert errs[1] < 2e-4


def test_compact_lift_hybrid_fourth_order_3d():
    prob = H.poisson_3d()
    errs = []
    for n in (8, 16):
        cfg = H.Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                               coarse="compact", trace_lift=6,
                               dtype="float64")
        e, sol = _hybrid_linf(prob, cfg)
        assert bool(sol.solve_ok.all())
        errs.append(e)
    assert errs[0] / errs[1] > 11.0, errs
    assert errs[1] < 2e-4  # measured 1.0e-4 (vs ~3e-3 for q1 at n=16)


def test_compact_lift_inhomogeneous_3d():
    # nonzero Dirichlet trace: boundary surface points must still take g
    # exactly while interior traces come from the plane lift
    prob = H.poisson_3d_inhomogeneous()
    e8, _ = _hybrid_linf(prob, H.Solver3DConfig(
        nx=8, ny=8, nz=8, M=4, n_colloc=4, coarse="compact",
        trace_lift=6, dtype="float64"))
    e16, sol = _hybrid_linf(prob, H.Solver3DConfig(
        nx=16, ny=16, nz=16, M=4, n_colloc=4, coarse="compact",
        trace_lift=6, dtype="float64"))
    assert e8 / e16 > 10.0, (e8, e16)
    assert e16 < 3e-4
    assert bool(sol.solve_ok.all())


def test_lift_without_compact_stays_at_nodal_floor_3d():
    # lifting O(h^2) q1 nodal values buys nothing — documents why the
    # (compact coarse, lifted trace) PAIR is what reaches O(h^4)
    prob = H.poisson_3d()
    e_lift, _ = _hybrid_linf(prob, H.Solver3DConfig(
        nx=12, ny=12, nz=12, M=4, n_colloc=4, trace_lift=6,
        dtype="float64"))
    e_q1, _ = _hybrid_linf(prob, H.Solver3DConfig(
        nx=12, ny=12, nz=12, M=4, n_colloc=4, dtype="float64"))
    assert e_lift > 0.3 * e_q1


# -------------------------------------------------------------------- gates


def test_compact_rejects_advection_3d():
    prob = H.advection_diffusion_3d()
    cfg = H.Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                           coarse="compact")
    with pytest.raises(ValueError, match="b == "):
        H.hybrid_solve_3d(prob, cfg, H.prepare_shared_3d(prob, cfg))


def test_compact_rejects_varcoeff_3d():
    prob = H.variable_coeff_elliptic_3d()
    cfg = H.Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                           coarse="compact")
    with pytest.raises(ValueError, match="constant diffusion"):
        H.hybrid_solve_3d(prob, cfg, H.prepare_shared_3d(prob, cfg))


def test_compact_rejects_natural_faces_3d():
    prob = H.robin_3d()
    cfg = H.Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                           coarse="compact")
    with pytest.raises(ValueError, match="all-Dirichlet"):
        H.hybrid_solve_3d(prob, cfg, H.prepare_shared_3d(prob, cfg))


def test_config_validation_3d():
    with pytest.raises(ValueError, match="coarse"):
        H.Solver3DConfig(coarse="bogus")
    with pytest.raises(ValueError, match="trace_lift"):
        H.Solver3DConfig(trace_lift=1)
    with pytest.raises(ValueError, match="trace_lift"):
        H.Solver3DConfig(trace_lift=-2)
