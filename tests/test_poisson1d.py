"""End-to-end reference-parity tests on 1D Poisson (SURVEY.md section 4 #1-2).

Measured reference baselines (BASELINE.md, reference __main__ config
Hybrid-FEM-LSSVR.py:216-220): hybrid Linf 3.274e-6 at 25 nodes / M=8 /
gamma=1e4; FEM-only Linf 8.47e-3; O(h^4) hybrid convergence at E=4..32.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
from hybrid_fem_lssvr_tpu.utils import metrics


TEST_POINTS = np.linspace(-1, 1, 201)  # reference __main__ grid (:217)


def solve_errors(num_nodes, M=8, gamma=1e4, formulation="primal",
                 quad_order=3):
    """quad_order=2 is 'reference-parity mode': it reproduces the inexact
    load quadrature of the reference's scikit-fem path (intorder=2), whose
    O(h^4) nodal error is the floor measured in BASELINE.md.  The default
    (3-point Gauss) gives essentially exact P1 nodal values in 1D and beats
    the reference by ~4000x at the same config."""
    cfg = SolverConfig(num_nodes=num_nodes, M=M, gamma=gamma,
                       formulation=formulation, fem_quad_order=quad_order)
    s = HybridSolver(problems.poisson_1d(), cfg)
    s.solve()
    linf, l2 = s.errors(TEST_POINTS)
    return float(linf), float(l2), s


def test_reference_main_config_parity():
    """25 nodes, M=8, gamma=1e4 in parity mode -> Linf 3.274e-6
    (BASELINE.md row 1, reproduced to ~4 digits)."""
    linf, l2, s = solve_errors(25, quad_order=2)
    assert abs(linf - 3.274e-6) < 0.05e-6, linf
    assert l2 < 5e-6, l2
    # FEM nodal error IS the floor (SURVEY.md 0.3): hybrid ~= nodal error
    nodal_err = float(
        jnp.max(jnp.abs(s.solution.fem_values
                        - jnp.sin(jnp.pi * s.solution.nodes)))
    )
    assert abs(linf - nodal_err) < 0.5 * nodal_err + 1e-9


def test_default_mode_beats_reference():
    """Default 3-point quadrature: exact-to-roundoff nodal values push the
    hybrid error to the LSSVR truncation floor, ~4000x below the reference's
    3.27e-6 at the same 25-node config."""
    linf, _, _ = solve_errors(25)
    assert linf < 5e-9, linf


def test_fem_only_baseline_parity():
    """FEM piecewise-linear Linf ~8.47e-3 at 25 nodes (BASELINE.md)."""
    _, _, s = solve_errors(25)
    u_fem = s.evaluate_fem(TEST_POINTS)
    err = float(metrics.linf_error(u_fem, np.sin(np.pi * TEST_POINTS)))
    assert 6e-3 < err < 1.1e-2, err


def test_hybrid_beats_fem_by_1000x():
    linf, _, s = solve_errors(25)
    u_fem = s.evaluate_fem(TEST_POINTS)
    fem_err = float(metrics.linf_error(u_fem, np.sin(np.pi * TEST_POINTS)))
    assert fem_err / linf > 1.0e3


@pytest.mark.parametrize("formulation", ["primal", "dual"])
def test_h_refinement_order4_parity(formulation):
    """Parity mode, E = 4 -> 32: O(h^4), reproducing the measured reference
    table 4.84e-3 / 2.73e-4 / 1.67e-5 / 1.03e-6 (BASELINE.md)."""
    errs, hs = [], []
    for E in (4, 8, 16, 32):
        linf, _, _ = solve_errors(E + 1, formulation=formulation,
                                  quad_order=2)
        errs.append(linf)
        hs.append(2.0 / E)
    order = metrics.convergence_order(hs, errs)
    assert 3.5 < order < 4.8, (order, errs)
    ref = [4.84e-3, 2.73e-4, 1.67e-5, 1.03e-6]
    for got, want in zip(errs, ref):
        assert abs(got - want) < 0.05 * want, (errs, ref)


def test_primal_dual_agree_end_to_end():
    linf_p, _, sp = solve_errors(25, formulation="primal")
    linf_d, _, sd = solve_errors(25, formulation="dual")
    np.testing.assert_allclose(
        np.asarray(sp.solution.coeffs), np.asarray(sd.solution.coeffs),
        atol=1e-7,
    )


def test_gamma_insensitivity():
    """Error saturates at the nodal floor for gamma in [1e2, 1e8]
    (SURVEY.md 0.3)."""
    errs = [solve_errors(25, gamma=g)[0] for g in (1e2, 1e4, 1e6, 1e8)]
    assert max(errs) / min(errs) < 3.0, errs


def test_M_saturation():
    """M >= 6 reaches the nodal floor (SURVEY.md 0.3)."""
    e6 = solve_errors(25, M=6)[0]
    e12 = solve_errors(25, M=12)[0]
    assert e6 < 1e-5 and e12 < 1e-5


def test_solution_hits_1e10_target_at_fine_mesh():
    """North star: 1e-10 L2/Linf against exact sin(pi x) (BASELINE.json).
    O(h^4) floor => reachable by mesh refinement in f64."""
    linf, l2, _ = solve_errors(321, M=8)
    assert linf < 1e-10, linf
    assert l2 < 1e-10, l2


def test_diagnostics_surfaced():
    """max_slack / bc_violation are outputs, not discarded (ref :102-103)."""
    _, _, s = solve_errors(25)
    sol = s.solution
    assert np.isfinite(np.asarray(sol.max_slack)).all()
    assert float(jnp.max(sol.bc_violation)) < 1e-8
    assert bool(jnp.all(sol.solve_ok))


def test_evaluation_clamps_outside_domain():
    """Points outside [x0, x1] evaluate via the first/last element
    (reference :198-209 clamp semantics)."""
    _, _, s = solve_errors(9)
    u = np.asarray(s.evaluate_solution(np.array([-1.3, 1.3])))
    c0 = s.solution.coeffs[0]
    cE = s.solution.coeffs[-1]
    # manual evaluation on the clamped elements
    nodes = np.asarray(s.solution.nodes)
    from hybrid_fem_lssvr_tpu.ops import legendre as lg

    t0 = (2 * -1.3 - nodes[0] - nodes[1]) / (nodes[1] - nodes[0])
    tE = (2 * 1.3 - nodes[-2] - nodes[-1]) / (nodes[-1] - nodes[-2])
    w0 = float(lg.evaluate_series(c0, jnp.asarray(t0)))
    wE = float(lg.evaluate_series(cE, jnp.asarray(tE)))
    np.testing.assert_allclose(u, [w0, wE], atol=1e-12)


def test_uniform_eval_fast_path_matches_searchsorted():
    from hybrid_fem_lssvr_tpu.ops import eval as ops_eval

    _, _, s = solve_errors(25)
    sol = s.solution
    x = jnp.asarray(np.linspace(-1.3, 1.3, 1001))
    u_ss = ops_eval.evaluate(sol.nodes, sol.coeffs, x)
    u_fast = ops_eval.evaluate_uniform(-1.0, 2.0 / 24, sol.coeffs, x)
    np.testing.assert_allclose(np.asarray(u_ss), np.asarray(u_fast),
                               atol=1e-12)


def test_eval_derivative():
    """First/second derivative evaluation against the analytic oracle."""
    from hybrid_fem_lssvr_tpu.ops import eval as ops_eval

    _, _, s = solve_errors(33)
    x = np.linspace(-0.95, 0.95, 101)
    du = ops_eval.evaluate_derivative(
        s.solution.nodes, s.solution.coeffs, jnp.asarray(x), order=1
    )
    np.testing.assert_allclose(
        np.asarray(du), np.pi * np.cos(np.pi * x), atol=5e-5
    )
    d2u = ops_eval.evaluate_derivative(
        s.solution.nodes, s.solution.coeffs, jnp.asarray(x), order=2
    )
    np.testing.assert_allclose(
        np.asarray(d2u), -np.pi**2 * np.sin(np.pi * x), atol=5e-3
    )


def test_custom_nonuniform_mesh():
    """Graded meshes go through the general batched-KKT path."""
    x = np.concatenate([np.linspace(-1, 0, 17), np.geomspace(0.02, 1, 15)])
    x = np.unique(np.concatenate([x, [0.0, 1.0]]))
    s = HybridSolver(problems.poisson_1d(), SolverConfig(M=8),
                     nodes=jnp.asarray(x))
    s.solve()
    linf, _ = s.errors(TEST_POINTS)
    assert float(linf) < 1e-3
