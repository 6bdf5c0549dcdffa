"""Workload-library tests: BASELINE.json configs 3-4 (variable-coefficient
elliptic, Helmholtz, advection-diffusion) with manufactured solutions.

Theory encoded here: the enhancement is locally exact given nodal values, so
the hybrid Linf error equals the coarse FEM *nodal* error for every operator
family (for Poisson that floor is ~machine precision thanks to 1D nodal
superconvergence; for the other families it is O(h^2))."""

import numpy as np
import pytest

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
from hybrid_fem_lssvr_tpu.utils import metrics

X = np.linspace(-1, 1, 401)

FAMILIES = ["variable_coeff_elliptic", "helmholtz_1d",
            "advection_diffusion_1d"]


def run(name, E, **cfg_kw):
    p = problems.get(name)
    s = HybridSolver(p, SolverConfig(num_nodes=E + 1, **cfg_kw))
    s.solve()
    linf, _ = s.errors(X)
    nodal = float(
        np.abs(
            np.asarray(s.solution.fem_values)
            - np.sin(np.pi * np.asarray(s.solution.nodes))
        ).max()
    )
    fem_linf = float(
        np.abs(np.asarray(s.evaluate_fem(X)) - np.sin(np.pi * X)).max()
    )
    return float(linf), nodal, fem_linf, s


@pytest.mark.parametrize("name", FAMILIES)
def test_hybrid_error_equals_nodal_floor(name):
    linf, nodal, fem_linf, s = run(name, 64)
    assert abs(linf - nodal) < 0.1 * nodal + 1e-12, (linf, nodal)
    assert linf < fem_linf  # enhancement always beats the P1 interpolant
    assert bool(np.asarray(s.solution.solve_ok).all())


@pytest.mark.parametrize("name", FAMILIES)
def test_h_convergence_order2(name):
    errs, hs = [], []
    for E in (16, 32, 64, 128):
        linf, _, _, _ = run(name, E)
        errs.append(linf)
        hs.append(2.0 / E)
    order = metrics.convergence_order(hs, errs)
    assert 1.8 < order < 2.6, (order, errs)


@pytest.mark.parametrize("name", FAMILIES)
@pytest.mark.parametrize("formulation", ["primal", "dual"])
def test_formulations_agree(name, formulation):
    linf_p, _, _, sp = run(name, 32, formulation="primal")
    linf_f, _, _, sf = run(name, 32, formulation=formulation)
    np.testing.assert_allclose(
        np.asarray(sp.solution.coeffs), np.asarray(sf.solution.coeffs),
        atol=1e-7,
    )


def test_helmholtz_spd_claim():
    """Helmholtz's indefinite operator still solves through the SPD
    Cholesky path — the design claim of ops/kkt.py (I + gamma D^T D is a
    Gram matrix regardless of operator signs)."""
    p = problems.helmholtz_1d(k=4.7)
    s = HybridSolver(p, SolverConfig(num_nodes=65, kkt_method="cholesky"))
    s.solve()
    assert bool(np.asarray(s.solution.solve_ok).all())
    linf, _ = s.errors(X)
    assert float(linf) < 5e-3


def test_advection_dominated():
    """Moderately advection-dominated regime stays stable (tridiagonal
    nonsymmetric FEM + nonsymmetric collocation rows)."""
    p = problems.advection_diffusion_1d(eps=0.05, beta=1.0)
    s = HybridSolver(p, SolverConfig(num_nodes=257))
    s.solve()
    linf, _ = s.errors(X)
    assert float(linf) < 2e-2
    assert bool(np.asarray(s.solution.solve_ok).all())


def test_inhomogeneous_dirichlet():
    """Nonzero boundary data: assembler column elimination + boundary
    overrides (paths the reference's homogeneous-only enforce never hits),
    in both formulations and under sharding."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
    from hybrid_fem_lssvr_tpu.parallel.sharded import make_sharded_solve

    p = problems.poisson_inhomogeneous()
    for form in ("primal", "dual"):
        s = HybridSolver(p, SolverConfig(num_nodes=25, formulation=form))
        sol = s.solve()
        linf, _ = s.errors(X)
        assert float(linf) < 2e-9, (form, float(linf))
        assert bool(np.asarray(sol.solve_ok).all())
        # boundary values honoured exactly
        u_b = np.asarray(s.evaluate_solution(np.array([-1.0, 1.0])))
        np.testing.assert_allclose(u_b, [1.0, 3.0], atol=1e-10)
    single = HybridSolver(p, SolverConfig(num_nodes=33))
    single.solve()
    run = make_sharded_solve(p, SolverConfig(num_nodes=33),
                             pmesh.element_mesh(4))
    out = run()
    np.testing.assert_allclose(
        np.asarray(out.coeffs), np.asarray(single.solution.coeffs),
        atol=1e-12,
    )


def test_kernel_degree_sweep():
    """BASELINE.json config 2: kernel-degree sweep p=2..10 — error is
    M-insensitive once past the nodal floor; low M degrades gracefully."""
    errs = {}
    for M in (2, 4, 6, 8, 10):
        linf, _, _, _ = run("variable_coeff_elliptic", 32, M=M)
        errs[M] = linf
    # M>=6 saturates at the nodal floor
    assert abs(errs[8] - errs[10]) < 0.2 * errs[8]
    assert errs[2] > errs[8]  # M=2 cannot represent the interior solution


def test_neumann_bc():
    """Mixed Dirichlet/Neumann: -u'' = pi^2 sin(pi x), u(-1)=0,
    u'(1) = -pi (natural BC via assembly.apply_bcs).  The Neumann nodal
    values superconverge, so the hybrid floor tightens rapidly with h;
    both formulations and the f32 shared path agree."""
    p = problems.get("poisson_neumann")
    errs = {}
    for E in (8, 16, 32):
        s = HybridSolver(p, SolverConfig(num_nodes=E + 1, M=8, gamma=1e4))
        sol = s.solve()
        linf, _ = s.errors(X)
        errs[E] = float(linf)
        assert bool(np.asarray(sol.solve_ok).all())
    assert errs[16] < 0.05 * errs[8]
    assert errs[32] < 0.05 * errs[16]
    assert errs[32] < 1e-9
    d = HybridSolver(p, SolverConfig(num_nodes=17, formulation="dual"))
    d.solve()
    linf_d, _ = d.errors(X)
    assert abs(linf_d - errs[16]) < 1e-3 * errs[16] + 1e-12
    f32 = HybridSolver(p, SolverConfig(num_nodes=17, dtype="float32"))
    sol32 = f32.solve()
    linf32, _ = f32.errors(X)
    assert float(linf32) < 5e-6
    assert bool(np.asarray(sol32.solve_ok).all())


def test_robin_bc():
    """Robin ends with NONZERO exact boundary values (u = cos(pi x)):
    certifies the enhancement's FEM-value pin at non-Dirichlet ends
    carries real boundary information.  Floor is the O(h^2) Robin nodal
    error (same class as the c != 0 Helmholtz floor)."""
    p = problems.get("robin_1d")
    ue = np.cos(np.pi * X)
    errs = {}
    for E in (16, 32, 64):
        s = HybridSolver(p, SolverConfig(num_nodes=E + 1, M=8, gamma=1e4))
        sol = s.solve()
        u = np.asarray(s.evaluate_solution(X))
        errs[E] = float(np.abs(u - ue).max())
        assert bool(np.asarray(sol.solve_ok).all())
    order = np.log2(errs[16] / errs[32])
    assert 1.7 < order < 2.3, (errs, order)
    # boundary value is approximated (not pinned to exact data): the
    # solve carries u(+-1) ~ -1 from the FEM trace
    u_b = np.asarray(s.evaluate_solution(np.array([-1.0, 1.0])))
    np.testing.assert_allclose(u_b, [-1.0, -1.0], atol=5 * errs[64])


def test_sharded_rejects_non_dirichlet():
    from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
    from hybrid_fem_lssvr_tpu.parallel.sharded import make_sharded_solve

    with pytest.raises(NotImplementedError, match="Dirichlet"):
        make_sharded_solve(problems.get("poisson_neumann"),
                           SolverConfig(num_nodes=33),
                           pmesh.element_mesh(4))
