"""Eigenvalue family: FEM pencil orders, enhanced Rayleigh-quotient floor,
M-orthonormality, eigenfunction accuracy vs the P1 interpolant.

The reference has no eigenproblem support; the oracle is the exact
spectrum lambda_j = (j pi / L)^2 (+ c0) of the constant-coefficient
Sturm-Liouville operator."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import eigen, problems
from hybrid_fem_lssvr_tpu.models.eigen import EigenConfig
from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig


def _fem_errs(p, N, k, mass):
    cfg = SolverConfig(num_nodes=N, M=8, dtype="float64")
    sol = eigen.fem_eigensolve(p, cfg, EigenConfig(k=k, mass=mass))
    ex = eigen.exact_eigenvalues(p, k)
    return np.abs(np.asarray(sol.lams) - ex), sol


def test_fem_eigenvalues_consistent_mass_order2():
    p = problems.get("poisson_1d")
    e1, _ = _fem_errs(p, 17, 3, "consistent")
    e2, _ = _fem_errs(p, 33, 3, "consistent")
    order = np.log2(e1 / e2)
    assert np.all(order > 1.8) and np.all(order < 2.2), order


def test_fem_eigenvalues_numerov_mass_order4():
    p = problems.get("poisson_1d")
    e1, _ = _fem_errs(p, 17, 2, "numerov")
    e2, _ = _fem_errs(p, 33, 2, "numerov")
    order = np.log2(e1 / e2)
    assert np.all(order > 3.7) and np.all(order < 4.3), order


def test_fem_eigenvectors_m_orthonormal_and_small_residual():
    p = problems.get("poisson_1d")
    errs, sol = _fem_errs(p, 33, 4, "consistent")
    assert np.all(np.asarray(sol.residuals) < 1e-10)
    # M-orthonormality via the quadrature mass of the P1 interpolants:
    # V^T M V == I was enforced on interior dofs.
    from hybrid_fem_lssvr_tpu.models.eigen import _pencil, _tri_matvec
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float64")
    _, Mt = _pencil(p, sol.nodes, cfg, "consistent")
    Vi = sol.vectors[1:-1]
    G = np.asarray(Vi.T @ _tri_matvec(Mt, Vi))
    assert np.max(np.abs(G - np.eye(4))) < 1e-12


def test_enhanced_eigenvalues_hit_f64_floor():
    """Rayleigh quotient of the enhanced polynomial: machine-precision
    eigenvalues from a 32-element P1 mesh (FEM floor is ~2e-3)."""
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float64")
    sol = eigen.hybrid_eigensolve(p, cfg, EigenConfig(k=3, rq_iters=2))
    ex = eigen.exact_eigenvalues(p, 3)
    fem_err = np.abs(np.asarray(sol.fem.lams) - ex)
    enh_err = np.abs(np.asarray(sol.lams) - ex)
    assert np.all(np.asarray(sol.solve_ok))
    assert np.all(fem_err > 1e-3)  # the FEM dispersion floor is real
    assert np.all(enh_err < 1e-10), enh_err
    assert np.all(enh_err < 1e-6 * fem_err)


def test_enhanced_eigenvalues_helmholtz_shifted_spectrum():
    """c(x) = -k^2 shifts the spectrum; lambda_1 is NEGATIVE (indefinite
    pencil) and the pipeline still resolves it to f64 accuracy."""
    p = problems.get("helmholtz_1d")
    c0 = float(np.asarray(p.c(jnp.zeros(1)))[0])
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float64")
    sol = eigen.hybrid_eigensolve(p, cfg, EigenConfig(k=3))
    ex = eigen.exact_eigenvalues(p, 3, c0=c0)
    assert ex[0] < 0
    enh_err = np.abs(np.asarray(sol.lams) - ex)
    assert np.all(enh_err < 1e-10), enh_err


def test_enhanced_eigenfunction_beats_p1_interpolant():
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=17, M=8, dtype="float64")
    sol = eigen.hybrid_eigensolve(p, cfg, EigenConfig(k=2))
    x = jnp.linspace(-1.0, 1.0, 1001, dtype=jnp.float64)
    xn = np.asarray(x)
    for j in range(2):
        u = np.asarray(eigen.evaluate_eigenfunction(sol, j, x))
        ue = np.sin((j + 1) * np.pi * (xn + 1) / 2.0)  # L = 2, unit L2
        enh = np.max(np.abs(u - ue))
        ufem = np.interp(xn, np.asarray(sol.fem.nodes),
                         np.asarray(sol.fem.vectors[:, j]))
        ufem /= np.sqrt(np.trapezoid(ufem**2, xn))
        p1 = np.max(np.abs(ufem - ue))
        assert enh < 1e-4 * p1, (j, enh, p1)


def test_eigenfunction_normalisation_unit_l2():
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=17, M=8, dtype="float64")
    sol = eigen.hybrid_eigensolve(p, cfg, EigenConfig(k=2))
    from hybrid_fem_lssvr_tpu.models.eigen import _quadrature_forms
    for j in range(2):
        _, den = _quadrature_forms(p, sol.fem.nodes, sol.coeffs[j], cfg)
        assert abs(float(den) - 1.0) < 1e-12


def test_f32_pipeline_reaches_f32_floor():
    p = problems.get("poisson_1d")
    cfg = SolverConfig(num_nodes=33, M=8, dtype="float32")
    sol = eigen.hybrid_eigensolve(p, cfg, EigenConfig(k=2))
    ex = eigen.exact_eigenvalues(p, 2)
    enh_err = np.abs(np.asarray(sol.lams) - ex)
    assert np.all(enh_err < 5e-5), enh_err  # f32 quotient floor ~1e-7..1e-5


def test_variable_coefficient_quotient_consistency():
    """No closed-form spectrum for a(x) non-constant: assert the enhanced
    quotient agrees with the FEM eigenvalue to the FEM discretisation
    order and improves under refinement toward a mesh-independent value."""
    p = problems.get("variable_coeff_elliptic")
    if p.b is not None:
        b_vals = np.asarray(p.b(jnp.linspace(-1, 1, 5)))
        if np.any(b_vals != 0.0):
            pytest.skip("variable_coeff_elliptic has advection")
    lams = []
    for N in (33, 65, 129):
        cfg = SolverConfig(num_nodes=N, M=8, dtype="float64")
        sol = eigen.hybrid_eigensolve(p, cfg, EigenConfig(k=1))
        lams.append(float(sol.lams[0]))
    # Cauchy refinement: successive enhanced eigenvalues converge
    assert abs(lams[2] - lams[1]) < 0.2 * abs(lams[1] - lams[0]) + 1e-12
    assert abs(lams[1] - lams[0]) < 1e-4


def test_validation_rejects_advection_and_natural_bcs():
    p = problems.get("advection_diffusion_1d")
    cfg = SolverConfig(num_nodes=17, M=8, dtype="float64")
    with pytest.raises(NotImplementedError):
        eigen.fem_eigensolve(p, cfg, EigenConfig(k=1))
    pn = problems.get("poisson_neumann")
    with pytest.raises(NotImplementedError):
        eigen.fem_eigensolve(pn, cfg, EigenConfig(k=1))


def test_eigenconfig_validation():
    with pytest.raises(ValueError):
        EigenConfig(k=0)
    with pytest.raises(ValueError):
        EigenConfig(mass="lumped")
    with pytest.raises(ValueError):
        EigenConfig(iters=0)
