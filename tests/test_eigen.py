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


# --------------------------------------------------------------------------
# 2D
# --------------------------------------------------------------------------

from hybrid_fem_lssvr_tpu.models.hybrid2d import (Solver2DConfig,  # noqa: E402
                                                  helmholtz_2d, poisson_2d)


def test_fem_eigenvalues_2d_orders():
    p = poisson_2d()
    errs = {}
    for n in (8, 16):
        for mass in ("consistent", "numerov"):
            cfg = Solver2DConfig(nx=n, ny=n, M=6, dtype="float64")
            sol = eigen.fem_eigensolve_2d(
                p, cfg, EigenConfig(k=2, iters=12, mass=mass))
            ex = eigen.exact_eigenvalues_2d(p, 2)
            errs[(n, mass)] = np.abs(np.asarray(sol.lams) - ex)
    oc = np.log2(errs[(8, "consistent")] / errs[(16, "consistent")])
    on = np.log2(errs[(8, "numerov")] / errs[(16, "numerov")])
    assert np.all(oc > 1.7) and np.all(oc < 2.3), oc
    assert np.all(on > 3.6) and np.all(on < 4.4), on


def test_enhanced_eigenvalues_2d_trace_lift_beats_fem_floor():
    """With the high-order lifted trace the enhanced quotient lands 7+
    orders below the FEM dispersion floor (degenerate pair included)."""
    p = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, dtype="float64")
    sol = eigen.hybrid_eigensolve_2d(p, cfg, EigenConfig(k=4, iters=15))
    ex = eigen.exact_eigenvalues_2d(p, 4)
    fem_err = np.abs(np.asarray(sol.fem.lams) - ex)
    enh_err = np.abs(np.asarray(sol.lams) - ex)
    assert np.all(np.asarray(sol.solve_ok))
    assert np.all(fem_err > 1e-2)
    assert np.all(enh_err < 1e-6), enh_err
    assert enh_err[0] < 1e-9, enh_err


def test_enhanced_eigenvalues_2d_without_lift_stay_at_trace_floor():
    """Control experiment: bilinear traces cap the quotient at O(h^2) —
    documents WHY the lift exists."""
    p = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, dtype="float64")
    sol = eigen.hybrid_eigensolve_2d(
        p, cfg, EigenConfig(k=1, iters=15, trace_lift=0))
    ex = eigen.exact_eigenvalues_2d(p, 1)
    enh_err = np.abs(np.asarray(sol.lams) - ex)
    assert enh_err[0] > 1e-4  # stuck at the bilinear-trace floor


def test_helmholtz_2d_exact_reaction_shift():
    """c < 0 shifts the pencil exactly (A(c) = A(0) + c Mass): the
    iteration runs on the SPD Laplacian and the shift costs nothing."""
    p = helmholtz_2d()
    assert p.c < 0
    cfg = Solver2DConfig(nx=16, ny=16, M=6, dtype="float64")
    sol = eigen.hybrid_eigensolve_2d(p, cfg, EigenConfig(k=2, iters=15))
    ex = eigen.exact_eigenvalues_2d(p, 2)
    assert np.all(np.abs(np.asarray(sol.lams) - ex) < 1e-6)


def test_enhanced_eigenfunction_2d_beats_q1_interpolant():
    p = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, dtype="float64")
    sol = eigen.hybrid_eigensolve_2d(p, cfg, EigenConfig(k=1, iters=15))
    rng = np.random.default_rng(7)
    xq = jnp.asarray(rng.uniform(-1, 1, 1500))
    yq = jnp.asarray(rng.uniform(-1, 1, 1500))
    u = np.asarray(eigen.evaluate_eigenfunction_2d(sol, 0, xq, yq))
    # ground state on (-1,1)^2, unit L2: sin(pi(x+1)/2) sin(pi(y+1)/2)
    ue = (np.sin(np.pi * (np.asarray(xq) + 1) / 2)
          * np.sin(np.pi * (np.asarray(yq) + 1) / 2))
    assert np.max(np.abs(u - ue)) < 1e-5  # Q1 interpolant is ~1e-2


def test_eigensolve_2d_rejects_nonsymmetric():
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        advection_diffusion_2d, robin_2d)
    cfg = Solver2DConfig(nx=8, ny=8, M=6, dtype="float64")
    with pytest.raises(NotImplementedError):
        eigen.fem_eigensolve_2d(advection_diffusion_2d(), cfg,
                                EigenConfig(k=1))
    with pytest.raises(NotImplementedError):
        eigen.fem_eigensolve_2d(robin_2d(), cfg, EigenConfig(k=1))


def test_lift_weights_reproduce_polynomials():
    """The lift is Lagrange: degree-(S-1) polynomial samples interpolate
    exactly, including the one-sided boundary stencils."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import _lift_weights
    n_nodes = 12
    xs = np.linspace(0.0, 1.0, n_nodes)
    h = xs[1] - xs[0]
    poly = lambda x: 1.0 + x + x**2 - 2 * x**3 + 0.5 * x**4 + x**5  # noqa
    vals = poly(xs)
    t = np.linspace(-1.0, 1.0, 6)
    idx, w = _lift_weights(n_nodes, t, stencil=6)
    for b in range(n_nodes - 1):
        x_pts = xs[b] + 0.5 * (t + 1.0) * h
        got = w[b] @ vals[idx[b]]
        assert np.max(np.abs(got - poly(x_pts))) < 1e-12


def test_eigenconfig_validation():
    with pytest.raises(ValueError):
        EigenConfig(k=0)
    with pytest.raises(ValueError):
        EigenConfig(mass="lumped")
    with pytest.raises(ValueError):
        EigenConfig(iters=0)


# --------------------------------------------------------------------------
# 3D
# --------------------------------------------------------------------------

from hybrid_fem_lssvr_tpu.models.hybrid3d import (Solver3DConfig,  # noqa: E402,E501
                                                  advection_diffusion_3d,
                                                  helmholtz_3d, poisson_3d,
                                                  robin_3d)


def test_fem_eigenvalues_3d_orders():
    p = poisson_3d()
    errs = {}
    for n in (8, 16):
        for mass in ("consistent", "numerov"):
            cfg = Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                                 dtype="float64")
            sol = eigen.fem_eigensolve_3d(
                p, cfg, EigenConfig(k=2, iters=10, mass=mass))
            ex = eigen.exact_eigenvalues_3d(p, 2)
            errs[(n, mass)] = np.abs(np.asarray(sol.lams) - ex)
    oc = np.log2(errs[(8, "consistent")] / errs[(16, "consistent")])
    on = np.log2(errs[(8, "numerov")] / errs[(16, "numerov")])
    assert np.all(oc > 1.7) and np.all(oc < 2.3), oc
    assert np.all(on > 3.6) and np.all(on < 4.4), on


def test_enhanced_eigenvalues_3d_trace_lift_beats_fem_floor():
    """Plane-lifted traces push the enhanced quotient well below the FEM
    dispersion floor (ground state ~1000x at 8^3; the higher modes are
    capped by the stencil-6 interpolation floor ~(k pi h/2)^6/6!,
    measured 8.5e-4 for the degenerate (1,1,2) pair at h=1/4)."""
    p = poisson_3d()
    cfg = Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                         dtype="float64")
    sol = eigen.hybrid_eigensolve_3d(
        p, cfg, EigenConfig(k=3, iters=12, mass="numerov"))
    ex = eigen.exact_eigenvalues_3d(p, 3)
    fem_err = np.abs(np.asarray(sol.fem.lams) - ex)
    enh_err = np.abs(np.asarray(sol.lams) - ex)
    assert np.all(np.asarray(sol.solve_ok))
    assert enh_err[0] < 5e-6, enh_err
    assert enh_err[0] < 0.01 * fem_err[0]
    assert np.all(enh_err < 5e-3)
    assert np.all(np.asarray(sol.fem.residuals) < 1e-10)


def test_helmholtz_3d_exact_reaction_shift():
    p = helmholtz_3d()
    assert p.c < 0
    cfg = Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                         dtype="float64")
    sol = eigen.fem_eigensolve_3d(p, cfg, EigenConfig(k=1, iters=10,
                                                      mass="numerov"))
    ex = eigen.exact_eigenvalues_3d(p, 1)
    assert np.abs(np.asarray(sol.lams) - ex)[0] < 1e-3


def test_enhanced_eigenfunction_3d_beats_q1_interpolant():
    p = poisson_3d()
    cfg = Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                         dtype="float64")
    sol = eigen.hybrid_eigensolve_3d(
        p, cfg, EigenConfig(k=1, iters=12, mass="numerov"))
    rng = np.random.default_rng(7)
    xq = jnp.asarray(rng.uniform(-1, 1, 1500))
    yq = jnp.asarray(rng.uniform(-1, 1, 1500))
    zq = jnp.asarray(rng.uniform(-1, 1, 1500))
    u = np.asarray(eigen.evaluate_eigenfunction_3d(sol, 0, xq, yq, zq))
    # ground state on (-1,1)^3, unit L2
    ue = (np.sin(np.pi * (np.asarray(xq) + 1) / 2)
          * np.sin(np.pi * (np.asarray(yq) + 1) / 2)
          * np.sin(np.pi * (np.asarray(zq) + 1) / 2))
    assert np.max(np.abs(u - ue)) < 5e-4  # Q1 interpolant is ~1e-1


def test_eigensolve_3d_rejects_nonsymmetric():
    cfg = Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                         dtype="float64")
    with pytest.raises(NotImplementedError):
        eigen.fem_eigensolve_3d(advection_diffusion_3d(), cfg,
                                EigenConfig(k=1))
    with pytest.raises(NotImplementedError):
        eigen.fem_eigensolve_3d(robin_3d(), cfg, EigenConfig(k=1))


def test_eigensolve_rejects_float32():
    """Round-3 VERDICT Weak #3: the 2D/3D f32 eigensolves are
    noise-limited (pencil residual ~1e-2 at 32^2) — they must refuse f32
    loudly instead of returning silently-garbage eigenvalues.  (The 1D
    f32 path works and stays open — see
    test_f32_pipeline_reaches_f32_floor.)"""
    import pytest

    from hybrid_fem_lssvr_tpu.models.hybrid2d import (Solver2DConfig,
                                                      get_problem_2d)

    p2 = get_problem_2d("poisson_2d")
    with pytest.raises(ValueError, match="float64"):
        eigen.fem_eigensolve_2d(p2, Solver2DConfig(nx=8, ny=8,
                                                 dtype="float32"))


# -------------------------------------------- mixed-precision route (r5)


def test_mixed_eigensolve_2d_corrected_quotient_floor():
    """Round-4 VERDICT task 9: f64 pencil + f32 enhancement + DG-corrected
    f64 quotient.  The plain broken quotient is LINEAR in the f32
    jump/boundary trace noise (~5e-7); the face-flux correction restores
    quadratic suppression (measured 1.5e-11 / 1.0e-10 at 32^2 vs the f64
    route's 2e-14 / 8.9e-11 — mode 1 within 1.2x of f64)."""
    from hybrid_fem_lssvr_tpu.models.eigen import (
        EigenConfig, exact_eigenvalues_2d, hybrid_eigensolve_2d_mixed,
        rayleigh_quotient_2d)
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (Solver2DConfig,
                                                      poisson_2d)

    p = poisson_2d()
    ec = EigenConfig(k=2, rq_iters=2, trace_lift=6)
    sm = hybrid_eigensolve_2d_mixed(
        p, Solver2DConfig(nx=32, ny=32, M=6, n_colloc=6,
                          dtype="float32"), ec)
    ex = exact_eigenvalues_2d(p, 2)
    errs = np.abs(np.asarray(sm.lams) - ex)
    assert errs[0] < 5e-10, errs  # measured 1.5e-11
    assert errs[1] < 2e-9, errs  # measured 1.0e-10
    assert bool(jnp.all(sm.solve_ok))
    # the PLAIN broken quotient on the same coefficients is orders worse
    # (linear in the f32 trace noise) — the correction is load-bearing
    cfg64 = Solver2DConfig(nx=32, ny=32, M=6, n_colloc=6,
                           dtype="float64")
    lam_plain = float(rayleigh_quotient_2d(p, sm.fem.xs, sm.fem.ys,
                                           sm.coeffs[0], cfg64))
    assert abs(lam_plain - ex[0]) > 20.0 * errs[0]


def test_mixed_eigensolve_3d_matches_f64_at_disc_floor():
    """At a discretisation-limited config the mixed route reproduces the
    f64 eigenvalue to ~1e-9 relative (measured |diff| 5e-10 at 8^3)."""
    from hybrid_fem_lssvr_tpu.models.eigen import (
        EigenConfig, hybrid_eigensolve_3d, hybrid_eigensolve_3d_mixed)
    from hybrid_fem_lssvr_tpu.models.hybrid3d import (Solver3DConfig,
                                                      poisson_3d)

    p = poisson_3d()
    ec = EigenConfig(k=1, rq_iters=1, trace_lift=4)
    s64 = hybrid_eigensolve_3d(
        p, Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                          dtype="float64"), ec)
    sm = hybrid_eigensolve_3d_mixed(
        p, Solver3DConfig(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                          dtype="float32"), ec)
    np.testing.assert_allclose(np.asarray(sm.lams), np.asarray(s64.lams),
                               rtol=1e-7)


def test_corrected_quotient_consistent_on_f64_coeffs():
    """On f64-route coefficients (jumps ~1e-13) the corrected and plain
    quotients agree — the correction is a pure consistency term."""
    from hybrid_fem_lssvr_tpu.models.eigen import (
        EigenConfig, hybrid_eigensolve_2d, rayleigh_quotient_2d,
        rayleigh_quotient_2d_corrected)
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (Solver2DConfig,
                                                      poisson_2d)

    p = poisson_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=6, n_colloc=6, dtype="float64")
    s = hybrid_eigensolve_2d(p, cfg, EigenConfig(k=1, rq_iters=1,
                                                 trace_lift=6))
    a = float(rayleigh_quotient_2d(p, s.fem.xs, s.fem.ys, s.coeffs[0],
                                   cfg))
    b = float(rayleigh_quotient_2d_corrected(p, s.fem.xs, s.fem.ys,
                                             s.coeffs[0], cfg))
    np.testing.assert_allclose(a, b, rtol=1e-9)
