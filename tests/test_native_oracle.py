"""Native C++ oracle cross-validation (SURVEY.md 2.2: the reference's native
substrate — BLAS/LAPACK/SLSQP inside scipy — replaced by a from-scratch,
dependency-free C++ library sharing no code with the JAX path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.ops import kkt, legendre, tridiag
from hybrid_fem_lssvr_tpu.utils import native

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native toolchain unavailable"
)


def test_native_thomas_matches_jax(rng):
    n = 257
    a = rng.normal(size=n); a[0] = 0
    c = rng.normal(size=n); c[-1] = 0
    b = np.abs(a) + np.abs(c) + 1.0 + np.abs(rng.normal(size=n))
    rhs = rng.normal(size=n)
    x_native = native.thomas(a, b, c, rhs)
    x_jax = np.asarray(tridiag.thomas(*map(jnp.asarray, (a, b, c, rhs))))
    # atol scaled to the solution: pure-relative comparison is meaningless
    # on near-zero entries of a random solution vector
    np.testing.assert_allclose(
        x_native, x_jax, rtol=1e-10, atol=1e-12 * np.abs(x_jax).max()
    )


def test_native_legendre_matches_jax(rng):
    t = rng.uniform(-1, 1, 33)
    V0n, V1n, V2n = native.legendre_vandermonde(t, 10)
    V0, V1, V2 = legendre.legendre_vandermonde(jnp.asarray(t), 10)
    np.testing.assert_allclose(V0n, np.asarray(V0), atol=1e-13)
    np.testing.assert_allclose(V1n, np.asarray(V1), atol=1e-12)
    np.testing.assert_allclose(V2n, np.asarray(V2), atol=1e-11)


def test_native_kkt_matches_jax(rng):
    C, M = 12, 8
    V0, V1, V2 = legendre.collocation_vandermonde(M, C, dtype=jnp.float64)
    D = -400.0 * np.asarray(V2)
    B = np.stack([np.asarray(V0)[0], np.asarray(V0)[-1]])
    f = rng.normal(size=C)
    bc = rng.normal(size=2) * 0.1
    w_native = native.kkt_solve(D, B, f, bc, 1e4)
    w_jax, _ = kkt.solve_primal_batched(
        jnp.asarray(D)[None], jnp.asarray(B), jnp.asarray(f)[None],
        jnp.asarray(bc)[None], 1e4,
    )
    np.testing.assert_allclose(w_native, np.asarray(w_jax[0]), atol=1e-9)


def test_native_end_to_end_oracle():
    """Full-pipeline cross-check: the native batched enhancement + native
    evaluation reproduce the JAX hybrid solution on the reference config."""
    from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
    from hybrid_fem_lssvr_tpu.models.hybrid import prepare_shared_host

    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=25)
    s = HybridSolver(p, cfg)
    sol = s.solve()

    shared = prepare_shared_host(p, cfg)
    D = np.asarray(shared.D, np.float64)
    B = np.asarray(shared.B, np.float64)
    nodes = np.asarray(sol.nodes, np.float64)
    h = nodes[1] - nodes[0]
    t = np.linspace(-1, 1, cfg.n_colloc)
    xc = nodes[:-1, None] + (t[None, :] + 1) * 0.5 * h
    f_all = np.pi**2 * np.sin(np.pi * xc)
    fv = np.asarray(sol.fem_values, np.float64)
    bc_all = np.stack([fv[:-1], fv[1:]], axis=1)
    bc_all[0, 0] = 0.0
    bc_all[-1, 1] = 0.0
    w_native = native.enhance_shared(D, B, f_all, bc_all, cfg.gamma)
    np.testing.assert_allclose(
        w_native, np.asarray(sol.coeffs), atol=1e-9
    )
    x = np.linspace(-1, 1, 201)
    u_native = native.evaluate(nodes, w_native, x)
    u_jax = np.asarray(s.evaluate_solution(x))
    np.testing.assert_allclose(u_native, u_jax, atol=1e-9)
    # and both hit the analytic solution
    assert np.abs(u_native - np.sin(np.pi * x)).max() < 1e-6


def test_native_q1_apply_matches_jax():
    """Native matrix-free Q1 stiffness apply == ops.assembly2d."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.ops import assembly2d

    rng = np.random.default_rng(3)
    K_loc = assembly2d.q1_local_stiffness(0.25, 0.5)
    u = rng.normal(size=(9, 13))
    ref = np.asarray(assembly2d.apply_stiffness(jnp.asarray(u),
                                                jnp.asarray(K_loc)))
    got = native.q1_apply(u, K_loc)
    np.testing.assert_allclose(got, ref, atol=1e-13)


def test_native_2d_pipeline_cross_validates_jax():
    """Full independent 2D pipeline: native Q1-CG coarse solve + native
    LSE enhancement + native evaluation == the JAX hybrid2d path (both
    f64), cross-validating coarse stage, enhancement algebra and read
    path at once."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
    from hybrid_fem_lssvr_tpu.ops import assembly2d

    p = h2.poisson_2d_inhomogeneous()
    n = 12
    cfg = h2.Solver2DConfig(nx=n, ny=n, M=5, n_colloc=5, dtype="float64",
                            precond="jacobi", cg_tol=1e-13)
    s = h2.HybridSolver2D(p, cfg)
    sol = s.solve()

    # Native coarse stage
    xs = np.linspace(-1, 1, n + 1)
    ys = np.linspace(-1, 1, n + 1)
    hx = hy = 2.0 / n
    K_loc = assembly2d.q1_local_stiffness(hx, hy)
    b = np.asarray(assembly2d.assemble_load(jnp.asarray(xs),
                                            jnp.asarray(ys), p.f))
    X, Y = np.meshgrid(xs, ys)
    u_bc = np.where(
        (X > -1 + 1e-12) & (X < 1 - 1e-12)
        & (Y > -1 + 1e-12) & (Y < 1 - 1e-12),
        0.0, np.asarray(p.g(jnp.asarray(X), jnp.asarray(Y))))
    fem_native = native.q1_cg_solve(b, K_loc, u_bc, tol=1e-13)
    np.testing.assert_allclose(fem_native, np.asarray(sol.fem_values),
                               atol=1e-9)

    # Native enhancement on the same data
    shared, (t_int, bpts) = h2.prepare_shared_2d(p, cfg)
    f_rows, bc_rows, _ = h2._element_data_2d(
        p, cfg, jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(fem_native), t_int, bpts)
    w_native = native.enhance_lse2d(np.asarray(shared.D),
                                    np.asarray(shared.B),
                                    np.asarray(f_rows),
                                    np.asarray(bc_rows))
    w_jax = np.asarray(sol.coeffs).reshape(n * n, -1)
    np.testing.assert_allclose(w_native, w_jax, atol=1e-8)

    # Native evaluation
    rng = np.random.default_rng(11)
    xq = rng.uniform(-1.1, 1.1, 500)
    yq = rng.uniform(-1.1, 1.1, 500)
    u_native = native.evaluate2d(-1.0, hx, n, -1.0, hy, n,
                                 w_native.reshape(n, n, cfg.M, cfg.M),
                                 xq, yq)
    u_jax = np.asarray(s.evaluate_solution(xq, yq))
    np.testing.assert_allclose(u_native, u_jax, atol=1e-8)


def test_native_q1_apply_var_matches_jax():
    """Native variable-coefficient matrix-free apply == the JAX
    ``apply_stiffness_var`` on a random coefficient field."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.ops import assembly2d

    rng = np.random.default_rng(7)
    hx, hy = 0.25, 0.5
    Sq, dxq, dyq = assembly2d.q1_varcoeff_parts(hx, hy)
    ny1, nx1 = 9, 13
    u = rng.normal(size=(ny1, nx1))
    a_maps = 1.0 + np.abs(rng.normal(size=(Sq.shape[0], ny1 - 1, nx1 - 1)))
    ref = np.asarray(assembly2d.apply_stiffness_var(
        jnp.asarray(u), jnp.asarray(Sq), jnp.asarray(a_maps)))
    got = native.q1_apply_var(u, Sq, a_maps)
    np.testing.assert_allclose(got, ref, atol=1e-13)


def test_native_varcoeff_2d_pipeline_cross_validates_jax():
    """Independent f64 oracle for the variable-coefficient 2D path:
    native per-element bordered-KKT LSE == the JAX batched null-space QR
    (different algebra, same minimiser) on variable_coeff_elliptic_2d."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.models import hybrid2d as h2

    p = h2.variable_coeff_elliptic_2d()
    n = 8
    cfg = h2.Solver2DConfig(nx=n, ny=n, M=5, n_colloc=5, dtype="float64",
                            precond="jacobi", cg_tol=1e-13)
    s = h2.HybridSolver2D(p, cfg)
    sol = s.solve()
    shared, (t_int, bpts) = h2.prepare_shared_2d(p, cfg)
    xs = jnp.linspace(-1, 1, n + 1, dtype=jnp.float64)
    f_rows, bc_rows, _ = h2._element_data_2d(
        p, cfg, xs, xs, sol.fem_values, t_int, bpts)
    D = h2._varcoeff_element_operators(p, cfg, xs, xs, shared, t_int)
    w_native = native.enhance_lse2d_var(
        np.asarray(D), np.asarray(shared.B), np.asarray(f_rows),
        np.asarray(bc_rows))
    w_jax = np.asarray(sol.coeffs).reshape(n * n, -1)
    np.testing.assert_allclose(w_native, w_jax, atol=1e-8)


def test_native_q1_apply3d_matches_jax():
    """Native matrix-free Q1 hex apply == ops.assembly3d (full operator:
    anisotropic spacings, reaction + all three convection terms)."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.ops import assembly3d

    rng = np.random.default_rng(5)
    K_loc = assembly3d.q1_local_operator_3d(0.25, 0.5, 0.4, 1.7, 3.0,
                                            0.5, -0.2, 0.8)
    u = rng.normal(size=(6, 8, 7))
    ref = np.asarray(assembly3d.apply_stiffness_3d(jnp.asarray(u),
                                                   jnp.asarray(K_loc)))
    got = native.q1_apply3d(u, K_loc)
    np.testing.assert_allclose(got, ref, atol=1e-13)


def test_native_3d_pipeline_cross_validates_jax():
    """Independent 3D check: native bordered-LSE enhancement (the
    size-generic enhance_lse2d kernel on [C^3, M^3]/[S, M^3] operators)
    + native tensor evaluation == the JAX hybrid3d path (both f64),
    cross-validating the enhancement algebra and the read path."""
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.models import hybrid3d as h3

    p = h3.poisson_3d_inhomogeneous()
    n = 6
    cfg = h3.Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                            dtype="float64", precond="jacobi",
                            cg_tol=1e-13, backend="xla")
    s = h3.HybridSolver3D(p, cfg)
    sol = s.solve()

    shared, (t_int, spts) = h3.prepare_shared_3d(p, cfg)
    f_rows, bc_rows, _ = h3._element_data_3d(
        p, cfg, sol.xs, sol.ys, sol.zs, sol.fem_values, t_int, spts)
    w_native = native.enhance_lse2d(np.asarray(shared.D),
                                    np.asarray(shared.B),
                                    np.asarray(f_rows),
                                    np.asarray(bc_rows))
    w_jax = np.asarray(sol.coeffs).reshape(n * n * n, -1)
    np.testing.assert_allclose(w_native, w_jax, atol=1e-8)

    rng = np.random.default_rng(17)
    xq = rng.uniform(-1.1, 1.1, 500)
    yq = rng.uniform(-1.1, 1.1, 500)
    zq = rng.uniform(-1.1, 1.1, 500)
    h = 2.0 / n
    u_native = native.evaluate3d(
        -1.0, h, n, -1.0, h, n, -1.0, h, n,
        w_native.reshape(n, n, n, cfg.M, cfg.M, cfg.M), xq, yq, zq)
    u_jax = np.asarray(s.evaluate_solution(xq, yq, zq))
    np.testing.assert_allclose(u_native, u_jax, atol=1e-8)
