"""Ulysses-pattern all-to-all transpose + distributed ADI sweeps
(SURVEY.md section 2.3 Ulysses row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.transpose import (
    adi_poisson_sweeps, make_sharded_transpose,
)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("shape", [(16, 16), (32, 8), (8, 24)])
def test_sharded_transpose_matches_numpy(n_dev, shape):
    rows, cols = shape
    mesh = pmesh.element_mesh(n_dev)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(rows, cols))
    tp = make_sharded_transpose(mesh, rows, cols)
    np.testing.assert_array_equal(np.asarray(tp(jnp.asarray(x))), x.T)
    # Round trip through the reverse-shape transpose is the identity.
    tp_back = make_sharded_transpose(mesh, cols, rows)
    np.testing.assert_array_equal(np.asarray(tp_back(tp(jnp.asarray(x)))),
                                  x)


def test_sharded_transpose_rejects_indivisible():
    mesh = pmesh.element_mesh(4)
    with pytest.raises(ValueError, match="divide"):
        make_sharded_transpose(mesh, 10, 16)


def _poisson_setup(n):
    """-Lap u = f with exact u = sin(pi x) sin(pi y) on (0,1)^2."""
    h = 1.0 / n
    xs = np.arange(1, n) * h
    X, Y = np.meshgrid(xs, xs)
    f = 2.0 * np.pi**2 * np.sin(np.pi * X) * np.sin(np.pi * Y)
    u_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
    return h, jnp.asarray(f), u_exact


def test_adi_sweeps_converge_local():
    """Peaceman-Rachford with a reasonable tau converges to the discrete
    solution (checked against the exact solution to discretisation error)."""
    n = 32
    h, f, u_exact = _poisson_setup(n)
    tau = 2.0 * np.pi / h  # ~ sqrt(lam_min * lam_max) single-parameter pick
    u = adi_poisson_sweeps(f, h, h, tau, n_sweeps=60)
    err = float(jnp.max(jnp.abs(u - u_exact)))
    assert err < 5e-3, err  # discretisation error ~ h^2


@pytest.mark.parametrize("n_dev", [2, 8])
def test_adi_distributed_matches_local(n_dev):
    """The all-to-all-transposed ADI equals the single-device ADI exactly —
    the two sweep directions really do run on row-sharded layouts of both
    orientations."""
    n = 17  # 16 interior lines: divisible by 2 and 8
    h, f, u_exact = _poisson_setup(n)
    tau = 2.0 * np.pi / h
    u_local = adi_poisson_sweeps(f, h, h, tau, n_sweeps=20)
    mesh = pmesh.element_mesh(n_dev)
    tp = make_sharded_transpose(mesh, n - 1, n - 1)
    u_dist = adi_poisson_sweeps(f, h, h, tau, n_sweeps=20,
                                transpose_fn=tp, transpose_fn_T=tp)
    np.testing.assert_allclose(np.asarray(u_dist), np.asarray(u_local),
                               atol=1e-12)


def test_adi_preconditioner_beats_jacobi_on_anisotropy():
    """ADI-preconditioned CG on a strongly anisotropic grid (hx/hy = 16)
    converges in far fewer iterations than Jacobi-CG on a broad-spectrum
    (random) rhs — the line solves are exact per direction, which is
    exactly where point-preconditioning degrades.  (The smooth sin*sin
    load is nearly a stiffness eigenvector and converges in ~1 CG step
    under ANY preconditioner — a degenerate comparison.)"""
    from hybrid_fem_lssvr_tpu.ops import assembly2d, cg
    from hybrid_fem_lssvr_tpu.parallel.transpose import (
        make_adi_preconditioner,
    )

    nx, ny = 8, 128
    hx, hy = 2.0 / nx, 2.0 / ny
    ny1, nx1 = ny + 1, nx + 1
    K_loc = jnp.asarray(assembly2d.q1_local_stiffness(hx, hy))
    interior = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)

    def apply_free(v):
        return jnp.where(
            interior, assembly2d.apply_stiffness(v * interior, K_loc), 0.0
        )

    rhs = jnp.where(
        interior,
        jnp.asarray(np.random.default_rng(0).normal(size=(ny1, nx1))), 0.0,
    )
    diag = assembly2d.stiffness_diag((ny1, nx1), K_loc, jnp.float64)
    M_jac = jnp.where(interior, 1.0 / diag, 1.0)
    M_adi = make_adi_preconditioner(ny1, nx1, hx, hy, jnp.float64)
    res_j = cg.cg(apply_free, rhs, M_inv=M_jac, tol=1e-10, maxiter=2000)
    res_a = cg.cg(apply_free, rhs, M_inv=M_adi, tol=1e-10, maxiter=2000)
    # Both solve the same system...
    x_j = np.asarray(res_j.x)
    x_a = np.asarray(res_a.x)
    np.testing.assert_allclose(x_a, x_j, atol=1e-7)
    # ...ADI in far fewer iterations.
    assert int(res_a.iters) < 0.4 * int(res_j.iters), (
        int(res_a.iters), int(res_j.iters),
    )


def test_adi_precond_end_to_end_2d_solve():
    """precond='adi' through the full 2D facade produces the right answer
    on an anisotropic mesh."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        HybridSolver2D, Solver2DConfig, poisson_2d_inhomogeneous,
    )

    p = poisson_2d_inhomogeneous()
    sols = {}
    for precond in ("adi", "jacobi"):
        s = HybridSolver2D(p, Solver2DConfig(nx=8, ny=64, M=5, n_colloc=5,
                                             precond=precond))
        sol = s.solve()
        assert bool(sol.solve_ok.all())
        sols[precond] = np.asarray(sol.fem_values)
    # Same coarse solution regardless of preconditioner.
    np.testing.assert_allclose(sols["adi"], sols["jacobi"], atol=1e-8)
