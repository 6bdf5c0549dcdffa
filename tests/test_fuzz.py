"""Cross-path property fuzzing: random smooth problems solved through every
solver path (f64 Cholesky/Schur, f64 augmented dual, f32 MGS-QR LSE, native
C++ oracle) must agree on the element solutions to path-appropriate
tolerances."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.ops import kkt, legendre
from hybrid_fem_lssvr_tpu.utils import native


def random_poly_problem(rng, E=16, M=8, C=12):
    """Random smooth per-element operators: polynomial coefficient fields
    sampled at mapped collocation points, realistic (2/h)^2 row scaling."""
    V0, V1, V2 = legendre.collocation_vandermonde(M, C, dtype=jnp.float64)
    V0, V1, V2 = map(np.asarray, (V0, V1, V2))
    h = 2.0 / E
    scale = 2.0 / h
    t = np.linspace(-1, 1, C)
    xs = -1.0 + np.arange(E)[:, None] * h + (t[None, :] + 1) * h / 2
    a2 = -(1.0 + 0.5 * np.polyval(rng.normal(size=3) * 0.2, xs) ** 2)
    a1 = np.polyval(rng.normal(size=3) * 0.3, xs)
    a0 = np.polyval(rng.normal(size=3) * 0.5, xs)
    D = (
        a2[..., None] * scale**2 * V2[None]
        + a1[..., None] * scale * V1[None]
        + a0[..., None] * V0[None]
    )
    B = np.stack([V0[0], V0[-1]])
    # smooth data: polynomial rhs and modest boundary values
    f = np.polyval(rng.normal(size=4), xs) * scale**2 * 0.01
    bc = rng.normal(size=(E, 2)) * 0.3
    return D, B, f, bc


@pytest.mark.parametrize("trial", range(5))
def test_all_paths_agree_on_solution_values(trial):
    rng = np.random.default_rng(100 + trial)
    D, B, f, bc = random_poly_problem(rng)
    gamma = 1e4
    # evaluation points for comparing element solutions (coefficients can
    # differ in near-null directions; solution values are the observable)
    tq = np.linspace(-1, 1, 9)
    (Vq,) = legendre.legendre_vandermonde(jnp.asarray(tq), D.shape[2],
                                          num_derivs=0)
    Vq = np.asarray(Vq)

    def values(w):
        return np.asarray(w) @ Vq.T  # [E, 9]

    w_chol, d1 = kkt.solve_primal_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc),
        gamma,
    )
    w_dual, d2 = kkt.solve_dual_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc),
        gamma,
    )
    w_lse, d3 = kkt.solve_primal_lse(
        jnp.asarray(D, jnp.float32), jnp.asarray(B, jnp.float32),
        jnp.asarray(f, jnp.float32), jnp.asarray(bc, jnp.float32),
    )
    v_ref = values(w_chol)
    scale = np.abs(v_ref).max() + 1e-30
    assert np.abs(values(w_dual) - v_ref).max() / scale < 1e-6
    assert np.abs(values(np.asarray(w_lse, np.float64)) - v_ref).max() \
        / scale < 1e-3  # f32 path
    assert bool(d1.solve_ok.all() and d2.solve_ok.all() and d3.solve_ok.all())
    if native.load() is not None:
        w_nat = np.stack([
            native.kkt_solve(D[e], B, f[e], bc[e], gamma)
            for e in range(D.shape[0])
        ])
        assert np.abs(values(w_nat) - v_ref).max() / scale < 1e-8


@pytest.mark.parametrize("M", [12, 14, 16])
def test_high_degree_stability(M):
    """Kernel degrees beyond the BASELINE p=10 sweep: equilibrated f64 paths
    stay accurate; the f32 LSE path stays finite and bc-consistent."""
    from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems

    p = problems.poisson_1d()
    s = HybridSolver(p, SolverConfig(num_nodes=17, M=M, n_colloc=M + 4))
    sol = s.solve()
    linf, _ = s.errors(np.linspace(-1, 1, 201))
    assert float(linf) < 1e-7, (M, float(linf))
    assert bool(np.asarray(sol.solve_ok).all())
