"""2D property fuzzing.

Two exactness laws the pipeline must satisfy by construction:

1. **Bilinear Galerkin exactness (end-to-end)**: for a bilinear manufactured
   solution u* = a + bx + cy + dxy (which lies in the Q1 coarse space AND
   whose element bilinear trace is u* itself), the full hybrid pipeline —
   coarse solve, trace hand-off, per-element LSSVR fit — must reproduce u*
   to solver tolerance for EVERY operator family and on graded meshes.
   This exercises the assembly quadrature, the Dirichlet hand-off
   (g = u* on the boundary), the enhancement trace/PDE row construction
   and the fallback gating in one shot.

2. **Tensor-polynomial exactness (enhancement algebra)**: feeding the
   batched element solver PDE rows f = L p and trace rows p|_edges from a
   random degree-(M-1, M-1) tensor polynomial p must return exactly p's
   coefficients — p is in the trial space and satisfies every constraint
   with zero slack, so the LSE minimum is 0 (tests the operator matrices
   D, the trace matrix B and the null-space algebra independent of any
   discretisation error).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import hybrid2d as h2
from hybrid_fem_lssvr_tpu.models import hybrid2d_graded as hg
from hybrid_fem_lssvr_tpu.ops import kkt

_SEEDS = {"poisson": 1, "reaction": 2, "helmholtz": 3, "advection": 4,
          "varcoeff": 5}


def _bilinear_problem(rng, family):
    """Manufactured bilinear u* with random operator coefficients; f via
    jax.grad so the rhs is exact for whatever operator is drawn."""
    pa, pb, pc, pd = rng.normal(size=4)

    def u(x, y):
        return pa + pb * x + pc * y + pd * x * y

    kw = {}
    if family == "reaction":
        kw["c"] = float(rng.uniform(0.5, 20.0))
    elif family == "helmholtz":
        kw["c"] = -float(rng.uniform(0.5, 4.0)) ** 2
    elif family == "advection":
        kw["b"] = (float(rng.normal() * 3), float(rng.normal() * 3))
    elif family == "varcoeff":
        w0, w1 = rng.uniform(0.1, 0.4, 2)

        def a(x, y):
            return 1.0 + w0 * x + w1 * y * x

        def ax(x, y):
            return w0 + w1 * y + 0.0 * x

        def ay(x, y):
            return w1 * x + 0.0 * y

        kw["a_var"] = a
        kw["grad_a"] = (ax, ay)

    ux = jnp.vectorize(jax.grad(u, argnums=0))
    uy = jnp.vectorize(jax.grad(u, argnums=1))

    def f(x, y):
        # L u* for bilinear u*: Lap u* = 0, so
        # f = -grad a . grad u* + b . grad u* + c u*
        gx, gy = ux(x, y), uy(x, y)
        if family == "varcoeff":
            return -kw["grad_a"][0](x, y) * gx - kw["grad_a"][1](x, y) * gy
        bx, by = kw.get("b", (0.0, 0.0))
        return bx * gx + by * gy + kw.get("c", 0.0) * u(x, y)

    return h2.Problem2D(name=f"fuzz_{family}", f=f, g=u, exact=u, **kw)


@pytest.mark.parametrize("family", ["poisson", "reaction", "helmholtz",
                                    "advection", "varcoeff"])
def test_bilinear_galerkin_exactness_uniform(family):
    rng = np.random.default_rng(_SEEDS[family])
    p = _bilinear_problem(rng, family)
    cfg = h2.Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4, precond="jacobi",
                            dtype="float64", cg_tol=1e-13)
    s = h2.HybridSolver2D(p, cfg)
    sol = s.solve()
    assert bool(sol.solve_ok.all())
    xq = rng.uniform(-1, 1, 400)
    yq = rng.uniform(-1, 1, 400)
    linf, _ = s.errors(xq, yq)
    assert float(linf) < 1e-8, float(linf)
    # slack scales with the operator rows (~(2/h)^2 * coefficient
    # roundoff): physical units, not machine units
    assert float(sol.max_slack.max()) < 1e-6


@pytest.mark.parametrize("family", ["poisson", "advection", "varcoeff"])
def test_bilinear_galerkin_exactness_graded(family):
    """Same law on a random graded tensor mesh — exercises the
    per-element-scalar assembly and the graded enhancement operators."""
    rng = np.random.default_rng(100 + _SEEDS[family])
    p = _bilinear_problem(rng, family)
    cfg = h2.Solver2DConfig(nx=7, ny=9, M=4, n_colloc=4, precond="jacobi",
                            dtype="float64", cg_tol=1e-13,
                            cg_maxiter=20000)
    xs = np.sort(np.concatenate([[-1, 1], rng.uniform(-0.9, 0.9, 6)]))
    ys = np.sort(np.concatenate([[-1, 1], rng.uniform(-0.9, 0.9, 8)]))
    s = hg.HybridSolver2DGraded(p, cfg, xs, ys)
    sol = s.solve()
    assert bool(sol.solve_ok.all())
    xq = rng.uniform(-1, 1, 400)
    yq = rng.uniform(-1, 1, 400)
    linf, _ = s.errors(xq, yq)
    # worst over a 20-seed offline sweep: 1.3e-8 (CG-iteration-limited)
    assert float(linf) < 1e-7, float(linf)


@pytest.mark.parametrize("trial", range(3))
def test_tensor_polynomial_exactness_enhancement(trial):
    """Random degree-(M-1, M-1) Legendre tensor polynomial p: PDE rows
    L p + exact edge traces -> the batched solver returns p's coefficients
    to f64 roundoff, zero slack."""
    rng = np.random.default_rng(7 + trial)
    M, C, n = 5, 5, 4
    p2 = h2.poisson_2d()
    cfg = h2.Solver2DConfig(nx=n, ny=n, M=M, n_colloc=C, dtype="float64")
    shared, (t_int, bpts) = h2.prepare_shared_2d(p2, cfg)
    # random coefficients per element [E, M, M] (ky, kx)
    E = n * n
    W = rng.normal(size=(E, M, M))
    # PDE rows: f = -Lap p at the mapped collocation points = D @ w
    D = np.asarray(shared.D, np.float64)  # [C^2, M^2] shared operator
    B = np.asarray(shared.B, np.float64)
    f_rows = np.einsum("cm,em->ec", D, W.reshape(E, M * M))
    bc_rows = np.einsum("km,em->ek", B, W.reshape(E, M * M))
    Z, Pbc = kkt.nullspace_host(B)
    w, diags = kkt.solve_batched(
        jnp.asarray(np.broadcast_to(D, (E,) + D.shape)),
        jnp.asarray(B), jnp.asarray(f_rows), jnp.asarray(bc_rows),
        cfg.gamma, ZP=(jnp.asarray(Z), jnp.asarray(Pbc)),
    )
    np.testing.assert_allclose(np.asarray(w), W.reshape(E, M * M),
                               atol=1e-9)
    # slack = ||D|| * coefficient roundoff ~ 1e4 * 1e-11
    assert float(diags.max_slack.max()) < 1e-5
