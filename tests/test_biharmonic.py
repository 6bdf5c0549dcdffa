"""Fourth-order (biharmonic) composition solver (models/biharmonic.py):
two chained hybrid solves, the second's rhs spectral in the first."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.biharmonic import (
    sin_biharmonic_1d, solve_biharmonic_1d,
)
from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig
from hybrid_fem_lssvr_tpu.ops import eval as ev


def test_biharmonic_rides_hybrid_floor():
    """u'''' = pi^4 sin(pi x): Linf 1.2e-6 / 1.8e-8 / 1.6e-9 at 9/17/25
    nodes measured — the composition inherits the hybrid floor instead
    of an O(h^2) rhs-interpolation floor."""
    p = sin_biharmonic_1d()
    x = jnp.linspace(-1.0, 1.0, 801, dtype=jnp.float64)
    errs = {}
    for n in (9, 17, 25):
        cfg = SolverConfig(num_nodes=n, M=8, gamma=1e4, dtype="float64")
        sol = solve_biharmonic_1d(p, cfg)
        assert bool(np.asarray(sol.u.solve_ok).all())
        assert bool(np.asarray(sol.v.solve_ok).all())
        u = ev.evaluate(sol.u.nodes, sol.u.coeffs, x)
        errs[n] = float(jnp.max(jnp.abs(u - p.exact(x))))
    assert errs[9] / errs[17] > 30.0, errs
    assert errs[25] < 1e-8, errs
    # the moment (u'') solution is first-class too
    v = ev.evaluate(sol.v.nodes, sol.v.coeffs, x)
    assert float(jnp.max(jnp.abs(v - p.exact_d2(x)))) < 1e-7


def test_biharmonic_2d_plate_fourth_order():
    """Simply-supported plate Lap^2 u = f: the composition runs at the
    stage floor — O(h^2) with bilinear traces (8.8e-3 at 16^2), O(h^4)
    with coarse='compact' + trace_lift=6 (1.97e-4 -> 1.23e-5 at
    16^2 -> 32^2, ratio 16.0 measured)."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        sin_biharmonic_2d, solve_biharmonic_2d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        Solver2DConfig, evaluate_2d,
    )

    p = sin_biharmonic_2d()
    rng = np.random.default_rng(4)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    uex = np.asarray(p.exact(xq, yq))
    errs = {}
    for n in (16, 32):
        cfg = Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6,
                             dtype="float64", precond="jacobi",
                             coarse="compact", trace_lift=6)
        sol = solve_biharmonic_2d(p, cfg)
        assert bool(np.asarray(sol.u.solve_ok).all())
        u = evaluate_2d(sol.u, xq, yq)
        errs[n] = float(np.abs(np.asarray(u) - uex).max())
    assert errs[16] / errs[32] > 11.0, errs
    assert errs[32] < 5e-5, errs


def test_biharmonic_3d_fourth_order():
    """Simply-supported box Lap^2 u = f with coarse='compact' +
    trace_lift=6: Linf 5.3e-3 -> 2.1e-4 at 8^3 -> 16^3 (ratio 25
    measured) — the tensor lift of the 2D plate chain."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        sin_biharmonic_3d, solve_biharmonic_3d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid3d import (
        Solver3DConfig, evaluate_3d,
    )

    p = sin_biharmonic_3d()
    rng = np.random.default_rng(4)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    zq = jnp.asarray(rng.uniform(-1, 1, 2000))
    uex = np.asarray(p.exact(xq, yq, zq))
    errs = {}
    for n in (8, 16):
        cfg = Solver3DConfig(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                             dtype="float64", precond="jacobi",
                             coarse="compact", trace_lift=6)
        sol = solve_biharmonic_3d(p, cfg)
        assert bool(np.asarray(sol.u.solve_ok).all())
        assert bool(np.asarray(sol.v.solve_ok).all())
        u = evaluate_3d(sol.u, xq, yq, zq)
        errs[n] = float(np.abs(np.asarray(u) - uex).max())
    assert errs[8] / errs[16] > 12.0, errs
    assert errs[16] < 1e-3, errs


def test_clamped_beam_hits_hybrid_floor():
    """Clamped u = u' = 0 (unrepresentable by the splitting): the direct
    Hermite-coarse + fourth-order-enhancement route hits the hybrid
    floor — measured M=10 f64 Linf 2.2e-10 / 2.9e-13 / 1.6e-13 at
    E=8/16/24 with near-exact nodal (value, slope) pairs (the biharmonic
    nodal Green's function is itself a C^1 cubic)."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        clamped_sin2_1d, solve_clamped_biharmonic_1d,
    )

    p = clamped_sin2_1d()
    x = jnp.linspace(-1.0, 1.0, 2001, dtype=jnp.float64)
    errs = {}
    for E in (8, 16):
        cfg = SolverConfig(num_nodes=E + 1, M=10, n_colloc=12,
                           dtype="float64")
        sol = solve_clamped_biharmonic_1d(p, cfg)
        assert bool(np.asarray(sol.solve_ok).all())
        # Hermite nodal superconvergence: values AND slopes near-exact
        assert float(jnp.max(jnp.abs(
            sol.u_nodal - p.exact(sol.nodes)))) < 1e-10
        assert float(jnp.max(jnp.abs(
            sol.up_nodal - p.exact_d1(sol.nodes)))) < 1e-10
        u = ev.evaluate(sol.nodes, sol.coeffs, x)
        errs[E] = float(jnp.max(jnp.abs(u - p.exact(x))))
    assert errs[8] < 1e-9, errs
    assert errs[16] < 1e-11, errs


def test_clamped_inhomogeneous_slopes():
    """u = sin(pi x): zero end values, NONZERO end slopes (u'(+-1) =
    -pi) — the gp rows enter both the Hermite elimination and the
    enhancement's derivative trace rows."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        clamped_sin_slope_1d, solve_clamped_biharmonic_1d,
    )

    p = clamped_sin_slope_1d()
    cfg = SolverConfig(num_nodes=17, M=10, n_colloc=12, dtype="float64")
    sol = solve_clamped_biharmonic_1d(p, cfg)
    assert bool(np.asarray(sol.solve_ok).all())
    x = jnp.linspace(-1.0, 1.0, 2001, dtype=jnp.float64)
    u = ev.evaluate(sol.nodes, sol.coeffs, x)
    assert float(jnp.max(jnp.abs(u - p.exact(x)))) < 1e-11


def test_block_thomas_2x2_matches_dense():
    """ops.tridiag.block_thomas_2x2 == dense solve on a random SPD-ish
    block-tridiagonal system."""
    from hybrid_fem_lssvr_tpu.ops.tridiag import block_thomas_2x2

    rng = np.random.default_rng(3)
    n = 17
    L = rng.standard_normal((n, 2, 2)) * 0.1
    U = rng.standard_normal((n, 2, 2)) * 0.1
    D = np.broadcast_to(np.eye(2) * 4.0, (n, 2, 2)).copy()
    D += rng.standard_normal((n, 2, 2)) * 0.2
    r = rng.standard_normal((n, 2))
    A = np.zeros((2 * n, 2 * n))
    for i in range(n):
        A[2 * i:2 * i + 2, 2 * i:2 * i + 2] = D[i]
        if i > 0:
            A[2 * i:2 * i + 2, 2 * i - 2:2 * i] = L[i]
        if i < n - 1:
            A[2 * i:2 * i + 2, 2 * i + 2:2 * i + 4] = U[i]
    want = np.linalg.solve(A, r.ravel()).reshape(n, 2)
    got = block_thomas_2x2(jnp.asarray(L), jnp.asarray(D),
                           jnp.asarray(U), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-11)


def test_cli_biharmonic_clamped(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["biharmonic", "--clamped", "--num-nodes", "17", "--M", "8",
              "--x64", "--dtype", "float64"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines if r.get("stage") == "biharmonic_clamped_solve"]
    assert rec, lines
    assert rec[0]["problem"] == "clamped_sin2_1d"
    assert rec[0]["n_fallback"] == 0
    assert rec[0]["linf_error"] < 1e-8


def test_clamped_rejects_float32():
    """f32 is measured garbage for the (2/h)^4 algebra (on-chip Linf 4.8
    vs f64 1e-13) — the solver must refuse loudly, not degrade."""
    import pytest

    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        clamped_sin2_1d, prepare_shared_clamped,
    )

    with pytest.raises(ValueError, match="float64"):
        prepare_shared_clamped(
            clamped_sin2_1d(),
            SolverConfig(num_nodes=17, M=8, dtype="float32"))


# ------------------------------------------------- clamped 2D (BFS plate)


def test_clamped_plate_fourth_order():
    """The BFS clamped plate (round-4 VERDICT Missing #5): C^1
    Bogner-Fox-Schmit coarse stage + fourth-order shared-LSE enhancement
    converges at the trace-limited O(h^4) rate (measured 5.7e-3 / 4.5e-4
    / 3.0e-5 at 8/16/32 with M=12)."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        clamped_sin2_2d, evaluate_clamped_2d, solve_clamped_biharmonic_2d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig

    p = clamped_sin2_2d()
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.uniform(-1, 1, 2000))
    yq = jnp.asarray(rng.uniform(-1, 1, 2000))
    errs = []
    for n in (8, 16):
        cfg = Solver2DConfig(nx=n, ny=n, M=10, n_colloc=10,
                             dtype="float64")
        sol = solve_clamped_biharmonic_2d(p, cfg)
        assert bool(jnp.all(sol.solve_ok))
        u = evaluate_clamped_2d(sol, xq, yq)
        errs.append(float(jnp.max(jnp.abs(u - p.exact(xq, yq)))))
    assert errs[0] < 1e-2, errs
    assert errs[1] < 7e-4, errs
    assert errs[0] / errs[1] > 8.0, errs  # O(h^4): measured ratio ~12.7


def test_bfs_coarse_nodal_fourth_order():
    """The BFS coarse stage alone: nodal VALUES converge at O(h^4)
    (measured 3.8e-3 / 2.7e-4 / 1.8e-5 at 8/16/32) — unlike the 1D beam
    the 2D Green's function is not in the trial space, so nodal dofs are
    O(h^4)-accurate rather than exact."""
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        bfs_fem_solve_2d, clamped_sin2_2d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig

    p = clamped_sin2_2d()
    errs = []
    for n in (8, 16):
        cfg = Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6,
                             dtype="float64")
        xs, ys, u, res = bfs_fem_solve_2d(p, cfg)
        X, Y = np.meshgrid(np.asarray(xs), np.asarray(ys))
        errs.append(float(np.max(np.abs(
            np.asarray(u[..., 0]) - np.asarray(p.exact(X, Y))))))
    assert errs[0] / errs[1] > 10.0, errs  # measured 13.9


def test_clamped_plate_rejects_float32_and_small_M():
    from hybrid_fem_lssvr_tpu.models.biharmonic import (
        clamped_sin2_2d, prepare_shared_clamped_2d,
    )
    from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig

    with pytest.raises(ValueError, match="float64"):
        prepare_shared_clamped_2d(
            clamped_sin2_2d(),
            Solver2DConfig(nx=8, ny=8, M=8, n_colloc=8,
                           dtype="float32"))
    with pytest.raises(ValueError, match="M >= 6"):
        prepare_shared_clamped_2d(
            clamped_sin2_2d(),
            Solver2DConfig(nx=8, ny=8, M=5, n_colloc=5,
                           dtype="float64"))


def test_shared_lse_rank_deficient_svd_route():
    """kkt.precompute_shared_lse_host(rcond=...): on a rank-deficient B
    the SVD route spans the FULL null space and solves through the
    pseudoinverse particular map — the clamped-plate constraint rows
    (rank 8M-16 of 8M-4) are the production user; here a minimal
    duplicated-row system checks the route directly."""
    from hybrid_fem_lssvr_tpu.ops import kkt

    rng = np.random.default_rng(0)
    D = rng.normal(size=(12, 8))
    B1 = rng.normal(size=(2, 8))
    B = np.concatenate([B1, B1[:1]])  # duplicated row: rank 2 of 3
    shared = kkt.precompute_shared_lse_host(D, B, jnp.float64,
                                            rcond=1e-10)
    # consistent data (duplicate row carries the duplicate value)
    bc1 = rng.normal(size=(1, 2))
    bc = jnp.asarray(np.concatenate([bc1, bc1[:, :1]], axis=1))
    f = jnp.asarray(rng.normal(size=(1, 12)))
    w, diags = kkt.solve_primal_shared(shared, f, bc)
    np.testing.assert_allclose(np.asarray(w @ jnp.asarray(B).T), 
                               np.asarray(bc), atol=1e-12)
    # and w minimises ||D w - f|| over the constraint manifold: the
    # residual is orthogonal to D Z for the FULL null space Z
    U, s, Vt = np.linalg.svd(B)
    Z = Vt[2:].T
    r = np.asarray(w[0] @ jnp.asarray(D).T - f[0])
    assert np.max(np.abs((np.asarray(D) @ Z).T @ r)) < 1e-10


def test_cli_biharmonic_clamped_2d(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["biharmonic", "--dim", "2", "--clamped", "--nx", "8",
              "--ny", "8", "--M2", "10", "--eval-points", "300"])
    lines = [json.loads(s)
             for s in capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines
           if r.get("stage") == "biharmonic_clamped_solve_2d"]
    assert rec and rec[0]["problem"] == "clamped_sin2_2d"
    assert rec[0]["linf_error"] < 1e-2
    assert rec[0]["n_fallback"] == 0


def test_cli_biharmonic_3d_slab(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["biharmonic", "--dim", "3", "--nx", "8", "--M3", "4",
              "--mesh", "slab", "--x64", "--eval-points", "100"])
    lines = [json.loads(s)
             for s in capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines if r.get("stage") == "biharmonic_solve_3d"]
    assert rec and rec[0]["devices"] >= 2
    assert rec[0]["n_fallback"] == 0
