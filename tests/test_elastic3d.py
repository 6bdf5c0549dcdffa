"""3D linear elasticity (models/elastic3d.py): tensor lift of the
vector-valued family — block Q1 hex coarse stage + coupled per-element
vector LSSVR enhancement."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu.models.elastic3d import (
    ElasticConfig3D, ElasticSolver3D, _block_locals_3d,
    poly_elastic_3d, sin_elastic_3d,
)


def _query(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(-1, 1, n)),
            jnp.asarray(rng.uniform(-1, 1, n)),
            jnp.asarray(rng.uniform(-1, 1, n)))


def test_elastic3d_forcing_matches_autodiff():
    """The analytic forcing of sin_elastic_3d equals
    -(mu Lap u + (lam+mu) grad div u) computed by jax.hessian/grad of the
    exact displacement (machine eps; guards the hand expansion)."""
    p = sin_elastic_3d(lam=1.3, mu=0.8)
    lam, mu = p.lam, p.mu

    def f_ad(comp, pt):
        def ud(q, c=comp):
            return p.exact[c](q[0], q[1], q[2])

        H = jax.hessian(ud)(pt)
        lap = H[0, 0] + H[1, 1] + H[2, 2]

        def div(q):
            g = 0.0
            for c in range(3):
                g = g + jax.grad(
                    lambda r, c=c: p.exact[c](r[0], r[1], r[2]))(q)[c]
            return g

        ddiv = jax.grad(div)(pt)[comp]
        return -(mu * lap + (lam + mu) * ddiv)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (4, 3))
    for c in range(3):
        for q in pts:
            fa = float(p.f[c](q[0], q[1], q[2]))
            fd = float(f_ad(c, jnp.asarray(q)))
            assert abs(fa - fd) < 1e-12 * (1 + abs(fa))


def test_block_operator_spd_3d():
    """The vector weak form is symmetric and coercive (Korn) on
    zero-trace hex grids: <Av, w> == <v, Aw>, <Av, v> > 0."""
    from hybrid_fem_lssvr_tpu.ops import assembly3d

    p = sin_elastic_3d(lam=2.0, mu=0.7)
    diag_loc, off_loc = _block_locals_3d(p, 0.25, 0.125, 0.5,
                                         jnp.float64)
    A = assembly3d.apply_stiffness_3d
    Axy, Axz, Ayz = off_loc["xy"], off_loc["xz"], off_loc["yz"]

    def apply_block(u):
        r1 = A(u[0], diag_loc["x"]) + A(u[1], Axy) + A(u[2], Axz)
        r2 = A(u[0], Axy.T) + A(u[1], diag_loc["y"]) + A(u[2], Ayz)
        r3 = A(u[0], Axz.T) + A(u[1], Ayz.T) + A(u[2], diag_loc["z"])
        return jnp.stack([r1, r2, r3])

    rng = np.random.default_rng(1)
    mask = np.zeros((7, 7, 7))
    mask[1:-1, 1:-1, 1:-1] = 1.0
    v = jnp.asarray(rng.standard_normal((3, 7, 7, 7)) * mask)
    w = jnp.asarray(rng.standard_normal((3, 7, 7, 7)) * mask)
    Av, Aw = apply_block(v), apply_block(w)
    assert abs(float(jnp.sum(Av * w) - jnp.sum(v * Aw))) < 1e-12
    assert float(jnp.sum(Av * v)) > 0.0


def test_sin_elastic3d_converges_second_order():
    """Full hybrid pipeline on the coupled manufactured solution:
    Linf 0.151 -> 0.0425 at 8^3 -> 16^3 measured (ratio 3.56 = O(h^2),
    the vector nodal floor); the anisotropic-block V-cycle (mg_omega=0.6,
    see ElasticConfig3D) keeps CG iterations mesh-independent
    (21 -> 25 measured; omega=0.8 grew 23 -> 72)."""
    p = sin_elastic_3d()
    xq, yq, zq = _query()
    errs, iters = {}, {}
    for n in (8, 16):
        s = ElasticSolver3D(p, ElasticConfig3D(nx=n, ny=n, nz=n, M=4,
                                               n_colloc=4,
                                               dtype="float64"))
        sol = s.solve()
        assert bool(np.asarray(sol.solve_ok).all())
        linf, _ = s.errors(xq, yq, zq)
        errs[n] = float(linf)
        iters[n] = int(sol.cg_iters)
    assert errs[8] / errs[16] > 3.2, errs
    assert errs[16] < 6e-2, errs
    assert iters[16] < 40, iters  # mesh-independent block-MG


def test_poly_elastic3d_inhomogeneous_dirichlet_and_stress():
    """Coupled cubic with nonzero boundary data: exercises the per-face
    g-override masks on all three components.  The cubic is inside the
    M=4 trial space, so displacement rides the FEM-trace floor and the
    stress readout (exact element-polynomial derivatives) rides one
    order below it.  Measured at 8^3: FEM nodal error 2.2e-14 (nodal
    superconvergence — the cubic's Q1 projection interpolates at
    nodes), displacement Linf 0.0464 (the trilinear-corner trace
    floor), stress 2.28 diag / 0.47 shear against |sigma| ~ 21."""
    p = poly_elastic_3d()
    s = ElasticSolver3D(p, ElasticConfig3D(nx=8, ny=8, nz=8, M=4,
                                           n_colloc=4, dtype="float64",
                                           precond="jacobi"))
    sol = s.solve()
    assert bool(np.asarray(sol.solve_ok).all())
    xq, yq, zq = _query()
    linf, _ = s.errors(xq, yq, zq)
    assert float(linf) < 6e-2, float(linf)

    s11, s22, s33, s12, s13, s23 = s.evaluate_stress(xq, yq, zq)
    x, y, z = (np.asarray(v) for v in (xq, yq, zq))
    lam, mu = p.lam, p.mu
    u1x, u1y, u1z = 3 * x * x, 2 * y * z, y * y
    u2x, u2y, u2z = z * z, 3 * y * y, 2 * z * x
    u3x, u3y, u3z = 2 * x * y, x * x, 3 * z * z
    div = u1x + u2y + u3z
    ref = {
        "s11": 2 * mu * u1x + lam * div,
        "s22": 2 * mu * u2y + lam * div,
        "s33": 2 * mu * u3z + lam * div,
        "s12": mu * (u1y + u2x),
        "s13": mu * (u1z + u3x),
        "s23": mu * (u2z + u3y),
    }
    got = {"s11": s11, "s22": s22, "s33": s33, "s12": s12, "s13": s13,
           "s23": s23}
    for k in ref:
        err = np.abs(np.asarray(got[k]) - ref[k]).max()
        tol = 3.2 if k in ("s11", "s22", "s33") else 0.8
        assert err < tol, (k, err)


def test_richardson_lifted_raises_3d_floor():
    """coarse='richardson' + trace_lift=6 in 3D: measured Linf
    0.955 -> 4.86e-2 -> 4.47e-3 at 4/8/16^3 (ratios 19.7, 10.9) vs the
    plain q1 7.4e-2 at 16^3 — the vector family's high-order route
    (2D rationale in test_elastic.py) carries to hexes."""
    p = sin_elastic_3d()
    q = _query(500)
    errs = {}
    for n in (4, 8):
        from hybrid_fem_lssvr_tpu.models.elastic3d import (
            evaluate_elastic_3d, hybrid_solve_elastic_3d,
            prepare_shared_elastic_3d,
        )

        cfg = ElasticConfig3D(nx=n, ny=n, nz=n, M=5, n_colloc=5,
                              dtype="float64", coarse="richardson",
                              trace_lift=6)
        sol = hybrid_solve_elastic_3d(p, cfg,
                                      prepare_shared_elastic_3d(p, cfg))
        assert bool(np.asarray(sol.solve_ok).all())
        u = evaluate_elastic_3d(sol, *q)
        errs[n] = max(float(jnp.max(jnp.abs(u[c] - p.exact[c](*q))))
                      for c in range(3))
    assert errs[4] / errs[8] > 8.0, errs
    assert errs[8] < 0.1, errs


def test_cli_elastic3d(capsys):
    """`elastic --dim 3` emits the elastic_solve_3d JSON metrics line."""
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["elastic", "--dim", "3", "--nx", "4", "--ny", "4",
              "--nz", "4", "--M3", "4", "--eval-points", "200"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines if r.get("stage") == "elastic_solve_3d"]
    assert rec, lines
    assert rec[0]["problem"] == "sin_elastic_3d"
    assert rec[0]["n_fallback"] == 0
    assert rec[0]["linf_error"] < 1.0
