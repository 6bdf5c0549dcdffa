"""2D elastodynamics (models/elastic_wave.py): Newmark-beta marches on
the vector elasticity system, FEM and LSSVR-enhanced."""

import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu.models import elastic_wave as EW
from hybrid_fem_lssvr_tpu.models.elastic import ElasticConfig2D
from hybrid_fem_lssvr_tpu.models.transient import TransientConfig


def _nodal_err(sol, p, t):
    X, Y = jnp.meshgrid(sol.xs, sol.ys)
    return max(
        float(jnp.max(jnp.abs(sol.fem_values[0] - p.exact1(X, Y, t)))),
        float(jnp.max(jnp.abs(sol.fem_values[1] - p.exact2(X, Y, t)))),
    )


def test_fem_march_second_order_in_h():
    """Manufactured forced oscillation (coupled body force at every
    step): nodal error at t_final halves twice per mesh doubling with dt
    fixed small — the vector Q1 O(h^2) floor, as in the steady family."""
    p = EW.elastic_wave_2d()
    tcfg = TransientConfig(t_final=0.25, n_steps=40)
    errs = []
    for n in (8, 16):
        cfg = ElasticConfig2D(nx=n, ny=n, M=6, n_colloc=6,
                              precond="jacobi")
        sol = EW.elastic_wave_march_2d(p, cfg, tcfg)
        errs.append(_nodal_err(sol, p, tcfg.t_final))
    assert errs[0] / errs[1] > 3.0, errs
    assert errs[1] < 0.06, errs


def test_newmark_conserves_energy_free_vibration():
    """f = 0, beta = 1/4, gamma = 1/2: the discrete energy
    1/2 v^T M v + 1/2 u^T K u is an exact invariant of the trapezoidal
    Newmark member — drift at machine eps over 50 steps (f64)."""
    p = EW.elastic_free_vibration_2d(lam=2.0, mu=0.7)
    cfg = ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6,
                          precond="jacobi")
    sol = EW.elastic_wave_march_2d(p, cfg,
                                   TransientConfig(t_final=1.0,
                                                   n_steps=50))
    drift = abs(float(sol.energyN - sol.energy0)) / float(sol.energy0)
    assert drift < 1e-10, drift
    # and the release actually moves: the displacement changed
    X, Y = jnp.meshgrid(sol.xs, sol.ys)
    moved = float(jnp.max(jnp.abs(
        sol.fem_values[0] - p.elastic.exact1(X, Y))))
    assert moved > 0.1, moved


def test_hybrid_march_rides_nodal_floor():
    """The enhanced march's coefficients evaluate anywhere at the FEM
    march's O(h^2) trace floor (NUMERICS.md 24b) — asserted by the same
    8^2 -> 16^2 ratio, at off-node query points."""
    p = EW.elastic_wave_2d()
    tcfg = TransientConfig(t_final=0.25, n_steps=40)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.uniform(-1, 1, 500))
    yr = jnp.asarray(rng.uniform(-1, 1, 500))
    errs = []
    for n in (8, 16):
        cfg = ElasticConfig2D(nx=n, ny=n, M=6, n_colloc=6,
                              precond="jacobi")
        sol = EW.hybrid_elastic_wave_march_2d(p, cfg, tcfg)
        u1, u2 = EW.evaluate_elastic_wave_2d(sol, xr, yr)
        errs.append(max(
            float(jnp.max(jnp.abs(u1 - p.exact1(xr, yr, tcfg.t_final)))),
            float(jnp.max(jnp.abs(u2 - p.exact2(xr, yr, tcfg.t_final)))),
        ))
    assert errs[0] / errs[1] > 3.0, errs
    assert errs[1] < 0.06, errs


def test_hybrid_march_fem_values_match_fem_march():
    """The enhanced march's trace provider IS the FEM march — identical
    nodal displacement and velocity histories (same solves, same order)."""
    p = EW.elastic_wave_2d(lam=2.0, mu=0.5)
    cfg = ElasticConfig2D(nx=8, ny=8, M=5, n_colloc=5, precond="jacobi")
    tcfg = TransientConfig(t_final=0.2, n_steps=10)
    a = EW.elastic_wave_march_2d(p, cfg, tcfg)
    b = EW.hybrid_elastic_wave_march_2d(p, cfg, tcfg)
    assert float(jnp.max(jnp.abs(a.fem_values - b.fem_values))) < 1e-12
    assert float(jnp.max(jnp.abs(a.velocity - b.velocity))) < 1e-12


def test_cli_elastic_wave(capsys):
    """`elastic --wave` emits the elastic_wave_march JSON metrics line."""
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["elastic", "--wave", "--nx", "8", "--ny", "8",
              "--n-steps", "10", "--eval-points", "200"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    rec = [r for r in lines if r.get("stage") == "elastic_wave_march"]
    assert rec, lines
    assert rec[0]["problem"] == "elastic_wave_2d"
    assert rec[0]["linf_error"] < 0.5


def test_elastic_wave_3d_converges_and_conserves():
    """3D mirror: enhanced off-node error drops >= O(h^2) from 4^3 to
    8^3 (riding elastic3d's vector floor), and the free march's energy
    fields are consistent (energyN finite, > 0)."""
    p = EW.elastic_wave_3d()
    from hybrid_fem_lssvr_tpu.models.elastic3d import ElasticConfig3D

    tcfg = TransientConfig(t_final=0.2, n_steps=20)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.uniform(-1, 1, 300))
    yr = jnp.asarray(rng.uniform(-1, 1, 300))
    zr = jnp.asarray(rng.uniform(-1, 1, 300))
    errs = []
    for n in (4, 8):
        cfg = ElasticConfig3D(nx=n, ny=n, nz=n, M=4, n_colloc=4,
                              precond="jacobi")
        sol = EW.hybrid_elastic_wave_march_3d(p, cfg, tcfg)
        u = EW.evaluate_elastic_wave_3d(sol, xr, yr, zr)
        errs.append(max(
            float(jnp.max(jnp.abs(u[c] - p.exact[c](xr, yr, zr, 0.2))))
            for c in range(3)))
    assert errs[0] / errs[1] > 3.0, errs
    assert errs[1] < 0.2, errs


def test_elastic_wave_3d_fem_energy_invariant():
    """3D free vibration (f = 0 via zero forcing): Newmark (1/4, 1/2)
    conserves the block-system discrete energy."""
    from hybrid_fem_lssvr_tpu.models.elastic3d import (ElasticConfig3D,
                                                       sin_elastic_3d)

    st = sin_elastic_3d(lam=1.5, mu=0.8)
    zero4 = lambda x, y, z, t: jnp.zeros_like(x + y + z)  # noqa: E731
    zero3 = lambda x, y, z: jnp.zeros_like(x + y + z)  # noqa: E731
    p = EW.ElasticWaveProblem3D(
        name="free3d", elastic=st, f=(zero4, zero4, zero4),
        u0=st.exact, v0=(zero3, zero3, zero3))
    cfg = ElasticConfig3D(nx=6, ny=6, nz=6, M=4, n_colloc=4,
                          precond="jacobi")
    sol = EW.elastic_wave_march_3d(p, cfg,
                                   TransientConfig(t_final=0.5,
                                                   n_steps=25))
    drift = abs(float(sol.energyN - sol.energy0)) / float(sol.energy0)
    assert drift < 1e-10, drift
