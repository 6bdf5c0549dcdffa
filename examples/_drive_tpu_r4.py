"""Verify drive: real TPU, public API — poisson sanity, sharded 2D
compact+lift (1-device mesh on chip), distributed composed families."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices())

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
s = HybridSolver(problems.poisson_1d(), SolverConfig(num_nodes=25, M=8, gamma=1e4))
s.solve()
linf, l2 = s.errors(np.linspace(-1, 1, 201))
print("poisson25 TPU f32 linf", linf)

from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig, evaluate_2d
from hybrid_fem_lssvr_tpu.models.hybrid2d import poisson_2d, Solution2D
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.sharded2d import make_sharded_solve_2d
m = pmesh.element_mesh()
p2 = poisson_2d()
cfg2 = Solver2DConfig(nx=16, ny=16, M=6, n_colloc=6, dtype="float32",
                      precond="jacobi", coarse="compact", trace_lift=6)
out = make_sharded_solve_2d(p2, cfg2, m)()
rng = np.random.default_rng(0)
xq = jnp.asarray(rng.uniform(-1, 1, 400), jnp.float32)
yq = jnp.asarray(rng.uniform(-1, 1, 400), jnp.float32)
xs = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
ys = jnp.linspace(-1, 1, 17, dtype=jnp.float32)
zg = jnp.zeros((17, 17), jnp.float32)
zs = jnp.zeros((16, 16), jnp.float32)
sol2 = Solution2D(xs, ys, zg, jnp.asarray(np.asarray(out.coeffs)),
                  jnp.int32(0), jnp.zeros((), jnp.float32), zs, zs,
                  jnp.ones((16, 16), bool))
u = evaluate_2d(sol2, xq, yq)
err2 = float(jnp.max(jnp.abs(u - p2.exact(xq, yq))))
print("sharded2d compact+lift TPU f32 linf", err2, "ok", bool(out.solve_ok.all()))

from hybrid_fem_lssvr_tpu.models.biharmonic import sin_biharmonic_1d
from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
    make_sharded_solve_biharmonic_1d, make_sharded_solve_semilinear)
from hybrid_fem_lssvr_tpu.models.nonlinear import cubic_1d
from hybrid_fem_lssvr_tpu.ops import eval as ev
cfgb = SolverConfig(num_nodes=25, M=8, gamma=1e4, dtype="float32")
outb = make_sharded_solve_biharmonic_1d(sin_biharmonic_1d(), cfgb, m)()
x = jnp.linspace(-1, 1, 801, dtype=jnp.float32)
nodes = jnp.linspace(-1, 1, 25, dtype=jnp.float32)
ub = ev.evaluate(nodes, outb.u.coeffs, x)
print("biharmonic1d sharded TPU f32 linf",
      float(jnp.max(jnp.abs(ub - sin_biharmonic_1d().exact(x)))),
      "ok", bool(outb.u.solve_ok.all()))

outs = make_sharded_solve_semilinear(cubic_1d(), SolverConfig(num_nodes=33, M=8, gamma=1e4, dtype="float32"), m)()
us = ev.evaluate(outs.nodes, outs.coeffs, x)
print("semilinear sharded TPU f32 linf",
      float(jnp.max(jnp.abs(us - cubic_1d().exact(x)))),
      "ok", bool(outs.solve_ok.all()))
