"""Verify drive: distributed composed families through the public API
(CPU f64 oracle, 8 virtual devices)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu import SolverConfig, problems
from hybrid_fem_lssvr_tpu.models.biharmonic import (sin_biharmonic_1d,
                                                    sin_biharmonic_2d)
from hybrid_fem_lssvr_tpu.models.eigen import EigenConfig, exact_eigenvalues
from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig, evaluate_2d
from hybrid_fem_lssvr_tpu.models.hybrid2d import Solution2D
from hybrid_fem_lssvr_tpu.models.nonlinear import cubic_1d
from hybrid_fem_lssvr_tpu.ops import eval as ev
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.sharded_families import (
    make_sharded_eigensolve, make_sharded_solve_biharmonic_1d,
    make_sharded_solve_biharmonic_2d, make_sharded_solve_semilinear,
)

m = pmesh.element_mesh(8)

# 1) distributed biharmonic beam, 24 elements
p = sin_biharmonic_1d()
cfg = SolverConfig(num_nodes=25, M=8, gamma=1e4, dtype="float64")
out = make_sharded_solve_biharmonic_1d(p, cfg, m)()
x = jnp.linspace(-1.0, 1.0, 801, dtype=jnp.float64)
nodes = jnp.linspace(-1.0, 1.0, 25, dtype=jnp.float64)
u = ev.evaluate(nodes, out.u.coeffs, x)
print("biharmonic1d_sharded_linf",
      float(jnp.max(jnp.abs(u - p.exact(x)))),
      "ok", bool(out.u.solve_ok.all() & out.v.solve_ok.all()))

# 2) distributed plate 16^2 (O(h^4) config)
p2 = sin_biharmonic_2d()
cfg2 = Solver2DConfig(nx=16, ny=16, M=6, n_colloc=6, dtype="float64",
                      precond="jacobi", coarse="compact", trace_lift=6)
out2 = make_sharded_solve_biharmonic_2d(p2, cfg2, m)()
rng = np.random.default_rng(4)
xq = jnp.asarray(rng.uniform(-1, 1, 2000))
yq = jnp.asarray(rng.uniform(-1, 1, 2000))
su = Solution2D(jnp.linspace(-1, 1, 17, dtype=jnp.float64),
                jnp.linspace(-1, 1, 17, dtype=jnp.float64),
                out2.u.assemble_fem_grid(16),
                jnp.asarray(out2.u.coeffs), 0, 0.0, None, None,
                out2.u.solve_ok)
uq = evaluate_2d(su, xq, yq)
print("biharmonic2d_sharded_linf",
      float(jnp.max(jnp.abs(uq - p2.exact(xq, yq)))),
      "ok", bool(out2.u.solve_ok.all()))

# 3) distributed eigensolve: lambda error vs exact spectrum
pe = problems.get("poisson_1d")
cfge = SolverConfig(num_nodes=33, M=8, dtype="float64")
oute = make_sharded_eigensolve(pe, cfge, m, EigenConfig(k=3, rq_iters=2))()
ex = exact_eigenvalues(pe, 3)
print("eigen_sharded_lam_err",
      float(np.max(np.abs(np.asarray(oute.lams) - ex))),
      "fem_err", float(np.max(np.abs(np.asarray(oute.fem.lams) - ex))),
      "ok", bool(oute.solve_ok.all()))

# 4) distributed steady semilinear (cubic): error vs exact sin
pn = cubic_1d()
outn = make_sharded_solve_semilinear(pn, cfge, m, scheme="numerov")()
xs = jnp.linspace(-1.0, 1.0, 401, dtype=jnp.float64)
un = ev.evaluate(outn.nodes, outn.coeffs, xs)
print("semilinear_sharded_linf",
      float(jnp.max(jnp.abs(un - jnp.sin(jnp.pi * xs)))),
      "colloc_res", float(outn.colloc_residual),
      "ok", bool(outn.solve_ok.all()))
