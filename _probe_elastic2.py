import tests.conftest
import numpy as np, jax.numpy as jnp
from hybrid_fem_lssvr_tpu.models.elastic import (
    sin_elastic_2d, ElasticConfig2D, fem_solve_elastic)

p = sin_elastic_2d(lam=1.0, mu=1.0)
for n in (8, 16, 32):
    cfg = ElasticConfig2D(nx=n, ny=n, dtype="float64", precond="jacobi")
    xs = jnp.linspace(-1, 1, n+1, dtype=jnp.float64)
    ys = jnp.linspace(-1, 1, n+1, dtype=jnp.float64)
    u, res = fem_solve_elastic(p, cfg, xs, ys)
    X, Y = np.meshgrid(np.asarray(xs), np.asarray(ys))
    e1 = np.abs(np.asarray(u[0]) - np.sin(np.pi*X)*np.sin(np.pi*Y)).max()
    e2 = np.abs(np.asarray(u[1]) - np.sin(np.pi*X)*np.sin(2*np.pi*Y)).max()
    print(n, "fem nodal err", e1, e2, "cg", int(res.iters), float(res.residual))
