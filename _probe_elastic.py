import tests.conftest
import numpy as np, jax.numpy as jnp, time
from hybrid_fem_lssvr_tpu.models.elastic import (
    sin_elastic_2d, poly_elastic_2d, ElasticConfig2D, ElasticSolver2D)

rng = np.random.default_rng(0)
xq = jnp.asarray(rng.uniform(-1, 1, 3000)); yq = jnp.asarray(rng.uniform(-1, 1, 3000))
p = sin_elastic_2d(lam=1.0, mu=1.0)
for n in (8, 16, 32):
    cfg = ElasticConfig2D(nx=n, ny=n, M=6, n_colloc=6, dtype="float64")
    s = ElasticSolver2D(p, cfg)
    t0 = time.time(); sol = s.solve()
    linf, l2 = s.errors(xq, yq)
    print("sin", n, "linf", float(linf), "cg", int(sol.cg_iters),
          "ok", bool(np.asarray(sol.solve_ok).all()),
          "cond", float(np.asarray(sol.cond_estimate).max()) if sol.cond_estimate is not None else None,
          f"{time.time()-t0:.1f}s")

p2 = poly_elastic_2d()
cfg = ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6, dtype="float64")
s = ElasticSolver2D(p2, cfg); sol = s.solve()
linf, l2 = s.errors(xq, yq)
print("poly 16 linf", float(linf), "cg", int(sol.cg_iters), "ok", bool(np.asarray(sol.solve_ok).all()))

# stress check on the sin problem
s = ElasticSolver2D(p, ElasticConfig2D(nx=32, ny=32, M=6, n_colloc=6, dtype="float64")); sol = s.solve()
s11, s22, s12 = s.evaluate_stress(xq, yq)
pi = np.pi
u1x = pi*np.cos(pi*np.asarray(xq))*np.sin(pi*np.asarray(yq))
u1y = pi*np.sin(pi*np.asarray(xq))*np.cos(pi*np.asarray(yq))
u2x = pi*np.cos(pi*np.asarray(xq))*np.sin(2*pi*np.asarray(yq))
u2y = 2*pi*np.sin(pi*np.asarray(xq))*np.cos(2*pi*np.asarray(yq))
div = u1x+u2y
e11 = 2*1.0*u1x + 1.0*div; e22 = 2*1.0*u2y+1.0*div; e12 = 1.0*(u1y+u2x)
print("stress linf", float(np.abs(np.asarray(s11)-e11).max()),
      float(np.abs(np.asarray(s22)-e22).max()),
      float(np.abs(np.asarray(s12)-e12).max()))
