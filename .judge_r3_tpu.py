"""Judge round-3: real-TPU drive — flagship + the vector family on-chip."""
import json

import numpy as np

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems

out = {}

# 1) Reference __main__ config, f32 on-chip (expected ~7e-7)
s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=25, M=8, gamma=1e4, dtype="float32"))
s.solve()
linf, l2 = s.errors(np.linspace(-1, 1, 201))
out["poisson25_f32_tpu"] = float(linf)

# 2) Elasticity 2D on-chip f32 (NO recorded RESULTS row — judge probe).
import jax.numpy as jnp
from hybrid_fem_lssvr_tpu.models import elastic as EL

esolver = EL.ElasticSolver2D(EL.sin_elastic_2d(),
                             EL.ElasticConfig2D(nx=16, ny=16, M=6,
                                                n_colloc=6,
                                                precond="jacobi"))
es = esolver.solve()
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.uniform(-1, 1, 400))
yr = jnp.asarray(rng.uniform(-1, 1, 400))
u1, u2 = EL.evaluate_elastic_2d(es, xr, yr)
pe = EL.sin_elastic_2d()
out["elastic2d_16_f32_tpu"] = max(
    float(jnp.max(jnp.abs(u1 - pe.exact1(xr, yr)))),
    float(jnp.max(jnp.abs(u2 - pe.exact2(xr, yr)))))
out["elastic2d_solve_ok"] = bool(jnp.all(es.solve_ok))

print(json.dumps(out), flush=True)
