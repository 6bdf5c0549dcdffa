"""Judge round-3 verification drive: real TPU, public API surface."""
import json

import numpy as np

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems

out = {}

# 1) Reference __main__ config, f32 on-chip
s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=25, M=8, gamma=1e4, dtype="float32"))
s.solve()
linf, l2 = s.errors(np.linspace(-1, 1, 201))
out["poisson25_f32_tpu"] = {"linf": float(linf), "l2": float(l2)}

# 2) North-star: E=320, emulated f64 on-chip
import jax
jax.config.update("jax_enable_x64", True)
s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=321, M=8, gamma=1e4,
                              dtype="float64"))
s.solve()
linf, l2 = s.errors(np.linspace(-1, 1, 2001))
out["poisson320_f64_onchip"] = {"linf": float(linf), "l2": float(l2)}

# 3) Dual formulation f32
s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=25, M=8, gamma=1e4,
                              formulation="dual", dtype="float32"))
s.solve()
linf, l2 = s.errors(np.linspace(-1, 1, 201))
out["poisson25_dual_f32_tpu"] = {"linf": float(linf)}

print(json.dumps(out))
