import json
import numpy as np
import jax.numpy as jnp
from hybrid_fem_lssvr_tpu.models.hybrid2d import (
    HybridSolver2D, Solver2DConfig, poisson_2d,
)

cfg = Solver2DConfig(nx=32, ny=32, M=6, n_colloc=6, dtype="float32",
                     coarse="compact", trace_lift=6)
s = HybridSolver2D(poisson_2d(), cfg)
s.solve()
xs = np.linspace(-1, 1, 101)
linf, l2 = s.errors(xs, xs)
print(json.dumps({"poisson2d_32_compact_lift_f32_tpu": {"linf": float(linf)}}))
