"""Fourth-order (biharmonic) composition solver (models/biharmonic.py):
two chained hybrid solves, the second's rhs spectral in the first."""

import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu.models.biharmonic import (
    sin_biharmonic_1d, solve_biharmonic_1d,
)
from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig
from hybrid_fem_lssvr_tpu.ops import eval as ev


def test_biharmonic_rides_hybrid_floor():
    """u'''' = pi^4 sin(pi x): Linf 1.2e-6 / 1.8e-8 / 1.6e-9 at 9/17/25
    nodes measured — the composition inherits the hybrid floor instead
    of an O(h^2) rhs-interpolation floor."""
    p = sin_biharmonic_1d()
    x = jnp.linspace(-1.0, 1.0, 801, dtype=jnp.float64)
    errs = {}
    for n in (9, 17, 25):
        cfg = SolverConfig(num_nodes=n, M=8, gamma=1e4, dtype="float64")
        sol = solve_biharmonic_1d(p, cfg)
        assert bool(np.asarray(sol.u.solve_ok).all())
        assert bool(np.asarray(sol.v.solve_ok).all())
        u = ev.evaluate(sol.u.nodes, sol.u.coeffs, x)
        errs[n] = float(jnp.max(jnp.abs(u - p.exact(x))))
    assert errs[9] / errs[17] > 30.0, errs
    assert errs[25] < 1e-8, errs
    # the moment (u'') solution is first-class too
    v = ev.evaluate(sol.v.nodes, sol.v.coeffs, x)
    assert float(jnp.max(jnp.abs(v - p.exact_d2(x)))) < 1e-7
