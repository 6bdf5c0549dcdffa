"""Judge round-3: CPU f64 drive of round-3 families at the public API."""
import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems  # noqa: E402

out = {}

# 1) biharmonic 1D at 24 elements (RESULTS claim: 1.60e-9)
from hybrid_fem_lssvr_tpu.models import biharmonic as BH  # noqa: E402
from hybrid_fem_lssvr_tpu.ops import eval as ev  # noqa: E402

sol = BH.solve_biharmonic_1d(BH.sin_biharmonic_1d(),
                             SolverConfig(num_nodes=25, M=8, gamma=1e4))
xs = jnp.linspace(-1, 1, 1001)
u = ev.evaluate(sol.u.nodes, sol.u.coeffs, xs)
out["biharmonic1d_24el"] = float(jnp.max(jnp.abs(u - jnp.sin(jnp.pi * xs))))

# 2) eigen 1D E=32 (RESULTS claim: enhanced lam err 1.6e-13..2.5e-12)
from hybrid_fem_lssvr_tpu.models import eigen as EIG  # noqa: E402

he = EIG.hybrid_eigensolve(problems.poisson_1d(),
                           SolverConfig(num_nodes=33, M=8, gamma=1e4),
                           EIG.EigenConfig(k=4))
exact = EIG.exact_eigenvalues(problems.poisson_1d(), 4)
out["eigen1d_E32_lam_err"] = float(
    np.max(np.abs(np.asarray(he.lams) - np.asarray(exact))))

# 3) nonlinear cubic 1D numerov E=32 (claim O(h^4) class, ~5e-6)
from hybrid_fem_lssvr_tpu.models import nonlinear as NL  # noqa: E402

ns = NL.hybrid_solve_semilinear(NL.cubic_1d(),
                                SolverConfig(num_nodes=33, M=8, gamma=1e4),
                                scheme="numerov")
un = ev.evaluate(ns.nodes, ns.coeffs, xs)
out["nonlinear1d_numerov_E32"] = float(
    jnp.max(jnp.abs(un - jnp.sin(jnp.pi * xs))))

# 4) transient enhanced CN, E=16 numerov (claim Linf 6.6e-5)
from hybrid_fem_lssvr_tpu.models import transient as TR  # noqa: E402

ts = TR.hybrid_march(TR.heat_1d(), SolverConfig(num_nodes=17, M=8,
                                                gamma=1e4),
                     TR.TransientConfig(t_final=0.5, n_steps=200,
                                        mass="numerov"))
ut = ev.evaluate(ts.nodes, ts.coeffs, xs)
p = TR.heat_1d()
out["transient1d_enh_E16_numerov"] = float(
    jnp.max(jnp.abs(ut - p.exact(xs, 0.5))))

# 5) elastic 2D 16^2 (claim hybrid Linf 0.0609)
from hybrid_fem_lssvr_tpu.models import elastic as EL  # noqa: E402

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
out["elastic2d_16_hybrid"] = max(
    float(jnp.max(jnp.abs(u1 - pe.exact1(xr, yr)))),
    float(jnp.max(jnp.abs(u2 - pe.exact2(xr, yr)))))

print(json.dumps(out), flush=True)
