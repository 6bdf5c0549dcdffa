"""Judge round-3 verification drive: CPU f64 oracle, round-3 families."""
import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

out = {}

# 1) 1D parity + default-quad + E=320 north star
from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems  # noqa: E402

s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=25, M=8, gamma=1e4,
                              fem_quad_order=2))
s.solve()
linf, _ = s.errors(np.linspace(-1, 1, 201))
out["poisson25_parity_f64"] = float(linf)

s = HybridSolver(problems.poisson_1d(),
                 SolverConfig(num_nodes=321, M=8, gamma=1e4))
s.solve()
linf, _ = s.errors(np.linspace(-1, 1, 2001))
out["poisson320_f64"] = float(linf)

# 2) Biharmonic 1D at 24 elements (claim: 1.6e-9)
from hybrid_fem_lssvr_tpu.models import biharmonic as BH  # noqa: E402
from hybrid_fem_lssvr_tpu.ops import eval as ev  # noqa: E402

sol = BH.solve_biharmonic_1d(BH.sin_biharmonic_1d(),
                             SolverConfig(num_nodes=25, M=8, gamma=1e4))
xs = jnp.linspace(-1, 1, 1001)
u = ev.evaluate(sol.u.nodes, sol.u.coeffs, xs)
out["biharmonic1d_24el_f64"] = float(jnp.max(jnp.abs(u - jnp.sin(jnp.pi * xs))))

# 3) Eigen 1D E=32 (claim: enhanced lam_1 err ~1.6e-13)
from hybrid_fem_lssvr_tpu.models import eigen as EIG  # noqa: E402

he = EIG.hybrid_eigensolve(problems.poisson_1d(),
                           SolverConfig(num_nodes=33, M=8, gamma=1e4),
                           EIG.EigenConfig(k=4))
lam_exact = (np.pi * np.arange(1, 5) / 2.0) ** 2  # domain (-1,1), L=2
out["eigen1d_E32_lam_err"] = [float(abs(l - e)) for l, e in
                              zip(np.asarray(he.lams), lam_exact)]

# 4) 2D elasticity 16^2 (claim: hybrid Linf 0.0609)
from hybrid_fem_lssvr_tpu.models import elastic as EL  # noqa: E402

p = EL.sin_elastic_2d()
cfgE = EL.ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6)
shared = EL.prepare_shared_elastic(p, cfgE)
solE = EL.hybrid_solve_elastic(p, cfgE, shared)
q = np.linspace(-0.97, 0.97, 41)
U = EL.evaluate_elastic_2d(solE, jnp.asarray(np.repeat(q, 41)),
                           jnp.asarray(np.tile(q, 41)))
ex1 = np.sin(np.pi * np.repeat(q, 41)) * np.sin(np.pi * np.tile(q, 41))
ex2 = np.sin(np.pi * np.repeat(q, 41)) * np.sin(2 * np.pi * np.tile(q, 41))
out["elastic2d_16_linf"] = float(np.max(np.abs(
    np.asarray(U) - np.stack([ex1, ex2]))))
out["elastic2d_ok_all"] = bool(np.all(np.asarray(solE.solve_ok)))

# 5) 2D compact+lift 32^2 (claim: 6.2e-6)
from hybrid_fem_lssvr_tpu.models.hybrid2d import (  # noqa: E402
    HybridSolver2D, Solver2DConfig, poisson_2d,
)

s2 = HybridSolver2D(poisson_2d(), Solver2DConfig(
    nx=32, ny=32, M=6, n_colloc=6, coarse="compact", trace_lift=6))
s2.solve()
xs = np.linspace(-1, 1, 101)
linf2, _ = s2.errors(xs, xs)
out["poisson2d_32_compact_lift_f64"] = float(linf2)

# 6) Transient 1D numerov enhanced (claim: floor ~6.6e-5 at E=16)
from hybrid_fem_lssvr_tpu.models import transient as TR  # noqa: E402

tp = TR.heat_1d()
tcfg = TR.TransientConfig(t_final=0.5, n_steps=128, mass="numerov")
scfg = SolverConfig(num_nodes=17, M=8, gamma=1e4)
hm = TR.hybrid_march(tp, scfg, tcfg)
xs1 = jnp.linspace(-1, 1, 501)
uh = ev.evaluate(hm.nodes, hm.coeffs, xs1)
out["transient1d_E16_numerov_enhanced"] = float(
    jnp.max(jnp.abs(uh - tp.exact(xs1, 0.5))))

print(json.dumps(out, indent=1))
