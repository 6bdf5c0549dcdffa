"""Adaptive refinement: slack-driven bisection on a boundary-layer problem."""

import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu import HybridSolver, Problem1D, SolverConfig
from hybrid_fem_lssvr_tpu.models.adaptive import adaptive_solve, refine_nodes


def layer_problem(alpha=40.0, x0=0.2):
    """-u'' = f with u = atan(alpha (x - x0)) + linear BC correction: a
    sharp interior layer at x0 that a uniform coarse mesh cannot resolve."""

    def u(x):
        return jnp.arctan(alpha * (x - x0))

    def f(x):
        s = x - x0
        return 2.0 * alpha**3 * s / (1.0 + alpha**2 * s**2) ** 2

    return Problem1D(
        name="atan_layer",
        f=f,
        g_left=float(u(jnp.asarray(-1.0))),
        g_right=float(u(jnp.asarray(1.0))),
        exact=u,
        constant_coeffs=True,
    )


def test_refine_nodes_bisects_worst():
    nodes = np.linspace(0, 1, 5)
    ind = np.array([0.1, 5.0, 0.2, 0.3])
    out = refine_nodes(nodes, ind, refine_frac=0.25)
    assert out.shape[0] == 6
    assert 0.375 in out  # midpoint of the worst element [0.25, 0.5]


def test_adaptive_beats_uniform_at_equal_budget():
    p = layer_problem()
    xq = np.linspace(-1, 1, 801)
    res = adaptive_solve(p, SolverConfig(num_nodes=17), rounds=6,
                         refine_frac=0.25, eval_points=xq)
    E_final = res.history[-1]["elements"]
    uni = HybridSolver(p, SolverConfig(num_nodes=E_final + 1))
    uni.solve()
    linf_uni, _ = uni.errors(xq)
    linf_ada = res.history[-1]["linf"]
    assert linf_ada < float(linf_uni), (linf_ada, float(linf_uni))
    # refinement clusters nodes near the layer
    nodes = np.asarray(res.nodes)
    near = np.sum(np.abs(nodes - 0.2) < 0.1)
    far = np.sum(np.abs(nodes + 0.6) < 0.1)
    assert near > 2 * far
    # error decreased monotonically-ish across rounds
    errs = [h["linf"] for h in res.history]
    assert errs[-1] < 0.2 * errs[0]
